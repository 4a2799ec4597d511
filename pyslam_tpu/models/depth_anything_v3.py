"""DepthAnythingV3-class any-view depth + ray model in flax.

Reference capability: pySLAM ``pyslam/depth_estimation/
depth_estimator_depth_anything_v3.py`` and ``pyslam/scene_from_views/
scene_from_views_depth_anything_v3.py`` (wrapping depth-anything/DA3:
"Depth Anything 3: Recovering the visual space from any views").  DA3's
defining design, rebuilt TPU-native:

  * ONE plain transformer over any number of input views — DINOv2-style
    patch embedding, alternating within-view and cross-view (all views'
    tokens concatenated) self-attention, no pairwise decoder and no
    camera tokens;
  * the DEPTH-RAY representation: a dual DPT head predicts, per pixel,
    metric depth + confidence AND a camera ray (origin + unit
    direction) expressed in the first view's frame;
  * cameras are RECOVERED from the predicted ray maps (not regressed):
    focal from the angular spread of the rays, rotation by Kabsch
    between camera-canonical and predicted directions, center from the
    mean ray origin;
  * world points = origin + depth * direction, so multi-view fusion is
    a concatenation — no global alignment optimization.

All V views run as one batched token tensor; the cross-view blocks see
a single (V*N, D) sequence (one MXU attention matmul), mirroring
models/vggt.py's aggregator.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.vggt import _Block


@dataclass(frozen=True)
class DA3Config:
    img_hw: tuple = (224, 224)
    patch: int = 16
    dim: int = 384
    depth: int = 12          # total blocks; odd ones attend cross-view
    heads: int = 6
    taps: tuple = (2, 5, 8, 11)
    features: int = 64       # dual-DPT fusion width


class DualDPTHead(nn.Module):
    """Shared fusion pyramid with two output branches: (depth, conf) and
    (ray origin xyz, ray direction xyz)."""

    cfg: DA3Config

    @nn.compact
    def __call__(self, taps, hp, wp):  # taps: list of (V, N, D)
        from pyslam_tpu.models.depth_anything_v2 import FusionBlock

        c = self.cfg
        V = taps[0].shape[0]
        feats = []
        for j, tap in enumerate(taps):
            f = tap.reshape(V, hp, wp, c.dim)
            f = nn.Conv(c.features, (1, 1), name=f"project_{j}")(f)
            # resize pyramid: taps j=0..3 at strides patch/4..patch*2
            scale = (4, 2, 1, 0.5)[j]
            f = jax.image.resize(
                f, (V, int(hp * scale), int(wp * scale), c.features),
                "bilinear")
            feats.append(f)
        l1, l2, l3, l4 = feats
        p4 = FusionBlock(c.features, name="refine4")(
            l4, out_hw=(l3.shape[1], l3.shape[2]))
        p3 = FusionBlock(c.features, name="refine3")(
            p4, l3, out_hw=(l2.shape[1], l2.shape[2]))
        p2 = FusionBlock(c.features, name="refine2")(
            p3, l2, out_hw=(l1.shape[1], l1.shape[2]))
        p1 = FusionBlock(c.features, name="refine1")(p2, l1)
        y = jax.image.resize(
            p1, (V, c.img_hw[0], c.img_hw[1], c.features), "bilinear")

        d = nn.Conv(32, (3, 3), padding="SAME", name="depth_conv")(y)
        d = nn.relu(d)
        d = nn.Conv(2, (1, 1), name="depth_out")(d)
        depth = nn.softplus(d[..., 0])
        conf = jax.nn.sigmoid(d[..., 1])

        r = nn.Conv(32, (3, 3), padding="SAME", name="ray_conv")(y)
        r = nn.relu(r)
        r = nn.Conv(6, (1, 1), name="ray_out")(r)
        origin = r[..., :3]
        direction = r[..., 3:]
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8)
        return depth, conf, origin, direction


class DA3Net(nn.Module):
    cfg: DA3Config

    @nn.compact
    def __call__(self, imgs):  # (V, H, W, 3) ImageNet-normalized
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

        taps = []
        for i in range(c.depth):
            if i % 2 == 0:
                t = _Block(c.dim, c.heads, name=f"view_{i}")(t)   # (V,N,D)
            else:
                flat = t.reshape(1, V * N, c.dim)
                flat = _Block(c.dim, c.heads, name=f"cross_{i}")(flat)
                t = flat.reshape(V, N, c.dim)
            if i in c.taps:
                taps.append(t)

        return DualDPTHead(c, name="head")(taps, hp, wp)


def recover_camera_from_rays(origin, direction, hw):
    """Camera recovery from a view's predicted ray map (numpy, host).

    origin, direction: (H, W, 3) rays in the world (= view-0) frame.
    Returns (Twc 4x4 camera-to-world, f_px focal estimate).

    The canonical camera-frame direction of pixel (u, v) for focal f is
    ~ [(u-cx)/f, (v-cy)/f, 1].  Kabsch on unit vectors solves R for a
    candidate f; the best f minimizes the Kabsch residual (golden-section
    over a log-spaced grid is enough — the objective is smooth).
    """
    H, W = hw
    vs, us = np.mgrid[0:H, 0:W]
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    d = direction.reshape(-1, 3)
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)

    def kabsch(f):
        c = np.stack([(us - cx).ravel() / f, (vs - cy).ravel() / f,
                      np.ones(H * W)], axis=1)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        M = c.T @ d
        U, _, Vt = np.linalg.svd(M)
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T          # cam->world
        res = np.linalg.norm(c @ R.T - d)
        return R, res

    fs = np.geomspace(0.2 * W, 5.0 * W, 24)
    residuals = [kabsch(f)[1] for f in fs]
    j = int(np.argmin(residuals))
    lo, hi = fs[max(0, j - 1)], fs[min(len(fs) - 1, j + 1)]
    for _ in range(20):                      # golden-ish bisection
        m1, m2 = lo + (hi - lo) / 3, hi - (hi - lo) / 3
        if kabsch(m1)[1] < kabsch(m2)[1]:
            hi = m2
        else:
            lo = m1
    f = 0.5 * (lo + hi)
    R, _ = kabsch(f)
    Twc = np.eye(4)
    Twc[:3, :3] = R
    Twc[:3, 3] = origin.reshape(-1, 3).mean(axis=0)
    return Twc, float(f)


class DepthAnything3:
    """Any-view facade: images -> depth/conf/rays/recovered cameras."""

    def __init__(self, cfg: DA3Config | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or DA3Config()
        self.net = DA3Net(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((2, h, w, 3)))
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
        return (img - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])

    def inference(self, images: list) -> dict:
        """-> dict(depth (V,H,W), conf, origin, direction, points
        (V,H,W,3 world frame), poses (V,4,4 cam-to-world), focals (V,))."""
        batch = jnp.asarray(
            np.stack([self._prep(im) for im in images]), jnp.float32)
        depth, conf, origin, direction = (
            np.asarray(o) for o in self._run(self.params, batch))
        points = origin + depth[..., None] * direction
        poses, focals = [], []
        for v in range(len(images)):
            Twc, f = recover_camera_from_rays(
                origin[v], direction[v], self.cfg.img_hw)
            poses.append(Twc)
            focals.append(f)
        return {"depth": depth, "conf": conf, "origin": origin,
                "direction": direction, "points": points,
                "poses": np.stack(poses), "focals": np.array(focals)}
