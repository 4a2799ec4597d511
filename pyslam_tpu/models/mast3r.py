"""MASt3R-class two-view matching/metric network in flax.

Reference capabilities served (all wrap naver/mast3r upstream):
  * ``pyslam/local_features/feature_mast3r.py`` + the MAST3R feature
    tracker (``feature_tracker.py:453`` Mast3rFeatureTracker) — two-view
    dense matching via reciprocal NN over per-pixel descriptors;
  * ``pyslam/depth_estimation/depth_estimator_mast3r.py`` — metric depth
    from the view-1 pointmap;
  * ``pyslam/scene_from_views/scene_from_views_mast3r.py`` — multi-view
    reconstruction (pairwise pointmaps + global alignment).

Architecture: MASt3R = DUSt3R (shared CroCo ViT encoder + entangled cross
decoders, models/dust3r.py) + a *local-features head* per view: an MLP over
the concatenation [final decoder token ; encoder token] producing
patch^2 x (desc_dim + 1) values, pixel-shuffled to per-pixel descriptors
(L2-normalized, desc_dim=24 upstream) and a descriptor confidence
(1 + exp) — the ``catmlp`` head of the paper.  The pts3d path reuses the
DUSt3R linear head (our convertible 224-linear variant; the 512-DPT
checkpoint family would need the DPT head from depth_anything_v2.py).
Matching is batched reciprocal nearest-neighbor on the MXU (the
``fast_reciprocal_NNs`` equivalent, one dispatch).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.dust3r import (
    Dust3rConfig, DecBlock, EncBlock, rope2d_freqs,
)
from pyslam_tpu.ops import hamming


@dataclass
class Mast3rConfig(Dust3rConfig):
    desc_dim: int = 24


class Mast3rNet(nn.Module):
    cfg: Mast3rConfig

    @nn.compact
    def __call__(self, img1, img2):
        """img: (H,W,3) in [-1,1].  Returns per view: pts3d (H,W,3),
        conf (H,W), desc (H,W,desc_dim) unit-norm, desc_conf (H,W)."""
        c = self.cfg
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        ys, xs = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")
        pos = jnp.stack([ys.ravel(), xs.ravel()], axis=1).astype(jnp.float32)
        cos_e, sin_e = rope2d_freqs(pos, c.enc_dim // c.enc_heads)
        cos_d, sin_d = rope2d_freqs(pos, c.dec_dim // c.dec_heads)

        patchify = nn.Conv(c.enc_dim, (c.patch, c.patch),
                           strides=(c.patch, c.patch), padding="VALID",
                           name="patch_embed")
        enc_blocks = [EncBlock(c.enc_dim, c.enc_heads, name=f"enc_{i}")
                      for i in range(c.enc_depth)]
        enc_norm = nn.LayerNorm(name="enc_norm")

        def encode(img):
            t = patchify(img[None]).reshape(-1, c.enc_dim)
            for blk in enc_blocks:
                t = blk(t, cos_e, sin_e)
            return enc_norm(t)

        e1, e2 = encode(img1), encode(img2)
        dec_embed = nn.Dense(c.dec_dim, name="decoder_embed")
        d1, d2 = dec_embed(e1), dec_embed(e2)
        for i in range(c.dec_depth):
            nd1 = DecBlock(c.dec_dim, c.dec_heads, name=f"dec1_{i}")(
                d1, d2, cos_d, sin_d, cos_d, sin_d)
            nd2 = DecBlock(c.dec_dim, c.dec_heads, name=f"dec2_{i}")(
                d2, d1, cos_d, sin_d, cos_d, sin_d)
            d1, d2 = nd1, nd2
        dec_norm = nn.LayerNorm(name="dec_norm")
        d1, d2 = dec_norm(d1), dec_norm(d2)

        def unshuffle(t, ch):
            t = t.reshape(h8, w8, c.patch, c.patch, ch)
            return t.transpose(0, 2, 1, 3, 4).reshape(
                h8 * c.patch, w8 * c.patch, ch)

        def pts_head(tokens, name):
            out = unshuffle(nn.Dense(c.patch * c.patch * 4, name=name)(tokens), 4)
            pts = out[..., :3]
            d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            pts = pts / jnp.maximum(d, 1e-8) * jnp.expm1(d)
            return pts, 1.0 + jnp.exp(out[..., 3])

        def desc_head(dec, enc, name):
            # catmlp local-features head: MLP([dec ; enc]) -> pixel shuffle
            x = jnp.concatenate([dec, enc], axis=-1)
            hidden = nn.Dense(c.dec_dim, name=f"{name}_fc1")(x)
            hidden = nn.gelu(hidden, approximate=False)
            out = nn.Dense(c.patch * c.patch * (c.desc_dim + 1),
                           name=f"{name}_fc2")(hidden)
            out = unshuffle(out, c.desc_dim + 1)
            desc = out[..., : c.desc_dim]
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
            return desc, 1.0 + jnp.exp(out[..., c.desc_dim])

        pts1, conf1 = pts_head(d1, "head1")
        pts2, conf2 = pts_head(d2, "head2")
        desc1, dconf1 = desc_head(d1, e1, "local1")
        desc2, dconf2 = desc_head(d2, e2, "local2")
        return (pts1, conf1, desc1, dconf1), (pts2, conf2, desc2, dconf2)


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def reciprocal_nn_matches(desc1: jnp.ndarray, conf1: jnp.ndarray,
                          desc2: jnp.ndarray, conf2: jnp.ndarray,
                          k: int = 4096):
    """Confidence-subsampled reciprocal NN over (H,W,D) descriptor maps.

    The reference's ``fast_reciprocal_NNs`` iterates NN queries with pixel
    subsampling; here we take the top-k most desc-confident pixels of each
    view and do ONE (k,k) MXU distance matrix + mutual check.
    Returns (pix1 (k,), pix2 (k,), mutual (k,) bool) as flattened indices.
    """
    D = desc1.shape[-1]
    _, top1 = jax.lax.top_k(conf1.reshape(-1), k)
    _, top2 = jax.lax.top_k(conf2.reshape(-1), k)
    a = desc1.reshape(-1, D)[top1]
    b = desc2.reshape(-1, D)[top2]
    dm = hamming.descriptor_distance_matrix(a, b)
    nn12 = jnp.argmin(dm, axis=1)
    nn21 = jnp.argmin(dm, axis=0)
    mutual = nn21[nn12] == jnp.arange(k)
    return top1.astype(jnp.int32), top2[nn12].astype(jnp.int32), mutual


class Mast3rModel:
    """Two-view facade: pointmaps + dense descriptors + matching."""

    def __init__(self, cfg: Mast3rConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or Mast3rConfig()
        self.net = Mast3rNet(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self._run = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def load_checkpoint(self, path: str):
        from pyslam_tpu.models.torch_convert import (
            dust3r_from_torch_file, load_variables_npz)

        if path.endswith((".pth", ".pt")):
            # shares the DUSt3R trunk mapping; local-feature head keys
            # (head_local_features.*) are mapped by the same dotted scheme
            self.params = dust3r_from_torch_file(path, self.params)
        else:
            self.params = load_variables_npz(path, self.params)

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
        return jnp.asarray((img - 0.5) / 0.5)

    def infer_pair(self, img1, img2):
        out1, out2 = self._run(self.params, self._prep(img1), self._prep(img2))
        return tuple(np.asarray(o) for o in out1), \
            tuple(np.asarray(o) for o in out2)

    def match_pair(self, img1, img2, max_matches: int = 2000,
                   conf_min: float = 1.05):
        """Reference Mast3rFeatureTracker.track equivalent: dense reciprocal
        NN filtered by descriptor confidence; returns (xy1, xy2, scores)."""
        (_, _, d1, c1), (_, _, d2, c2) = self.infer_pair(img1, img2)
        pix1, pix2, mutual = reciprocal_nn_matches(
            jnp.asarray(d1), jnp.asarray(c1), jnp.asarray(d2),
            jnp.asarray(c2), k=min(4096, d1.shape[0] * d1.shape[1]))
        pix1, pix2, mutual = map(np.asarray, (pix1, pix2, mutual))
        W = d1.shape[1]
        keep = mutual & (c1.reshape(-1)[pix1] > conf_min)
        i1, i2 = pix1[keep], pix2[keep]
        if len(i1) > max_matches:
            order = np.argsort(-c1.reshape(-1)[i1])[:max_matches]
            i1, i2 = i1[order], i2[order]
        xy1 = np.stack([i1 % W, i1 // W], 1).astype(np.float32)
        xy2 = np.stack([i2 % W, i2 // W], 1).astype(np.float32)
        return xy1, xy2, c1.reshape(-1)[i1]
