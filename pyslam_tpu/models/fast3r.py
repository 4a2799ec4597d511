"""Fast3R-class multi-view reconstruction in flax.

Reference capability: pySLAM ``pyslam/scene_from_views/scene_from_views_
fast3r.py`` (wraps facebookresearch/fast3r — "Towards 3D Reconstruction of
1000+ Images in One Forward Pass").  Structure kept faithfully:

  * a per-image ViT ENCODER (frame-local attention only — embarrassingly
    parallel over views, which is what lets Fast3R scale to huge view
    counts);
  * a global FUSION DECODER: all views' tokens concatenated, with learned
    image-index embeddings (random view permutation invariance upstream;
    here index embeddings over a fixed pool) and full self-attention
    blocks across views;
  * two linear pixel-shuffle heads per view: a GLOBAL pointmap head (in
    view-0's frame) and a LOCAL pointmap head (per-view frame), each with
    confidence — matching Fast3R's dual-head design.

TPU notes: encoder = vmap over views of one jitted block stack; decoder =
one (V*N, D) self-attention — both static-shape MXU work.  V is a static
jit dimension (pad the view list to the pool size for varying counts).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.vggt import _Block


@dataclass
class Fast3RConfig:
    img_hw: tuple = (224, 224)
    patch: int = 16
    enc_dim: int = 768
    enc_depth: int = 12
    enc_heads: int = 12
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    max_views: int = 64  # index-embedding pool


class Fast3RNet(nn.Module):
    cfg: Fast3RConfig

    @nn.compact
    def __call__(self, imgs):  # (V,H,W,3) in [-1,1]
        c = self.cfg
        V = imgs.shape[0]
        hp, wp = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        N = hp * wp

        t = nn.Conv(c.enc_dim, (c.patch, c.patch),
                    strides=(c.patch, c.patch), padding="VALID",
                    name="patch_embed")(imgs).reshape(V, N, c.enc_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, N, c.enc_dim))
        t = t + pos
        for i in range(c.enc_depth):  # frame-local attention
            t = _Block(c.enc_dim, c.enc_heads, name=f"enc_{i}")(t)
        t = nn.LayerNorm(name="enc_norm")(t)

        t = nn.Dense(c.dec_dim, name="decoder_embed")(t)
        idx_embed = self.param("image_index_embed",
                               nn.initializers.normal(0.02),
                               (c.max_views, c.dec_dim))
        t = t + idx_embed[:V][:, None, :]
        flat = t.reshape(1, V * N, c.dec_dim)
        for i in range(c.dec_depth):  # global fusion attention
            flat = _Block(c.dec_dim, c.dec_heads, name=f"dec_{i}")(flat)
        t = nn.LayerNorm(name="dec_norm")(flat).reshape(V, N, c.dec_dim)

        def head(tokens, name):
            out = nn.Dense(c.patch * c.patch * 4, name=name)(tokens)
            out = out.reshape(V, hp, wp, c.patch, c.patch, 4)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                V, hp * c.patch, wp * c.patch, 4)
            pts = out[..., :3]
            d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            pts = pts / jnp.maximum(d, 1e-8) * jnp.expm1(d)
            return pts, 1.0 + jnp.exp(jnp.clip(out[..., 3], -10, 10))

        g_pts, g_conf = head(t, "head_global")
        l_pts, l_conf = head(t, "head_local")
        return g_pts, g_conf, l_pts, l_conf


class Fast3RModel:
    def __init__(self, cfg: Fast3RConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or Fast3RConfig()
        self.net = Fast3RNet(self.cfg)
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
        return (img - 0.5) / 0.5

    def infer_views(self, images: list):
        batch = jnp.asarray(np.stack([self._prep(im) for im in images]))
        g_pts, g_conf, l_pts, l_conf = (
            np.asarray(o) for o in self._run(self.params, batch))
        return {"points": g_pts, "conf": g_conf,
                "local_points": l_pts, "local_conf": l_conf}
