"""MegaLoc-class place-recognition descriptor (ViT + SALAD) in flax.

Reference capability: pySLAM ``pyslam/loop_closing/
global_feature_megaloc.py`` (gmberton/MegaLoc).  MegaLoc's published
recipe: a DINOv2-class ViT backbone whose patch tokens are aggregated by
SALAD — "Sinkhorn Algorithm for Locally Aggregated Descriptors":

  * a score head maps each patch token to per-cluster logits plus a
    learned "dustbin" column;
  * SINKHORN normalization (row/column alternating softmax-style
    balancing, a few iterations) turns the scores into a transport plan
    assigning token mass to clusters;
  * per-cluster descriptors = transport-weighted sums of projected
    token features, concatenated (flattened) with a projected global
    token; intra-normalized then globally L2-normalized.

The ViT reuses the DINOv2 block family (models/depth_anything_v2
.ViTBlock); Sinkhorn is a fixed-iteration lax loop — fully on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pyslam_tpu.models.depth_anything_v2 import ViTBlock


@dataclass(frozen=True)
class MegaLocConfig:
    img_px: int = 224
    patch: int = 14
    dim: int = 384
    depth: int = 6
    heads: int = 6
    clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256      # projected global token size
    sinkhorn_iters: int = 3


def sinkhorn(scores, iters: int):
    """Log-domain Sinkhorn over (N, K+1) scores (last col = dustbin)."""
    log_p = scores
    bal = np.float32(np.log(scores.shape[0] / (scores.shape[1] - 1)))
    for _ in range(iters):
        # columns balanced to N/K mass each (dustbin unconstrained) ...
        col = jax.scipy.special.logsumexp(log_p[:, :-1], axis=0,
                                          keepdims=True)
        log_p = log_p.at[:, :-1].add(-col + bal)
        # ... then rows (tokens) normalized to unit mass — the output
        # invariant SALAD aggregation relies on
        log_p = log_p - jax.scipy.special.logsumexp(
            log_p, axis=1, keepdims=True)
    return jnp.exp(log_p)


class MegaLocNet(nn.Module):
    cfg: MegaLocConfig

    @nn.compact
    def __call__(self, img):  # (S, S, 3) ImageNet-normalized
        c = self.cfg
        g = c.img_px // c.patch
        x = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    padding="VALID", name="patch_embed")(img[None])
        tokens = x.reshape(-1, c.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, c.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + g * g, c.dim))
        t = jnp.concatenate([cls, tokens], axis=0) + pos
        for i in range(c.depth):
            t = ViTBlock(c.dim, c.heads, name=f"block_{i}")(t)
        t = nn.LayerNorm(name="norm")(t)
        glob, patches = t[0], t[1:]

        # SALAD head
        feat = nn.Dense(c.cluster_dim, name="cluster_features")(patches)
        score = nn.Dense(c.clusters + 1, name="score")(patches)  # + dustbin
        plan = sinkhorn(score, c.sinkhorn_iters)[:, :-1]      # (N, K)
        agg = jnp.einsum("nk,nd->kd", plan, feat)             # (K, Cd)
        # intra-normalization per cluster, then flatten
        agg = agg / jnp.maximum(
            jnp.linalg.norm(agg, axis=1, keepdims=True), 1e-9)
        tok = nn.Dense(c.token_dim, name="token_proj")(glob)
        out = jnp.concatenate([tok, agg.reshape(-1)])
        return out / jnp.maximum(jnp.linalg.norm(out), 1e-9)


class MegaLocExtractor:
    """Whole-image -> global descriptor, one jitted graph (the same
    surface as NetVLADExtractor / CosPlaceExtractor)."""

    def __init__(self, cfg: MegaLocConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or MegaLocConfig()
        self.net = MegaLocNet(self.cfg)
        S = self.cfg.img_px
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((S, S, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    @property
    def dim(self):
        return self.cfg.token_dim + self.cfg.clusters * self.cfg.cluster_dim

    def __call__(self, img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        S = self.cfg.img_px
        ys = np.clip((np.arange(S) * img.shape[0] / S).astype(int),
                     0, img.shape[0] - 1)
        xs = np.clip((np.arange(S) * img.shape[1] / S).astype(int),
                     0, img.shape[1] - 1)
        x = img[np.ix_(ys, xs)]
        if x.max() > 2.0:
            x = x / 255.0
        x = (x - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        return np.asarray(self._run(self.params, jnp.asarray(x, jnp.float32)))
