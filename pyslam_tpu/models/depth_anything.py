"""DepthAnything-class monocular depth as a flax network.

Lightweight DPT-style encoder-decoder (patch encoder, fusion decoder,
relative-depth head); reference wrapper: pySLAM
``pyslam/depth_estimation/depth_estimator_depth_anything*.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class DPTLite(nn.Module):
    dims: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):  # (H,W,3)
        x = x[None]
        skips = []
        for i, d in enumerate(self.dims):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(nn.Conv(d, (3, 3), padding="SAME")(x))
            skips.append(x)
        y = skips[-1]
        for i in range(len(self.dims) - 2, -1, -1):
            target = skips[i].shape
            y = jax.image.resize(y, (1, target[1], target[2], y.shape[-1]), "bilinear")
            y = jnp.concatenate([y, skips[i]], axis=-1)
            y = nn.relu(nn.Conv(self.dims[i], (3, 3), padding="SAME")(y))
        y = nn.Conv(1, (3, 3), padding="SAME")(y)
        return nn.softplus(y[0, ..., 0])  # positive relative depth, H/2 x W/2


class DepthAnythingInference:
    def __init__(self, checkpoint: str | None = None):
        self.net = DPTLite()
        self.params = self.net.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)

        @jax.jit
        def _run(params, img):
            h, w = img.shape[:2]
            h2, w2 = (h // 16) * 16, (w // 16) * 16
            d = self.net.apply(params, img[:h2, :w2] / 255.0)
            return jax.image.resize(d, (h2, w2), "bilinear")

        self._run = _run

    def load_checkpoint(self, path: str):
        import flax

        z = np.load(path, allow_pickle=True)
        self.params = flax.core.freeze(
            jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.params),
                [jnp.asarray(z[k]) for k in sorted(z.files)],
            )
        )

    def infer(self, img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        d = np.asarray(self._run(self.params, jnp.asarray(img)))
        out = np.zeros(img.shape[:2], np.float32)
        out[: d.shape[0], : d.shape[1]] = d
        return out
