"""SegFormer-class semantic segmentation as a flax network.

Lightweight MiT-B0-style hierarchical encoder + MLP decode head; reference
wrapper: pySLAM ``pyslam/semantics/semantic_segmentation_segformer.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MixFFN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4)(x)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim)(h)


class SegFormerEncoderStage(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME")(x)
        x = nn.LayerNorm()(x)
        x = MixFFN(self.dim)(x)
        x = MixFFN(self.dim)(x)
        return x


class SegFormerNet(nn.Module):
    num_classes: int = 19
    dims: tuple = (32, 64, 160, 256)

    @nn.compact
    def __call__(self, x):  # (H,W,3)
        x = x[None]
        feats = []
        for i, d in enumerate(self.dims):
            x = SegFormerEncoderStage(d, 2 if i > 0 else 4)(x)
            feats.append(x)
        # MLP decode head: project + upsample + concat
        h4, w4 = feats[0].shape[1:3]
        ups = []
        for f in feats:
            p = nn.Dense(128)(f)
            p = jax.image.resize(p, (1, h4, w4, 128), "bilinear")
            ups.append(p)
        y = jnp.concatenate(ups, axis=-1)
        y = nn.Dense(128)(y)
        y = nn.relu(y)
        logits = nn.Dense(self.num_classes)(y)
        return logits[0]  # (H/4, W/4, K)


class SegFormerInference:
    def __init__(self, num_classes: int = 19, checkpoint: str | None = None):
        self.num_classes = num_classes
        self.net = SegFormerNet(num_classes=num_classes)
        self.params = self.net.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)

        @jax.jit
        def _run(params, img):
            h, w = img.shape[:2]
            h4, w4 = (h // 4) * 4, (w // 4) * 4
            logits = self.net.apply(params, img[:h4, :w4] / 255.0)
            logits = jax.image.resize(
                logits, (h4, w4, self.num_classes), "bilinear"
            )
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.argmax(logits, -1).astype(jnp.int32), probs

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

    def infer(self, img) -> dict:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        labels, probs = self._run(self.params, jnp.asarray(img))
        h, w = np.asarray(img).shape[:2]
        lab = np.zeros((h, w), np.int32)
        pr = np.zeros((h, w, self.num_classes), np.float32)
        lh, lw = np.asarray(labels).shape
        lab[:lh, :lw] = np.asarray(labels)
        pr[:lh, :lw] = np.asarray(probs)
        return {"labels": lab, "probs": pr}
