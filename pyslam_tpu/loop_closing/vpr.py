"""Score-based VPR global descriptors: AlexNet-conv3 and HDC-DELF.

Reference capability: pySLAM ``pyslam/loop_closing/loop_detector_vpr.py``
backends ALEXNET (AlexNet conv3 features as a holistic descriptor) and
HDC_DELF (DELF local features bundled into one hyperdimensional vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class AlexNetConv3(nn.Module):
    """torchvision AlexNet ``features[:7]`` (conv1..conv3 + pools)."""

    @nn.compact
    def __call__(self, img):  # (H, W, 3) in [0,1], ImageNet-normalized
        x = img[None]
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)],
                    name="conv0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(x)
        return nn.relu(x)[0]


def alexnet_from_torch(state_dict, template=None):
    from pyslam_tpu.models.torch_convert import _np, _t2f_conv

    params = {}
    for j, i in enumerate((0, 3, 6)):    # torchvision features indices
        params[f"conv{j}"] = {
            "kernel": _t2f_conv(_np(state_dict[f"features.{i}.weight"])),
            "bias": _np(state_dict[f"features.{i}.bias"])}
    return {"params": params}


class AlexNetExtractor:
    """Whole image -> flattened conv3 feature descriptor (L2-normalized)."""

    def __init__(self, img_px: int = 224, checkpoint: str | None = None):
        self.img_px = img_px
        self.net = AlexNetConv3()
        self.params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((img_px, img_px, 3)))
        if checkpoint:
            import torch

            sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.params = alexnet_from_torch(sd)

        @jax.jit
        def _run(params, x):
            f = self.net.apply(params, x)
            # channel-pooled coarse grid keeps the descriptor compact
            f = nn.avg_pool(f[None], (2, 2), strides=(2, 2))[0]
            v = f.reshape(-1)
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)

        self._run = _run

    def __call__(self, img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        S = self.img_px
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


class HDCDelfExtractor:
    """Hyperdimensional computing bundling of DELF local features
    (reference HDC_DELF backend): each local descriptor is projected to a
    D-dim hypervector, BOUND to a position hypervector (elementwise
    product with smooth x/y phase codes), and the bundle (sum) is the
    global descriptor.  Deterministic seeded codebooks — no training."""

    def __init__(self, hdc_dim: int = 4096, num_features: int = 400,
                 seed: int = 7, delf=None):
        from pyslam_tpu.models.delf import DELFExtractor

        self.delf = delf or DELFExtractor(num_features=num_features)
        rng = np.random.default_rng(seed)
        desc_dim = self.delf.cfg.desc_dim
        self.proj = jnp.asarray(
            rng.normal(0, 1.0 / np.sqrt(desc_dim),
                       (desc_dim, hdc_dim)).astype(np.float32))
        # position binding: random phase vectors for x and y, fractional
        # powers implemented as phase multiplication (HDC FPE encoding)
        self.phase_x = jnp.asarray(
            rng.uniform(-np.pi, np.pi, hdc_dim).astype(np.float32))
        self.phase_y = jnp.asarray(
            rng.uniform(-np.pi, np.pi, hdc_dim).astype(np.float32))

        @jax.jit
        def _bundle(desc, xy, valid, hw):
            h = desc @ self.proj                       # (N, D)
            fx = xy[:, 0] / hw[1]
            fy = xy[:, 1] / hw[0]
            # fractional power encoding: cos(f * phase) as the binding code
            code = (jnp.cos(fx[:, None] * self.phase_x[None, :])
                    * jnp.cos(fy[:, None] * self.phase_y[None, :]))
            v = (h * code * valid[:, None]).sum(axis=0)
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)

        self._bundle = _bundle

    def __call__(self, img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        fd = self.delf(img)
        hw = jnp.asarray(img.shape[:2], jnp.float32)
        return np.asarray(self._bundle(
            fd.desc, fd.xy, fd.valid.astype(jnp.float32), hw))
