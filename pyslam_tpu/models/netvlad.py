"""NetVLAD place-recognition network (VGG16-conv5 backbone + NetVLAD pooling)
in flax.

TPU-native equivalent of the reference's NetVLAD/Patch-NetVLAD loop-detector
backends (pySLAM ``pyslam/loop_closing/loop_detector_vpr.py`` over
``thirdparty/patch_netvlad``): the global descriptor is one jitted XLA graph
(13 VGG convs + soft-assignment 1x1 conv + residual aggregation as matmuls).

Weights: ``netvlad_from_torch`` maps the standard pytorch-NetVlad layout
(``encoder.<i>`` torchvision VGG16 features + ``pool.centroids`` /
``pool.conv.weight``) onto this tree.  Random-init runs (smoke/tests); real
retrieval quality needs the converted official checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision VGG16 .features conv indices (13 convs, pools after 1,3,6,9,12)
VGG16_CONV_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_POOL_AFTER = {1, 3, 6, 9}  # NetVLAD crops VGG16 at conv5_3 (no final pool)


class VGG16Conv5(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B,H,W,3)
        for i, c in enumerate(VGG16_CONV_CHANNELS):
            x = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x  # (B,H/16,W/16,512)


class NetVLADLayer(nn.Module):
    num_clusters: int = 64
    dim: int = 512

    @nn.compact
    def __call__(self, feats):  # (B,H,W,D)
        b, h, w, d = feats.shape
        x = feats.reshape(b, h * w, d)
        # L2-normalize input descriptors (NetVLAD does this)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # soft assignment: 1x1 conv == dense over D
        logits = nn.Dense(self.num_clusters, use_bias=False, name="assign")(x)
        a = jax.nn.softmax(logits, axis=-1)                   # (B,HW,K)
        centroids = self.param(
            "centroids", nn.initializers.normal(1.0),
            (self.num_clusters, d),
        )
        sums = jnp.einsum("bnk,bnd->bkd", a, x)               # (B,K,D)
        counts = jnp.sum(a, axis=1)                           # (B,K)
        vlad = sums - counts[..., None] * centroids[None]
        # intra-norm then global L2
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12
        )
        v = vlad.reshape(b, -1)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


class NetVLADNet(nn.Module):
    num_clusters: int = 64

    @nn.compact
    def __call__(self, img):  # (B,H,W,3) in [0,1]
        # ImageNet normalization (pytorch-NetVlad input pipeline)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (img - mean) / std
        feats = VGG16Conv5(name="encoder")(x)
        return NetVLADLayer(self.num_clusters, 512, name="pool")(feats)


class NetVLADExtractor:
    """Image -> (K*512,) global descriptor, one jitted graph."""

    def __init__(self, num_clusters: int = 64, checkpoint: str | None = None,
                 input_hw=(240, 320)):
        self.net = NetVLADNet(num_clusters)
        self.input_hw = input_hw
        h, w = input_hw
        self.params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3))
        )
        if checkpoint:
            self.load_checkpoint(checkpoint)

        @jax.jit
        def _run(params, img):
            return self.net.apply(params, img[None])[0]

        self._run = _run

    def load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import netvlad_from_torch_file

            self.params = netvlad_from_torch_file(path, self.params)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(path, self.params)

    def __call__(self, img) -> np.ndarray:
        """img: (H,W) gray [0,255] or (H,W,3) RGB [0,255] -> descriptor."""
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        h, w = self.input_hw
        # nearest-resize on host to the fixed input size (keeps ONE jit shape)
        ys = np.clip((np.arange(h) * img.shape[0] / h).astype(int), 0, img.shape[0] - 1)
        xs = np.clip((np.arange(w) * img.shape[1] / w).astype(int), 0, img.shape[1] - 1)
        img = img[ys][:, xs] / 255.0
        return np.asarray(self._run(self.params, jnp.asarray(img, jnp.float32)))
