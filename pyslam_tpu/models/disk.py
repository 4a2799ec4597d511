"""DISK detector/descriptor (thin U-Net) in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_disk.py``
(wraps cvlab-epfl/disk).  Architecture per the published model (and its
kornia re-implementation): a "thin" U-Net over RGB,

    down channels [16, 32, 64, 64, 64], up channels [64, 64, desc_dim+1],
    one 5x5 conv per block (bias=True) -> PReLU(ch) -> InstanceNorm,
    avg-pool 2x2 downsample, nearest 2x upsample + skip concatenation,
    final up block is a bare conv (no gate/norm) producing 128 descriptor
    channels + 1 heatmap channel.

Keypoints = top-K NMS maxima of the heatmap; descriptors are bilinear
taps of the L2-normalized descriptor map.  The converter maps torch
checkpoints by REGISTRATION ORDER (down path then up path, conv weight/
bias + PReLU slope per block), which is invariant to the container
naming differences between the original ``unets`` package and kornia.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.models.torch_convert import _np, _t2f_conv
from pyslam_tpu.ops import nms as nms_ops

_DOWN = (16, 32, 64, 64, 64)
_UP = (64, 64, 129)  # desc 128 + heatmap 1


def _instance_norm_hw(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class _ConvBlock(nn.Module):
    features: int
    gate: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (5, 5), padding=[(2, 2), (2, 2)],
                    name="conv")(x)
        if self.gate:
            slope = self.param("prelu", lambda k: jnp.full((self.features,), 0.25))
            x = jnp.where(x >= 0, x, slope * x)
            x = _instance_norm_hw(x)
        return x


class DiskUNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B,H,W,3), H,W divisible by 16
        skips = []
        for i, ch in enumerate(_DOWN):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = _ConvBlock(ch, name=f"down{i}")(x)
            skips.append(x)
        for i, ch in enumerate(_UP):
            skip = skips[len(_DOWN) - 2 - i]
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]),
                method="nearest")
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBlock(ch, gate=(i < len(_UP) - 1), name=f"up{i}")(x)
        desc = x[..., :128]
        heat = x[..., 128]
        return desc, heat


def disk_from_torch(state_dict, params_template):
    """Order-based mapping: torch registers down blocks then up blocks; per
    block one conv (weight+bias) and one PReLU slope (except the last)."""
    convs, biases, slopes = [], [], []
    for k, v in state_dict.items():
        arr = _np(v)
        if arr.ndim == 4:
            convs.append(arr)
            biases.append(_np(state_dict[k.replace("weight", "bias")]))
        elif (arr.ndim <= 1 and "bias" not in k
              and arr.size in (1,) + tuple(_DOWN) + tuple(_UP)):
            slopes.append(arr)
    names = [f"down{i}" for i in range(len(_DOWN))] + \
            [f"up{i}" for i in range(len(_UP))]
    params = {}
    si = 0
    for i, name in enumerate(names):
        blk = {"conv": {"kernel": _t2f_conv(convs[i]), "bias": biases[i]}}
        if name != f"up{len(_UP)-1}":
            s = slopes[si] if si < len(slopes) else np.full(
                convs[i].shape[0], 0.25, np.float32)
            si += 1
            blk["prelu"] = np.broadcast_to(
                s.reshape(-1), (convs[i].shape[0],)).astype(np.float32)
        params[name] = blk
    return {"params": params}


class DiskExtractor:
    """DISK keypoints+descriptors with the fixed-shape FeatureData contract."""

    def __init__(self, num_features: int = 2000, checkpoint: str | None = None,
                 nms_cell: int = 8):
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.net = DiskUNet()
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(params, img, n):
            h, w = img.shape[:2]
            hc, wc = (h // 16) * 16, (w // 16) * 16
            desc, heat = self.net.apply(params, img[None, :hc, :wc] / 255.0)
            desc, heat = desc[0], heat[0]
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                heat, cell=self.nms_cell, per_cell=4, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, wc - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, hc - 1)
            d = desc[yi, xi]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return xy, resp, valid, d

        self._run = _run

    def load_checkpoint(self, path: str):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "extractor" in sd:
            sd = sd["extractor"]  # official depth-save.pth layout
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = disk_from_torch(sd, self.params)

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        xy, resp, valid, desc = self._run(
            self.params, jnp.asarray(img), self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 8.0, jnp.float32),
            response=resp, desc=desc, valid=valid)
