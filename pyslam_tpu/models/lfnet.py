"""LF-Net joint detector/descriptor in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_lfnet.py``
(wrapping the TF1 vcg-uvic/lf-net implementation).  The published LF-Net
design, rebuilt TPU-native:

  * a shared fully-convolutional ResNet-style tower over the image
    produces a base feature map;
  * MULTI-SCALE detection: score maps are predicted from the tower
    output resized over a geometric scale range; a softmax over the
    scale axis selects a per-pixel scale, giving a scale-space score map
    plus a per-pixel SCALE estimate;
  * an ORIENTATION head predicts (cos, sin) per pixel -> angle;
  * top-K NMS keypoints; 32x32 patches warped at the predicted
    scale/orientation feed the DESCRIPTOR tower (3 stride-2 convs + fc,
    256-d, L2-normalized).

All stages (tower, score pyramid, NMS, patch warp, descriptor) run as
one jitted graph; the scale pyramid is a batched resize (static shapes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops
from pyslam_tpu.ops.patches import extract_oriented_patches


@dataclass(frozen=True)
class LFNetConfig:
    base_ch: int = 16
    blocks: int = 3
    num_scales: int = 5
    scale_log_range: float = np.log(1.6)   # scales in [1/1.6, 1.6]
    desc_dim: int = 256


class LFNetDetector(nn.Module):
    cfg: LFNetConfig

    @nn.compact
    def __call__(self, img):  # (H, W) [0,1] -> score, scale, ori maps
        c = self.cfg
        x = img[None, ..., None]
        x = nn.Conv(c.base_ch, (5, 5), padding="SAME", name="stem")(x)
        for i in range(c.blocks):
            y = nn.relu(nn.Conv(c.base_ch, (5, 5), padding="SAME",
                                name=f"res{i}a")(x))
            y = nn.Conv(c.base_ch, (5, 5), padding="SAME",
                        name=f"res{i}b")(y)
            x = nn.relu(x + y)

        # multi-scale score maps: resize features, shared 1x1 score conv
        H, W = img.shape
        score_conv = nn.Conv(1, (1, 1), name="score")
        logs = np.linspace(-c.scale_log_range, c.scale_log_range,
                           c.num_scales)
        scales = np.exp(logs)
        maps = []
        for s in scales:
            h2, w2 = max(int(H / s), 1), max(int(W / s), 1)
            f = jax.image.resize(x, (1, h2, w2, c.base_ch), "bilinear")
            m = score_conv(f)
            maps.append(jax.image.resize(m, (1, H, W, 1), "bilinear")[0, ..., 0])
        pyramid = jnp.stack(maps)                       # (S, H, W)
        w = jax.nn.softmax(pyramid, axis=0)
        score = (w * pyramid).sum(0)                    # scale-space score
        scale = jnp.exp((w * jnp.asarray(logs)[:, None, None]).sum(0))

        ori = nn.Conv(2, (3, 3), padding="SAME", name="ori")(x)[0]
        angle = jnp.arctan2(ori[..., 1], ori[..., 0])   # radians
        return score, scale, angle


class LFNetDescriptor(nn.Module):
    cfg: LFNetConfig

    @nn.compact
    def __call__(self, patches):  # (N, 32, 32)
        x = patches[..., None]
        mu = x.mean(axis=(1, 2), keepdims=True)
        sd = x.std(axis=(1, 2), keepdims=True)
        x = (x - mu) / (sd + 1e-5)
        for i, ch in enumerate((64, 128, 256)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        d = nn.Dense(self.cfg.desc_dim, name="fc")(x)
        return d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)


class LFNetExtractor:
    """LF-Net keypoints+descriptors with the FeatureData contract."""

    def __init__(self, num_features: int = 1000,
                 cfg: LFNetConfig | None = None,
                 checkpoint: str | None = None, nms_cell: int = 8):
        self.cfg = cfg or LFNetConfig()
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.det = LFNetDetector(self.cfg)
        self.desc = LFNetDescriptor(self.cfg)
        key = jax.random.PRNGKey(0)
        self.det_params = self.det.init(key, jnp.zeros((64, 64)))
        self.desc_params = self.desc.init(key, jnp.zeros((1, 32, 32)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.det_params = load_variables_npz(
                checkpoint + ".det.npz", self.det_params)
            self.desc_params = load_variables_npz(
                checkpoint + ".desc.npz", self.desc_params)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(det_params, desc_params, img, n):
            score, scale, angle = self.det.apply(det_params, img / 255.0)
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=4, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
            sizes = 16.0 * scale[yi, xi]                 # diameter in px
            angles = jnp.degrees(angle[yi, xi]) % 360.0
            patches = extract_oriented_patches(
                img / 255.0, xy, sizes, angles, patch_size=32,
                mag_factor=2.0)
            d = self.desc.apply(desc_params, patches)
            return xy, resp, valid, d, sizes, angles

        self._run = _run

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        xy, resp, valid, d, sizes, angles = self._run(
            self.det_params, self.desc_params, jnp.asarray(img),
            self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=angles, size=sizes, response=resp, desc=d, valid=valid)
