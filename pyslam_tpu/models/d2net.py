"""D2-Net detect-and-describe network in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_d2net.py``
(wraps mihaidusmanu/d2-net).  Faithful to the published
``DenseFeatureExtractionModule``: VGG16 truncated at conv4_3 with the
D2-Net modifications — pool3 becomes stride-1 AvgPool and the conv4_x
block uses dilation 2, so the feature map is 1/4 resolution:

    conv1_1(3->64)   relu  conv1_2(64->64)   relu  maxpool/2
    conv2_1(64->128) relu  conv2_2(128->128) relu  maxpool/2
    conv3_1..conv3_3 (256) relu               avgpool k2 s1
    conv4_1..conv4_3 (512, dilation 2)        (relu after 4_1, 4_2)

Detection follows the paper's soft score at inference: per-pixel score =
channel-softmax ratio x local spatial ratio, reduced over channels by max;
keypoints are grid-NMS maxima, descriptors are the L2-normalized 512-dim
feature columns.  Converter maps the official named-Sequential keys
(``dense_feature_extraction.model.conv1_1.weight``, ...).
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

_VGG = [
    ("conv1_1", 64, 1), ("conv1_2", 64, 1), ("pool", 0, 0),
    ("conv2_1", 128, 1), ("conv2_2", 128, 1), ("pool", 0, 0),
    ("conv3_1", 256, 1), ("conv3_2", 256, 1), ("conv3_3", 256, 1),
    ("avgpool_s1", 0, 0),
    ("conv4_1", 512, 2), ("conv4_2", 512, 2), ("conv4_3", 512, 2),
]


class D2Net(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B,H,W,3) caffe-style BGR-mean-subtracted
        for i, (name, ch, dil) in enumerate(_VGG):
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            if name == "avgpool_s1":
                x = nn.avg_pool(x, (2, 2), strides=(1, 1),
                                padding=[(0, 1), (0, 1)])
                continue
            x = nn.Conv(ch, (3, 3), padding=[(dil, dil), (dil, dil)],
                        kernel_dilation=(dil, dil), name=name)(x)
            if name != "conv4_3":
                x = nn.relu(x)
        return x  # (B, H/4, W/4, 512)


def d2net_from_torch(state_dict):
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("dense_feature_extraction.model.", "")
        k = k.replace("model.", "") if k.startswith("model.") else k
        sd[k] = v
    params = {}
    for name, ch, _ in _VGG:
        if name.startswith("conv"):
            params[name] = {
                "kernel": _t2f_conv(_np(sd[f"{name}.weight"])),
                "bias": _np(sd[f"{name}.bias"]),
            }
    return {"params": params}


@jax.jit
def d2net_soft_scores(feats: jnp.ndarray) -> jnp.ndarray:
    """Paper eq. (4)-(6): alpha (local spatial ratio over a 3x3 window,
    computed with a softmax-style exp normalization) x beta (channel
    ratio), maxed over channels."""
    f = feats  # (H,W,C)
    e = jnp.exp(f - jax.lax.stop_gradient(f.max()))
    # 3x3 spatial sum of exp via padding + shifts
    p = jnp.pad(e, ((1, 1), (1, 1), (0, 0)))
    s = sum(p[dy:dy + f.shape[0], dx:dx + f.shape[1]]
            for dy in range(3) for dx in range(3))
    alpha = e / jnp.maximum(s, 1e-12)
    beta = f / jnp.maximum(f.max(axis=-1, keepdims=True), 1e-12)
    return (alpha * beta).max(axis=-1)


class D2NetExtractor:
    _MEAN = np.array([103.939, 116.779, 123.68], np.float32)  # caffe BGR

    def __init__(self, num_features: int = 2000, checkpoint: str | None = None,
                 nms_cell: int = 4):
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.net = D2Net()
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(params, img, n):
            h, w = img.shape[:2]
            hc, wc = (h // 4) * 4, (w // 4) * 4
            f = self.net.apply(params, img[None, :hc, :wc])[0]
            score = d2net_soft_scores(f)
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=2, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, f.shape[1] - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, f.shape[0] - 1)
            d = f[yi, xi]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return xy * 4.0 + 2.0, resp, valid, d  # center of the 4px cell

        self._run = _run

    def load_checkpoint(self, path: str):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        self.params = d2net_from_torch(sd)

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img[..., ::-1] - self._MEAN  # RGB -> BGR, mean subtract
        xy, resp, valid, desc = self._run(
            self.params, jnp.asarray(img.copy()), self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 16.0, jnp.float32),
            response=resp, desc=desc, valid=valid)
