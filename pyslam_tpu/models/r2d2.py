"""R2D2 (Quad_L2Net_ConfCFS) detector/descriptor in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_r2d2.py``
(wraps naver/r2d2).  Faithful to the published ``Quad_L2Net_ConfCFS``
(r2d2 ``nets/patchnet.py``):

    fully-convolutional dilated L2-Net over RGB — conv3x3 layers with
    channels (32, 32, 64, 64, 128, 128) where every "stride-2" of L2Net is
    replaced by doubling the dilation (full-resolution output), then three
    2x2 convs (128, 128, desc_dim) continuing the dilation schedule;
    each conv (except the last two) is followed by BN(affine=False) + ReLU.

    heads on the (H, W, 128) feature map x:
      descriptors   = L2-normalize(x)
      reliability   = softmax(clf(x**2))[..., 1]          (1x1 conv -> 2ch)
      repeatability = softplus(sal(x**2)) / (1 + softplus) (1x1 conv -> 1ch)

Keypoints = top-K NMS maxima of reliability * repeatability.  Converter
maps the official ``ops.N.*`` Sequential keys + ``clf``/``sal`` heads.
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

# (channels, kernel, dilation-multiplier, bn+relu)
_LAYERS = [
    (32, 3, 1, True),
    (32, 3, 1, True),
    (64, 3, 2, True),    # stride 2 -> dilation x2
    (64, 3, 1, True),
    (128, 3, 2, True),   # stride 2 -> dilation x2
    (128, 3, 1, True),
    (128, 2, 2, True),   # first 2x2 (relu22=False in the official net ->
    (128, 2, 2, False),  # actually no relu; see below)
    (128, 2, 2, False),
]


class _BNnoaffine(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps)


class R2D2Net(nn.Module):
    """Quad_L2Net_ConfCFS; input (B,H,W,3) in [0,1] ImageNet-normalized."""

    desc_dim: int = 128

    @nn.compact
    def __call__(self, x):
        dilation = 1
        # official Quad_L2Net: relu22=False means the 2x2 convs have BN but
        # no ReLU on the last two; the first 2x2 keeps BN+ReLU pattern of
        # _add_conv(k=2, stride=2, relu=relu22) -> relu False for ALL three
        # 2x2 convs, and the final conv also drops BN.
        for i, (ch, k, dmul, _) in enumerate(_LAYERS):
            # official _add_conv: the conv uses the CURRENT dilation; a
            # "stride-2" layer doubles it for all subsequent layers
            d = dilation
            dilation *= dmul
            pad = d * (k - 1) // 2
            x = nn.Conv(ch if i < len(_LAYERS) - 1 else self.desc_dim,
                        (k, k), padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(d, d), name=f"conv{i}")(x)
            last = i == len(_LAYERS) - 1
            if not last:
                x = _BNnoaffine(_LAYERS[i][0], name=f"bn{i}")(x)
            if i < 6:  # ReLU only on the 3x3 L2-Net body
                x = nn.relu(x)
        desc = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        x2 = x ** 2
        urel = nn.Conv(2, (1, 1), name="clf")(x2)
        rel = jax.nn.softmax(urel, axis=-1)[..., 1]
        urep = nn.Conv(1, (1, 1), name="sal")(x2)[..., 0]
        sp = jax.nn.softplus(urep)
        rep = sp / (1.0 + sp)
        return desc, rel, rep


def r2d2_from_torch(state_dict, params_template):
    """Map the official ``ops.N.weight`` Sequential (convs interleaved with
    BN/ReLU) + clf/sal heads onto the flax tree."""
    sd = {k: v for k, v in state_dict.items()}
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("ops.") and k.endswith(".weight")
                       and _np(sd[k]).ndim == 4})
    params = {}
    for j, ci in enumerate(conv_idx):
        params[f"conv{j}"] = {
            "kernel": _t2f_conv(_np(sd[f"ops.{ci}.weight"])),
            "bias": _np(sd[f"ops.{ci}.bias"]),
        }
        bnk = f"ops.{ci + 1}.running_mean"
        if bnk in sd and j < len(conv_idx) - 1:
            params[f"bn{j}"] = {
                "running_mean": _np(sd[f"ops.{ci+1}.running_mean"]),
                "running_var": _np(sd[f"ops.{ci+1}.running_var"]),
            }
    for head in ("clf", "sal"):
        params[head] = {"kernel": _t2f_conv(_np(sd[f"{head}.weight"])),
                        "bias": _np(sd[f"{head}.bias"])}
    return {"params": params}


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class R2D2Extractor:
    def __init__(self, num_features: int = 2000, checkpoint: str | None = None,
                 nms_cell: int = 8):
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.net = R2D2Net()
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(params, img, n):
            desc, rel, rep = self.net.apply(params, img[None])
            desc, score = desc[0], (rel[0] * rep[0])
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=4, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, score.shape[1] - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, score.shape[0] - 1)
            return xy, resp, valid, desc[yi, xi]

        self._run = _run

    def load_checkpoint(self, path: str):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        self.params = r2d2_from_torch(sd, self.params)

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img / 255.0 if img.max() > 2.0 else img
        img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        xy, resp, valid, desc = self._run(
            self.params, jnp.asarray(img), self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 8.0, jnp.float32),
            response=resp, desc=desc, valid=valid)
