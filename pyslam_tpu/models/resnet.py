"""torchvision-layout ResNet in flax (inference mode).

One backbone serves three reference capabilities:
  * CosPlace / EigenPlaces place recognition (pySLAM
    ``pyslam/loop_closing/loop_detector_vpr.py:241-248`` — torch.hub
    gmberton models: ResNet backbone + GeM pooling + Linear + L2 norm),
  * DeepLabv3 semantic segmentation (``semantic_segmentation_deeplab``
    class in the reference semantics layer; torchvision
    deeplabv3_resnet50), which needs the dilated (output-stride 8)
    variant via ``replace_stride_with_dilation``.

State-dict layout, block structure, and naming follow torchvision's
``resnet.py`` exactly so official checkpoints convert key-for-key
(``resnet_from_torch`` below; parity-tested against a torch twin in
``tests/test_resnet_models.py``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.torch_convert import _np, _t2f_conv


class BN(nn.Module):
    """Inference BatchNorm with torch-style running stats as params."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * w + b


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        idn = x
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                    use_bias=False, name="conv1")(x)
        y = BN(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False, name="conv2")(y)
        y = BN(self.planes, name="bn2")(y)
        if self.downsample:
            idn = nn.Conv(self.planes, (1, 1),
                          strides=(self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(x)
            idn = BN(self.planes, name="downsample_bn")(idn)
        return nn.relu(y + idn)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        idn = x
        d = self.dilation
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(BN(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                    use_bias=False, name="conv2")(y)
        y = nn.relu(BN(self.planes, name="bn2")(y))
        out_ch = self.planes * self.expansion
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = BN(out_ch, name="bn3")(y)
        if self.downsample:
            idn = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(x)
            idn = BN(out_ch, name="downsample_bn")(idn)
        return nn.relu(y + idn)


_CONFIGS = {
    "resnet9": (BasicBlock, (1, 1, 1, 1)),   # tiny in-framework-trained nets
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
}


class ResNet(nn.Module):
    """Feature-extractor trunk (no avgpool/fc — the consumers add heads).

    ``dilate`` mirrors torchvision's ``replace_stride_with_dilation`` for
    (layer2, layer3, layer4); DeepLabv3 uses (False, True, True).
    Returns the layer4 feature map; ``capture`` lists extra taps.
    """

    arch: str = "resnet50"
    dilate: Sequence[bool] = (False, False, False)
    # stem width; stages scale (w, 2w, 4w, 8w).  64 = torchvision layout
    # (required for converted checkpoints); smaller widths serve the tiny
    # in-framework-trained models (zero-egress checkpoints).
    width: int = 64

    @nn.compact
    def __call__(self, x, return_taps: bool = False):
        block, counts = _CONFIGS[self.arch]
        w0 = self.width
        x = nn.Conv(w0, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(BN(w0, name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        taps = {}
        dilation = 1
        for li, (planes, n) in enumerate(
                zip((w0, 2 * w0, 4 * w0, 8 * w0), counts)):
            stride = 1 if li == 0 else 2
            prev_dilation = dilation  # torchvision: first block keeps the
            if li > 0 and self.dilate[li - 1]:  # pre-replacement dilation
                dilation *= stride
                stride = 1
            for bi in range(n):
                in_ch = x.shape[-1]
                s = stride if bi == 0 else 1
                need_ds = bi == 0 and (s != 1 or in_ch != planes * block.expansion)
                d = prev_dilation if bi == 0 else dilation
                x = block(planes=planes, stride=s, dilation=d,
                          downsample=need_ds, name=f"layer{li+1}_{bi}")(x)
            taps[f"layer{li+1}"] = x
        if return_taps:
            return x, taps
        return x


def resnet_from_torch(state_dict, prefix: str = "") -> dict:
    """torchvision resnet state_dict -> flax ResNet params tree.

    ``prefix`` selects a sub-module (e.g. 'backbone.' inside CosPlace or
    deeplab checkpoints).  fc/avgpool keys are ignored.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def bn(base):
        return {
            "running_mean": _np(sd[f"{base}.running_mean"]),
            "running_var": _np(sd[f"{base}.running_var"]),
            "weight": _np(sd[f"{base}.weight"]),
            "bias": _np(sd[f"{base}.bias"]),
        }

    params = {
        "conv1": {"kernel": _t2f_conv(_np(sd["conv1.weight"]))},
        "bn1": bn("bn1"),
    }
    for li in range(1, 5):
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            base = f"layer{li}.{bi}"
            blk = {}
            ci = 1
            while f"{base}.conv{ci}.weight" in sd:
                blk[f"conv{ci}"] = {
                    "kernel": _t2f_conv(_np(sd[f"{base}.conv{ci}.weight"]))}
                blk[f"bn{ci}"] = bn(f"{base}.bn{ci}")
                ci += 1
            if f"{base}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _t2f_conv(_np(sd[f"{base}.downsample.0.weight"]))}
                blk["downsample_bn"] = bn(f"{base}.downsample.1")
            params[f"layer{li}_{bi}"] = blk
            bi += 1
    return params
