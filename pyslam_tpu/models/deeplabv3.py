"""DeepLabv3 (ResNet-50, output-stride 8) semantic segmentation in flax.

Reference capability: pySLAM's DeepLabv3 segmentation backend
(``pyslam/semantics/semantic_segmentation_deeplab.py`` wrapping
torchvision ``deeplabv3_resnet50``).  Structure follows torchvision's
``segmentation/deeplabv3.py`` exactly so official checkpoints convert:

    backbone: ResNet-50 with replace_stride_with_dilation=(False,True,True)
    classifier (DeepLabHead):
        [0] ASPP(2048 -> 256, atrous rates 12/24/36):
              convs.0: 1x1 conv+BN+ReLU
              convs.1-3: 3x3 conv (dilation r)+BN+ReLU
              convs.4: global-avg-pool -> 1x1 conv+BN+ReLU -> broadcast
              project: 1x1 conv (5*256 -> 256)+BN+ReLU
        [1] 3x3 conv 256->256 (no bias)  [2] BN  [3] ReLU
        [4] 1x1 conv 256 -> num_classes (21 for COCO-VOC)
    bilinear upsample logits to input size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from pyslam_tpu.models.resnet import BN, ResNet, resnet_from_torch
from pyslam_tpu.models.torch_convert import _np, _t2f_conv

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel, self.dilation
        pad = d * (k - 1) // 2
        x = nn.Conv(self.features, (k, k), padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(d, d), use_bias=False, name="conv")(x)
        return nn.relu(BN(self.features, name="bn")(x))


class ASPP(nn.Module):
    features: int = 256
    rates: tuple = (12, 24, 36)

    @nn.compact
    def __call__(self, x):
        outs = [_ConvBNReLU(self.features, 1, name="conv0")(x)]
        for i, r in enumerate(self.rates):
            outs.append(_ConvBNReLU(self.features, 3, dilation=r,
                                    name=f"conv{i+1}")(x))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _ConvBNReLU(self.features, 1, name="pool_conv")(g)
        outs.append(jnp.broadcast_to(g, outs[0].shape))
        y = jnp.concatenate(outs, axis=-1)
        return _ConvBNReLU(self.features, 1, name="project")(y)


class DeepLabV3(nn.Module):
    num_classes: int = 21
    arch: str = "resnet50"

    @nn.compact
    def __call__(self, x):  # (B,H,W,3) ImageNet-normalized
        H, W = x.shape[1], x.shape[2]
        f = ResNet(arch=self.arch, dilate=(False, True, True),
                   name="backbone")(x)
        y = ASPP(name="aspp")(f)
        y = _ConvBNReLU(256, 3, name="head")(y)
        y = nn.Conv(self.num_classes, (1, 1), name="out")(y)
        return jax.image.resize(y, (y.shape[0], H, W, y.shape[-1]),
                                method="bilinear")


def deeplabv3_from_torch(state_dict, num_classes: int = 21):
    sd = {k: v for k, v in state_dict.items()
          if not k.startswith("aux_classifier")}

    def cbr(conv_key, bn_key):
        return {
            "conv": {"kernel": _t2f_conv(_np(sd[f"{conv_key}.weight"]))},
            "bn": {
                "running_mean": _np(sd[f"{bn_key}.running_mean"]),
                "running_var": _np(sd[f"{bn_key}.running_var"]),
                "weight": _np(sd[f"{bn_key}.weight"]),
                "bias": _np(sd[f"{bn_key}.bias"]),
            },
        }

    aspp = {
        "conv0": cbr("classifier.0.convs.0.0", "classifier.0.convs.0.1"),
        "conv1": cbr("classifier.0.convs.1.0", "classifier.0.convs.1.1"),
        "conv2": cbr("classifier.0.convs.2.0", "classifier.0.convs.2.1"),
        "conv3": cbr("classifier.0.convs.3.0", "classifier.0.convs.3.1"),
        # ASPPPooling: [0]=AdaptiveAvgPool, [1]=conv, [2]=bn
        "pool_conv": cbr("classifier.0.convs.4.1", "classifier.0.convs.4.2"),
        "project": cbr("classifier.0.project.0", "classifier.0.project.1"),
    }
    params = {
        "backbone": resnet_from_torch(sd, prefix="backbone."),
        "aspp": aspp,
        "head": cbr("classifier.1", "classifier.2"),
        "out": {"kernel": _t2f_conv(_np(sd["classifier.4.weight"])),
                "bias": _np(sd["classifier.4.bias"])},
    }
    return {"params": params}


class DeepLabV3Segmenter:
    """Segmentation backend with the framework's standard interface:
    ``infer(img) -> (labels, probs)`` (see semantics/semantic_segmentation)."""

    def __init__(self, num_classes: int = 21, checkpoint: str | None = None,
                 image_hw=(480, 640)):
        self.num_classes = num_classes
        self.image_hw = image_hw
        self.net = DeepLabV3(num_classes=num_classes)
        if checkpoint:
            import torch

            sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.variables = deeplabv3_from_torch(sd, num_classes)
        else:
            self.variables = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        @jax.jit
        def _run(variables, img):
            logits = self.net.apply(variables, img)[0]
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.argmax(logits, -1).astype(jnp.int32), probs

        self._run = _run

    def infer(self, img) -> dict:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img / 255.0 if img.max() > 2.0 else img
        img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        h, w = img.shape[:2]
        H = ((h + 7) // 8) * 8
        W = ((w + 7) // 8) * 8
        canvas = np.zeros((H, W, 3), np.float32)
        canvas[:h, :w] = img
        labels, probs = self._run(self.variables, canvas[None])
        return {"labels": np.asarray(labels)[:h, :w],
                "probs": np.asarray(probs)[:h, :w]}
