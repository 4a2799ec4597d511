"""DepthAnythingV2 (DINOv2 ViT + DPT head) in flax, checkpoint-convertible.

Follows the published DepthAnythingV2 design (reference wrapper: pySLAM
``pyslam/depth_estimation/depth_estimator_depth_anything_v2.py``): a DINOv2
ViT-S/14 encoder (cls token, learned position embedding with bilinear
interpolation, LayerScale blocks) tapped at 4 intermediate depths, and a DPT
head (per-tap 1x1 projections, resize pyramid, RefineNet-style feature
fusion, relative-depth output).  ``depth_anything_v2_from_torch``
(models/torch_convert.py) maps the official checkpoint layout
(``pretrained.*`` DINOv2 + ``depth_head.*``); a tiny torch twin validates
the mapping in tests/test_depth_anything_v2.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass
class DAv2Config:
    img_hw: tuple = (266, 350)          # multiples of patch (14)
    patch: int = 14
    dim: int = 384
    depth: int = 12
    heads: int = 6
    taps: tuple = (2, 5, 8, 11)         # intermediate layers feeding the DPT
    out_ch: tuple = (48, 96, 192, 384)  # per-tap projection channels (vits)
    features: int = 64                  # DPT fusion width


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (N,D) tokens (cls first)
        n, d = x.shape
        h = self.heads
        hd = d // h
        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y).reshape(n, 3, h, hd)
        q, k, v = (qkv[:, i].transpose(1, 0, 2) for i in range(3))
        att = jax.nn.softmax(jnp.einsum("hnd,hmd->hnm", q, k) / jnp.sqrt(hd), -1)
        y = jnp.einsum("hnm,hmd->hnd", att, v).transpose(1, 0, 2).reshape(n, d)
        y = nn.Dense(d, name="attn_proj")(y)
        ls1 = self.param("ls1", nn.initializers.ones, (d,))
        x = x + y * ls1
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(4 * d, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default (erf)
        y = nn.Dense(d, name="fc2")(y)
        ls2 = self.param("ls2", nn.initializers.ones, (d,))
        return x + y * ls2


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        return x + y


class FusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = jax.image.resize(
            x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), "bilinear"
        )
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DepthAnythingV2Net(nn.Module):
    cfg: DAv2Config

    @nn.compact
    def __call__(self, img):  # (H,W,3) ImageNet-normalized
        c = self.cfg
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        x = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    padding="VALID", name="patch_embed")(img[None])
        tokens = x.reshape(-1, c.dim)                       # (P, D)
        cls = self.param("cls_token", nn.initializers.zeros, (1, c.dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1 + h8 * w8, c.dim)
        )
        t = jnp.concatenate([cls, tokens], axis=0) + pos

        enc_norm = nn.LayerNorm(name="encoder_norm")  # DINOv2 final norm,
        # applied to every intermediate tap (get_intermediate_layers norm=True)
        taps = []
        for i in range(c.depth):
            t = ViTBlock(c.dim, c.heads, name=f"block_{i}")(t)
            if i in c.taps:
                taps.append(enc_norm(t)[1:])                # drop cls

        # ---- DPT head
        feats = []
        for j, tap in enumerate(taps):
            f = tap.reshape(1, h8, w8, c.dim)
            f = nn.Conv(c.out_ch[j], (1, 1), name=f"project_{j}")(f)
            if j == 0:
                f = nn.ConvTranspose(
                    c.out_ch[j], (4, 4), strides=(4, 4), padding="VALID",
                    transpose_kernel=True, name="resize_0",
                )(f)
            elif j == 1:
                f = nn.ConvTranspose(
                    c.out_ch[j], (2, 2), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, name="resize_1",
                )(f)
            elif j == 3:
                f = nn.Conv(
                    c.out_ch[j], (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], name="resize_3",
                )(f)
            f = nn.Conv(
                c.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"layer{j + 1}_rn",
            )(f)
            feats.append(f)

        l1, l2, l3, l4 = feats   # strides 3.5, 7, 14, 28 (in pixels)
        p4 = FusionBlock(c.features, name="refine4")(
            l4, out_hw=(l3.shape[1], l3.shape[2])
        )
        p3 = FusionBlock(c.features, name="refine3")(
            p4, l3, out_hw=(l2.shape[1], l2.shape[2])
        )
        p2 = FusionBlock(c.features, name="refine2")(
            p3, l2, out_hw=(l1.shape[1], l1.shape[2])
        )
        p1 = FusionBlock(c.features, name="refine1")(p2, l1)

        y = nn.Conv(c.features // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="output_conv1")(p1)
        y = jax.image.resize(
            y, (1, c.img_hw[0], c.img_hw[1], y.shape[-1]), "bilinear"
        )
        y = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="output_conv2a")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="output_conv2b")(y)
        return nn.relu(y[0, ..., 0])                        # relative depth


class DepthAnythingV2:
    """Image -> relative inverse depth, one jitted graph, fixed input size."""

    def __init__(self, cfg: DAv2Config | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or DAv2Config()
        self.net = DepthAnythingV2Net(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(jax.random.PRNGKey(0), jnp.zeros((h, w, 3)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    def load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import (
                depth_anything_v2_from_torch_file,
            )

            self.params = depth_anything_v2_from_torch_file(path, self.params)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(path, self.params)

    def infer(self, img) -> np.ndarray:
        """(H,W[,3]) [0,255] -> relative depth at the input resolution."""
        img = np.asarray(img, np.float32)
        orig_hw = img.shape[:2]
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        h, w = self.cfg.img_hw
        ys = np.clip((np.arange(h) * img.shape[0] / h).astype(int), 0,
                     img.shape[0] - 1)
        xs = np.clip((np.arange(w) * img.shape[1] / w).astype(int), 0,
                     img.shape[1] - 1)
        x = img[ys][:, xs] / 255.0
        x = (x - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        d = np.asarray(self._run(self.params, jnp.asarray(x, jnp.float32)))
        # resize back to the original resolution (nearest)
        ys = np.clip((np.arange(orig_hw[0]) * h / orig_hw[0]).astype(int), 0, h - 1)
        xs = np.clip((np.arange(orig_hw[1]) * w / orig_hw[1]).astype(int), 0, w - 1)
        return d[ys][:, xs]
