"""ALIKED detector/descriptor in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_aliked.py``
(wraps the LightGlue-packaged ALIKED, "ALIKED: A Lighter Keypoint and
Descriptor Extraction Network via Deformable Transformation").  The
published architecture, rebuilt TPU-native:

  * backbone of 4 blocks at resolutions 1, 1/2, 1/8, 1/32
    (``block1`` ConvBlock, ``block2``-``block4`` ResBlocks; blocks 3-4
    use DEFORMABLE 3x3 convolutions), SELU gates, BatchNorm;
  * per-block 1x1 projections to ``dim/4`` channels, bilinear upsample
    to full resolution, concatenation -> ``dim``-channel feature map;
  * SMH score head: 1x1 -> 8, 3x3 -> 4, 3x3 -> 4, 3x3 -> 1, sigmoid;
  * DKD keypoint detection: spatially-uniform grid top-k NMS over the
    score map + sub-pixel refinement by local 5x5 soft-argmax;
  * SDDH descriptor head: per keypoint, a KxK feature patch predicts M
    deformable sample offsets (``offset_conv``); the M bilinear samples
    are mixed by ``sf_conv`` (1x1) and aggregated by learned per-sample
    ``dim x dim`` matrices (``agg_weights``) into a unit descriptor.

The deformable convolutions are expressed as k*k bilinear gathers
followed by ONE (H*W, k*k*C) x (k*k*C, Cout) matmul, which XLA tiles
onto the MXU; the SDDH is a single batched gather + einsum over all
keypoints (no per-keypoint loops).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.models.resnet import BN
from pyslam_tpu.models.torch_convert import _np, _t2f_conv
from pyslam_tpu.ops import nms as nms_ops


@dataclass(frozen=True)
class AlikedConfig:
    # aliked-n16 sizing
    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128
    K: int = 3      # SDDH patch kernel
    M: int = 16     # SDDH deformable sample positions


def bilinear_sample(x, ys, xs):
    """Sample (H, W, C) map at float (y, x) positions (any shape)."""
    H, W = x.shape[:2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ay = ys - y0
    ax = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    v00 = x[y0i, x0i]
    v01 = x[y0i, x1i]
    v10 = x[y1i, x0i]
    v11 = x[y1i, x1i]
    ax = ax[..., None]
    ay = ay[..., None]
    return ((v00 * (1 - ax) + v01 * ax) * (1 - ay)
            + (v10 * (1 - ax) + v11 * ax) * ay)


class DeformConv(nn.Module):
    """3x3 deformable conv: per-pixel offsets for each tap, the sampled
    taps contracted with the regular kernel in one matmul."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):  # (H, W, C)
        k = self.kernel
        H, W, C = x.shape
        off = nn.Conv(2 * k * k, (k, k), padding="SAME",
                      name="offset_conv")(x[None])[0]  # (H,W,2*k*k) (dy,dx)
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]
        xs = jnp.arange(W, dtype=jnp.float32)[None, :]
        taps = []
        t = 0
        r = (k - 1) // 2
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                dy = off[..., 2 * t]
                dx = off[..., 2 * t + 1]
                taps.append(bilinear_sample(x, ys + di + dy, xs + dj + dx))
                t += 1
        stacked = jnp.concatenate(taps, axis=-1)  # (H, W, k*k*C)
        return nn.Dense(self.features, name="conv")(stacked)


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):  # (H, W, C)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv1")(x[None])[0]
        x = nn.selu(BN(self.features, name="bn1")(x))
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(x[None])[0]
        x = nn.selu(BN(self.features, name="bn2")(x))
        return x


class ResBlock(nn.Module):
    features: int
    deformable: bool = False

    @nn.compact
    def __call__(self, x):  # (H, W, C)
        if self.deformable:
            y = DeformConv(self.features, name="conv1")(x)
        else:
            y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name="conv1")(x[None])[0]
        y = nn.selu(BN(self.features, name="bn1")(y))
        if self.deformable:
            y = DeformConv(self.features, name="conv2")(y)
        else:
            y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name="conv2")(y[None])[0]
        y = BN(self.features, name="bn2")(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        name="downsample")(x[None])[0]
        return nn.selu(x + y)


class AlikedNet(nn.Module):
    """Backbone + SMH.  Returns (feature_map (H,W,dim), score_map (H,W))."""

    cfg: AlikedConfig = AlikedConfig()

    @nn.compact
    def __call__(self, img):  # (H, W, 3) in [0, 1]; H, W divisible by 32
        c = self.cfg
        H, W = img.shape[:2]

        def pool(x, s):
            return nn.avg_pool(x[None], (s, s), strides=(s, s))[0]

        x1 = ConvBlock(c.c1, name="block1")(img)                   # 1
        x2 = ResBlock(c.c2, name="block2")(pool(x1, 2))            # 1/2
        x3 = ResBlock(c.c3, deformable=True, name="block3")(pool(x2, 4))  # 1/8
        x4 = ResBlock(c.c4, deformable=True, name="block4")(pool(x3, 4))  # 1/32

        d = c.dim // 4

        def up(x, name):
            y = nn.Conv(d, (1, 1), name=name)(x[None])[0]
            return jax.image.resize(y, (H, W, d), "bilinear")

        feats = jnp.concatenate(
            [up(x1, "conv1"), up(x2, "conv2"), up(x3, "conv3"),
             up(x4, "conv4")], axis=-1)  # (H, W, dim)

        s = nn.selu(nn.Conv(8, (1, 1), name="score0")(feats[None]))
        s = nn.selu(nn.Conv(4, (3, 3), padding="SAME", name="score1")(s))
        s = nn.selu(nn.Conv(4, (3, 3), padding="SAME", name="score2")(s))
        s = nn.Conv(1, (3, 3), padding="SAME", name="score3")(s)
        score = jax.nn.sigmoid(s[0, ..., 0])
        return feats, score


class SDDH(nn.Module):
    """Sparse deformable descriptor head over a set of keypoints."""

    cfg: AlikedConfig = AlikedConfig()

    @nn.compact
    def __call__(self, feats, xy):  # feats (H,W,dim), xy (N,2) float [x,y]
        c = self.cfg
        K, M, dim = c.K, c.M, c.dim
        r = (K - 1) // 2
        # KxK patch per keypoint (bilinear: keypoints are sub-pixel)
        dyy, dxx = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                                jnp.arange(-r, r + 1, dtype=jnp.float32),
                                indexing="ij")
        py = xy[:, 1, None] + dyy.reshape(-1)[None, :]  # (N, K*K)
        px = xy[:, 0, None] + dxx.reshape(-1)[None, :]
        patch = bilinear_sample(feats, py, px)          # (N, K*K, dim)
        # offset head: a KxK VALID conv over the patch == one Dense over
        # the flattened patch; then gate + 1x1
        h = nn.Dense(2 * M, name="offset_conv0")(
            patch.reshape(patch.shape[0], -1))
        h = nn.selu(h)
        off = nn.Dense(2 * M, name="offset_conv1")(h)
        off = off.reshape(-1, M, 2)                     # (N, M, 2) (dy, dx)
        sy = xy[:, 1, None] + off[..., 0]
        sx = xy[:, 0, None] + off[..., 1]
        samp = bilinear_sample(feats, sy, sx)           # (N, M, dim)
        samp = nn.selu(nn.Dense(dim, use_bias=False, name="sf_conv")(samp))
        agg = self.param("agg_weights",
                         nn.initializers.normal(0.02), (M, dim, dim))
        desc = jnp.einsum("nmc,mcd->nd", samp, agg)
        return desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)


def _subpixel_refine(score, xy, radius=2, temp=0.1):
    """DKD sub-pixel: soft-argmax of the (2r+1)^2 score patch."""
    dyy, dxx = jnp.meshgrid(
        jnp.arange(-radius, radius + 1, dtype=jnp.float32),
        jnp.arange(-radius, radius + 1, dtype=jnp.float32), indexing="ij")
    dyy = dyy.reshape(-1)
    dxx = dxx.reshape(-1)
    py = xy[:, 1, None] + dyy[None, :]
    px = xy[:, 0, None] + dxx[None, :]
    patch = bilinear_sample(score[..., None], py, px)[..., 0]  # (N, P)
    w = jax.nn.softmax(patch / temp, axis=-1)
    return xy + jnp.stack([(w * dxx).sum(-1), (w * dyy).sum(-1)], axis=-1)


def aliked_from_torch(state_dict, template):
    """Map an official-layout ALIKED state dict (block1..4 / conv1..4 /
    score_head.{0,2,4,6} / desc_head.{offset_conv.{0,2}, sf_conv,
    agg_weights}) onto (AlikedNet, SDDH) variables."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    cfg = AlikedConfig()

    def bn(base):
        return {"weight": sd[f"{base}.weight"], "bias": sd[f"{base}.bias"],
                "running_mean": sd[f"{base}.running_mean"],
                "running_var": sd[f"{base}.running_var"]}

    def conv(base, bias=True):
        out = {"kernel": _t2f_conv(sd[f"{base}.weight"])}
        if bias:
            out["bias"] = sd[f"{base}.bias"]
        return out

    def dcn(base):
        # torchvision-style: offset conv + regular conv weight
        w = sd[f"{base}.conv.weight"]  # (Cout, Cin, k, k)
        co, ci, kh, kw = w.shape
        dense = w.transpose(2, 3, 1, 0).reshape(kh * kw * ci, co)
        return {"offset_conv": conv(f"{base}.offset_conv"),
                "conv": {"kernel": dense, "bias": sd[f"{base}.conv.bias"]}}

    def res(base, deform):
        blk = {"bn1": bn(f"{base}.bn1"), "bn2": bn(f"{base}.bn2")}
        for c in ("conv1", "conv2"):
            blk[c] = dcn(f"{base}.{c}") if deform \
                else conv(f"{base}.{c}", bias=False)
        if f"{base}.downsample.weight" in sd:
            blk["downsample"] = conv(f"{base}.downsample", bias=False)
        return blk

    net = {
        "block1": {"conv1": conv("block1.conv1", bias=False),
                   "bn1": bn("block1.bn1"),
                   "conv2": conv("block1.conv2", bias=False),
                   "bn2": bn("block1.bn2")},
        "block2": res("block2", False),
        "block3": res("block3", True),
        "block4": res("block4", True),
        "conv1": conv("conv1"), "conv2": conv("conv2"),
        "conv3": conv("conv3"), "conv4": conv("conv4"),
        "score0": conv("score_head.0"), "score1": conv("score_head.2"),
        "score2": conv("score_head.4"), "score3": conv("score_head.6"),
    }
    K, M, dim = cfg.K, cfg.M, cfg.dim
    ow = sd["desc_head.offset_conv.0.weight"]  # (2M, dim, K, K)
    head = {
        "offset_conv0": {
            "kernel": ow.transpose(2, 3, 1, 0).reshape(K * K * dim, 2 * M),
            "bias": sd["desc_head.offset_conv.0.bias"]},
        "offset_conv1": {
            "kernel": sd["desc_head.offset_conv.2.weight"]
            .reshape(2 * M, 2 * M).T,
            "bias": sd["desc_head.offset_conv.2.bias"]},
        "sf_conv": {"kernel": sd["desc_head.sf_conv.weight"]
                    .reshape(dim, dim).T},
        "agg_weights": sd["desc_head.agg_weights"],
    }
    return {"params": net}, {"params": head}


class AlikedExtractor:
    """ALIKED keypoints+descriptors with the FeatureData contract."""

    def __init__(self, num_features: int = 2000, checkpoint: str | None = None,
                 nms_cell: int = 8, cfg: AlikedConfig | None = None):
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.cfg = cfg or AlikedConfig()
        self.net = AlikedNet(self.cfg)
        self.head = SDDH(self.cfg)
        key = jax.random.PRNGKey(0)
        self.net_params = self.net.init(key, jnp.zeros((64, 64, 3)))
        feats0, _ = self.net.apply(self.net_params, jnp.zeros((64, 64, 3)))
        self.head_params = self.head.init(key, feats0,
                                          jnp.zeros((4, 2)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(net_params, head_params, img, n):
            h, w = img.shape[:2]
            hc, wc = (h // 32) * 32, (w // 32) * 32
            feats, score = self.net.apply(net_params, img[:hc, :wc] / 255.0)
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=4, max_out=n)
            xy = _subpixel_refine(score, xy)
            xy = jnp.clip(xy, 0.0,
                          jnp.array([wc - 1.0, hc - 1.0], jnp.float32))
            desc = self.head.apply(head_params, feats, xy)
            return xy, resp, valid, desc

        self._run = _run

    def load_checkpoint(self, path: str):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.net_params, self.head_params = aliked_from_torch(sd, None)

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        xy, resp, valid, desc = self._run(
            self.net_params, self.head_params, jnp.asarray(img),
            self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 8.0, jnp.float32),
            response=resp, desc=desc, valid=valid)
