"""XFeat detector/descriptor as a flax network (faithful architecture).

Implements the public XFeat ("accelerated features") network so that official
torch checkpoints can be converted 1:1 (see ``models/torch_convert.py``):
InstanceNorm input, BasicLayer = bias-free 3x3 Conv + affine-free BatchNorm +
ReLU, five encoder blocks with an AvgPool skip, multi-scale fusion at 1/8
resolution, a 64-d descriptor map, a reliability heatmap head, and a 65-way
(8x8 cell + dustbin) keypoint-logit head over the 8x8-unfolded raw image.

Reference wrapper: pySLAM ``pyslam/local_features/feature_xfeat.py`` (which
drives the upstream torch implementation); this is a from-scratch JAX
re-implementation of the same published architecture, structured so the whole
forward + keypoint decode compiles into ONE XLA graph with fixed output
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops


class BasicLayer(nn.Module):
    """Conv(bias=False) + BatchNorm(affine=False, running stats) + ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    # torch semantics: explicit symmetric padding (torch pads (1,1) and
    # floors; flax "SAME" pads (0,1) for stride 2 — one-pixel window shift
    # that would break checkpoint parity)
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding, self.padding), (self.padding, self.padding)]
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad, use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, use_bias=False, use_scale=False,
            epsilon=1e-5,
        )(x)
        return nn.relu(x)


def _unfold2d(x, ws=8):
    """(B,H,W,1) -> (B,H/ws,W/ws,ws*ws): 8x8 pixel blocks as channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // ws, w // ws, ws * ws * c)


class XFeatNet(nn.Module):
    """Returns (feats 1/8 64-d, keypoint logits 1/8 65ch, heatmap 1/8 1ch)."""

    @nn.compact
    def __call__(self, x):  # (B,H,W,1), H,W multiples of 32
        # InstanceNorm(1): per-image spatial standardization (no affine)
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mu) / jnp.sqrt(var + 1e-5)

        # skip1: AvgPool(4,4) + 1x1 Conv(24) (with bias)
        skip = nn.avg_pool(xn, (4, 4), strides=(4, 4))
        skip = nn.Conv(24, (1, 1), name="skip1_conv")(skip)

        x1 = BasicLayer(4, stride=1)(xn)
        x1 = BasicLayer(8, stride=2)(x1)
        x1 = BasicLayer(8, stride=1)(x1)
        x1 = BasicLayer(24, stride=2)(x1)

        x2 = BasicLayer(24, stride=1)(x1 + skip)
        x2 = BasicLayer(24, stride=1)(x2)

        x3 = BasicLayer(64, stride=2)(x2)
        x3 = BasicLayer(64, stride=1)(x3)
        x3 = BasicLayer(64, kernel=1, padding=0)(x3)

        x4 = BasicLayer(64, stride=2)(x3)
        x4 = BasicLayer(64, stride=1)(x4)
        x4 = BasicLayer(64, stride=1)(x4)

        x5 = BasicLayer(128, stride=2)(x4)
        x5 = BasicLayer(128, stride=1)(x5)
        x5 = BasicLayer(128, stride=1)(x5)
        x5 = BasicLayer(64, kernel=1, padding=0)(x5)

        h3, w3 = x3.shape[1], x3.shape[2]
        x4u = jax.image.resize(x4, (x4.shape[0], h3, w3, x4.shape[3]), "bilinear")
        x5u = jax.image.resize(x5, (x5.shape[0], h3, w3, x5.shape[3]), "bilinear")

        feats = BasicLayer(64, stride=1)(x3 + x4u + x5u)
        feats = BasicLayer(64, stride=1)(feats)
        feats = nn.Conv(64, (1, 1), name="fusion_conv")(feats)

        heat = BasicLayer(64, kernel=1, padding=0)(feats)
        heat = BasicLayer(64, kernel=1, padding=0)(heat)
        heat = nn.Conv(1, (1, 1), name="heatmap_conv")(heat)
        heat = jax.nn.sigmoid(heat)

        kx = _unfold2d(xn, ws=8)
        kx = BasicLayer(64, kernel=1, padding=0)(kx)
        kx = BasicLayer(64, kernel=1, padding=0)(kx)
        kx = BasicLayer(64, kernel=1, padding=0)(kx)
        klogits = nn.Conv(65, (1, 1), name="keypoint_conv")(kx)

        return feats, klogits, heat


def _kpts_heatmap(klogits, softmax_temp=1.0):
    """(B,H8,W8,65) logits -> (B,H,W) keypoint probability (dustbin dropped,
    8x8 cells scattered back to pixels)."""
    scores = jax.nn.softmax(klogits * softmax_temp, axis=-1)[..., :64]
    b, h8, w8, _ = scores.shape
    heat = scores.reshape(b, h8, w8, 8, 8)
    heat = heat.transpose(0, 1, 3, 2, 4).reshape(b, h8 * 8, w8 * 8)
    return heat


class XFeatExtractor:
    """Fixed-shape XFeat extraction: detect on the keypoint heatmap, weight by
    reliability, sample + L2-normalize 64-d descriptors — one jitted graph."""

    def __init__(self, num_features: int = 2000, checkpoint: str | None = None):
        self.num_features = num_features
        self.net = XFeatNet()
        self.variables = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
        )
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(variables, img, n):
            h, w = img.shape
            h32, w32 = (h // 32) * 32, (w // 32) * 32
            x = img[:h32, :w32, None][None] / 255.0
            feats, klogits, heat = self.net.apply(variables, x)
            kheat = _kpts_heatmap(klogits)[0]          # (h32,w32)
            rel = heat[0, ..., 0]                      # (h32/8, w32/8)

            xy, resp, valid = nms_ops.grid_topk_keypoints(
                kheat, cell=8, per_cell=2, max_out=n
            )
            # score = keypoint prob * bilinear reliability at kp/8
            gx = jnp.clip(xy[:, 0] / 8.0, 0, rel.shape[1] - 1.001)
            gy = jnp.clip(xy[:, 1] / 8.0, 0, rel.shape[0] - 1.001)
            x0, y0 = gx.astype(jnp.int32), gy.astype(jnp.int32)
            fx, fy = gx - x0, gy - y0
            r = (
                rel[y0, x0] * (1 - fx) * (1 - fy)
                + rel[y0, x0 + 1] * fx * (1 - fy)
                + rel[y0 + 1, x0] * (1 - fx) * fy
                + rel[y0 + 1, x0 + 1] * fx * fy
            )
            resp = resp * r

            # descriptors: bilinear sample the 1/8 feature map, L2 normalize
            dmap = feats[0]
            d = (
                dmap[y0, x0] * ((1 - fx) * (1 - fy))[:, None]
                + dmap[y0, x0 + 1] * (fx * (1 - fy))[:, None]
                + dmap[y0 + 1, x0] * ((1 - fx) * fy)[:, None]
                + dmap[y0 + 1, x0 + 1] * (fx * fy)[:, None]
            )
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return xy, resp, valid, d

        self._run = _run

    def load_checkpoint(self, path: str):
        """Load a converted checkpoint (.npz from torch_convert) or a torch
        .pth directly."""
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import xfeat_from_torch_file

            self.variables = xfeat_from_torch_file(path, self.variables)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.variables = load_variables_npz(path, self.variables)

    def __call__(self, img) -> FeatureData:
        img = jnp.asarray(img, jnp.float32)
        xy, resp, valid, desc = self._run(self.variables, img, self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy,
            level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 8.0, jnp.float32),
            response=resp,
            desc=desc,
            valid=valid,
        )
