"""Key.Net keypoint detector (handcrafted + learned filters) in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_keynet.py``
and the KEYNETAFFNETHARDNET preset (``feature_keynet_affnet_hardnet.py``,
kornia pipeline KeyNet -> AffNet -> HardNet).  Faithful to the published
Key.Net (axelBarroso/Key.Net; kornia ``feature/keynet.py``):

  * handcrafted block (10 maps from Sobel derivatives):
      [dx, dy, dx^2, dy^2, dx*dy, dxy, dxy^2, dxx*dyy, dxx, dyy]
  * learnable block: 3 x [conv3x3(8ch, no bias) -> BN -> ReLU], SHARED
    across a 3-level scale pyramid (downscale factor 1.2);
  * per-level maps are upsampled to full resolution, concatenated (24ch),
    and a final 1x1 conv produces the score map.

Keypoints = grid-NMS maxima of the score map.  In the composite preset the
descriptors come from the HardNet patch network
(models/patch_descriptors.py), mirroring the reference pipeline (AffNet's
affine-shape adaptation is approximated by the oriented-patch extraction).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.models.resnet import BN
from pyslam_tpu.models.torch_convert import _np, _t2f_conv
from pyslam_tpu.ops import nms as nms_ops

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T.copy()


def _conv2(x, k):
    x = x.astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        x[None, ..., None], jnp.asarray(k, jnp.float32)[..., None, None],
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]


def handcrafted_block(x: jnp.ndarray) -> jnp.ndarray:
    """(H,W) -> (H,W,10) Sobel-derivative combinations (kornia order)."""
    dx = _conv2(x, _SOBEL_X)
    dy = _conv2(x, _SOBEL_Y)
    dxx = _conv2(dx, _SOBEL_X)
    dxy = _conv2(dx, _SOBEL_Y)
    dyy = _conv2(dy, _SOBEL_Y)
    return jnp.stack(
        [dx, dy, dx ** 2, dy ** 2, dx * dy, dxy, dxy ** 2, dxx * dyy,
         dxx, dyy], axis=-1)


class KeyNetLearnable(nn.Module):
    filters: int = 8
    blocks: int = 3

    @nn.compact
    def __call__(self, feats):  # (H,W,10)
        x = feats[None]
        for i in range(self.blocks):
            x = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(BN(self.filters, name=f"bn{i}")(x))
        return x[0]


class KeyNet(nn.Module):
    levels: int = 3
    scale: float = 1.2
    filters: int = 8

    @nn.compact
    def __call__(self, img):  # (H,W) in [0,1]
        H, W = img.shape
        extractor = KeyNetLearnable(self.filters, name="learnable")
        maps = []
        cur = img
        for lv in range(self.levels):
            f = extractor(handcrafted_block(cur))
            if lv > 0:
                f = jax.image.resize(f, (H, W, self.filters), "bilinear")
            maps.append(f)
            nh = max(int(round(H / (self.scale ** (lv + 1)))), 8)
            nw = max(int(round(W / (self.scale ** (lv + 1)))), 8)
            cur = jax.image.resize(img, (nh, nw), "bilinear")
        x = jnp.concatenate(maps, axis=-1)
        score = nn.Conv(1, (1, 1), name="last_conv")(x[None])[0, ..., 0]
        return nn.relu(score)


def keynet_from_torch(state_dict):
    """Map kornia/official KeyNet keys by order: 3 conv+bn pairs + final."""
    sd = state_dict
    convs = [k for k in sd if k.endswith(".weight")
             and _np(sd[k]).ndim == 4]
    body = [k for k in convs if _np(sd[k]).shape[2] == 3][:3]
    last = [k for k in convs if _np(sd[k]).shape[2] == 1]
    params = {"learnable": {}}
    for i, k in enumerate(body):
        params["learnable"][f"conv{i}"] = {"kernel": _t2f_conv(_np(sd[k]))}
        # locate the BN that follows this conv by matching channel count
        ch = _np(sd[k]).shape[0]
        bn_mean = [b for b in sd if b.endswith("running_mean")
                   and _np(sd[b]).shape[0] == ch]
        params["learnable"][f"bn{i}"] = {
            "running_mean": _np(sd[bn_mean[i]]),
            "running_var": _np(sd[bn_mean[i].replace("mean", "var")]),
            "weight": _np(sd[bn_mean[i].replace("running_mean", "weight")]),
            "bias": _np(sd[bn_mean[i].replace("running_mean", "bias")]),
        }
    lk = last[0]
    params["last_conv"] = {"kernel": _t2f_conv(_np(sd[lk])),
                           "bias": _np(sd[lk.replace("weight", "bias")])}
    return {"params": params}


class KeyNetExtractor:
    """KeyNet detector + HardNet patch descriptors (the reference's
    KEYNETAFFNETHARDNET composite, minus AffNet shape adaptation)."""

    def __init__(self, num_features: int = 2000, checkpoint: str | None = None,
                 descriptor: str = "HARDNET", nms_cell: int = 8):
        from pyslam_tpu.models.patch_descriptors import PatchDescriptorExtractor

        self.num_features = num_features
        self.nms_cell = nms_cell
        self.net = KeyNet()
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((64, 64)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.descriptor = PatchDescriptorExtractor(descriptor)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _detect(params, img, n):
            score = self.net.apply(params, img)
            return nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=4, max_out=n)

        self._detect = _detect

    def load_checkpoint(self, path: str):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        self.params = keynet_from_torch(sd)

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        img01 = img / 255.0 if img.max() > 2.0 else img
        xy, resp, valid = self._detect(
            self.params, jnp.asarray(img01), self.num_features)
        n = self.num_features
        sizes = np.full((n,), 31.0, np.float32)
        angles = np.full((n,), -1.0, np.float32)  # unoriented
        desc = self.descriptor.compute(img, np.asarray(xy), sizes, angles)
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.asarray(angles),
            size=jnp.asarray(sizes),
            response=resp, desc=jnp.asarray(desc), valid=valid)
