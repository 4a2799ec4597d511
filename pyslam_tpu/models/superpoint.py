"""SuperPoint-class detector/descriptor as a flax network.

Architecture after the public SuperPoint design (VGG-style shared encoder,
8x8-cell detection head with dustbin, 256-d descriptor head with bicubic
upsample + L2 norm); reference wrapper: pySLAM
``pyslam/local_features/feature_superpoint.py``.  The whole forward +
keypoint decoding (cell softmax, NMS via grid top-k, descriptor sampling) is
one jitted graph producing fixed-shape FeatureData.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops


class SuperPointNet(nn.Module):
    det_channels: int = 65   # 8x8 cells + dustbin
    desc_dim: int = 256

    @nn.compact
    def __call__(self, x):  # x: (H,W,1)
        def block(x, c, pool):
            x = nn.Conv(c, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(c, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return x

        x = block(x[None], 64, True)
        x = block(x, 64, True)
        x = block(x, 128, True)
        x = block(x, 128, False)
        # detector head
        det = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        det = nn.Conv(self.det_channels, (1, 1))(det)
        # descriptor head
        desc = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        desc = nn.Conv(self.desc_dim, (1, 1))(desc)
        return det[0], desc[0]


class SuperPointExtractor:
    def __init__(self, num_features: int = 1000, checkpoint: str | None = None,
                 nms_cell: int = 16, conf_threshold: float = 0.015):
        self.num_features = num_features
        self.net = SuperPointNet()
        self.nms_cell = nms_cell
        self.conf_threshold = conf_threshold
        key = jax.random.PRNGKey(0)
        self.params = self.net.init(key, jnp.zeros((64, 64, 1)))
        self.trained = False
        if checkpoint:
            self.load_checkpoint(checkpoint)
            self.trained = True
        else:
            # bundled in-framework-trained checkpoint (MagicPoint-style
            # synthetic-corner training, models/train_superpoint.py) — the
            # zero-egress stand-in for the official superpoint_v1.pth the
            # reference downloads (feature_superpoint.py:60-75)
            import os

            default = os.path.join(
                os.path.dirname(__file__), "checkpoints", "superpoint_tiny.npz"
            )
            if os.path.exists(default):
                self.load_checkpoint(default)
                self.trained = True
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(params, img, n):
            h, w = img.shape
            hc, wc = h // 8, w // 8
            det, desc = self.net.apply(params, img[: hc * 8, : wc * 8, None] / 255.0)
            # cell softmax, drop dustbin, unfold to full resolution
            prob = jax.nn.softmax(det, axis=-1)[..., :64]
            prob = prob.reshape(hc, wc, 8, 8).transpose(0, 2, 1, 3).reshape(hc * 8, wc * 8)
            score = jnp.where(prob > self.conf_threshold, prob, 0.0)
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=6, max_out=n
            )
            # sample descriptors (nearest cell) + L2 normalize
            cx = jnp.clip((xy[:, 0] / 8).astype(jnp.int32), 0, wc - 1)
            cy = jnp.clip((xy[:, 1] / 8).astype(jnp.int32), 0, hc - 1)
            d = desc[cy, cx]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return xy, resp, valid, d

        self._run = _run

    def load_checkpoint(self, path: str):
        """Load a converted .npz or an official MagicLeap torch .pth."""
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import superpoint_from_torch_file

            self.params = superpoint_from_torch_file(path, self.params)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(path, self.params)

    def __call__(self, img) -> FeatureData:
        img = jnp.asarray(img, jnp.float32)
        xy, resp, valid, desc = self._run(self.params, img, self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy,
            level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 8.0, jnp.float32),
            response=resp,
            desc=desc,  # float descriptors (L2 norm); matcher uses L2 metric
            valid=valid,
        )
