"""XFeat-class lightweight detector/descriptor as a flax network.

After the public XFeat design (shallow CNN, keypoint-heatmap head,
64-d dense descriptors); reference wrapper: pySLAM
``pyslam/local_features/feature_xfeat.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops


class XFeatNet(nn.Module):
    desc_dim: int = 64

    @nn.compact
    def __call__(self, x):  # (H,W,1)
        def cbr(x, c, s=1):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            return nn.relu(x)

        x = x[None]
        x = cbr(x, 24, 1)
        x = cbr(x, 24, 2)
        x = cbr(x, 64, 2)
        x = cbr(x, 64, 1)
        heat = nn.Conv(1, (1, 1))(x)                # 1/4 resolution heatmap
        desc = nn.Conv(self.desc_dim, (1, 1))(x)    # 1/4 resolution descriptors
        return heat[0, ..., 0], desc[0]


class XFeatExtractor:
    def __init__(self, num_features: int = 2000, checkpoint: str | None = None):
        self.num_features = num_features
        self.net = XFeatNet()
        self.params = self.net.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 1)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(params, img, n):
            h, w = img.shape
            h4, w4 = (h // 4) * 4, (w // 4) * 4
            heat, desc = self.net.apply(params, img[:h4, :w4, None] / 255.0)
            score = jax.nn.sigmoid(heat)
            xy4, resp, valid = nms_ops.grid_topk_keypoints(
                score, cell=8, per_cell=4, max_out=n
            )
            cx = jnp.clip(xy4[:, 0].astype(jnp.int32), 0, desc.shape[1] - 1)
            cy = jnp.clip(xy4[:, 1].astype(jnp.int32), 0, desc.shape[0] - 1)
            d = desc[cy, cx]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return xy4 * 4.0, resp, valid, d

        self._run = _run

    def load_checkpoint(self, path: str):
        import flax

        z = np.load(path, allow_pickle=True)
        self.params = flax.core.freeze(
            jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.params),
                [jnp.asarray(z[k]) for k in sorted(z.files)],
            )
        )

    def __call__(self, img) -> FeatureData:
        img = jnp.asarray(img, jnp.float32)
        xy, resp, valid, desc = self._run(self.params, img, self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy,
            level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 4.0, jnp.float32),
            response=resp,
            desc=desc,
            valid=valid,
        )
