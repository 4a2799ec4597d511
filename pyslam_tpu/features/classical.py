"""Classical (host-side) feature extractors: SIFT and RootSIFT.

The reference exposes SIFT/ROOT_SIFT through OpenCV inside its
FeatureManager (pySLAM ``pyslam/local_features/feature_manager.py``;
RootSIFT transform in ``feature_root_sift.py``: L1-normalize then
element-wise sqrt — the Hellinger kernel trick).  ROOT_SIFT + DBOW3 is one
of the three published benchmark presets (BASELINE.md), so this matters for
ATE parity.  Detection is inherently host work (tiny, branchy, runs once
per frame while the TPU crunches the previous frame's backend); descriptors
land in the same fixed-shape ``FeatureData`` the device pipeline consumes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyslam_tpu.features.orb2 import FeatureData


class CvSIFTExtractor:
    """cv2.SIFT wrapped to the fixed-shape FeatureData contract.

    root_sift=True applies the RootSIFT mapping (reference
    ``feature_root_sift.py``): des <- sqrt(des / ||des||_1).
    """

    def __init__(self, num_features: int = 2000, num_levels: int = 16,
                 scale_factor: float = 1.2, root_sift: bool = False):
        import cv2

        self.num_features = num_features
        self.num_levels = num_levels
        self.scale_factor = scale_factor
        self.root_sift = root_sift
        self._sift = cv2.SIFT_create(nfeatures=num_features)
        self.scale_factors = (scale_factor ** np.arange(num_levels)).astype(np.float32)
        self.sigma2 = (self.scale_factors ** 2).astype(np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

    def _level_from_size(self, sizes: np.ndarray) -> np.ndarray:
        """Map the continuous SIFT keypoint size onto the discrete sigma
        pyramid used by the SLAM matching gates (reference
        feature_manager.py init_sigma_levels maps sizes the same way)."""
        base = 3.2  # SIFT base keypoint diameter (2 * 1.6 sigma)
        lv = np.round(np.log(np.maximum(sizes, base) / base)
                      / np.log(self.scale_factor))
        return np.clip(lv, 0, self.num_levels - 1).astype(np.int32)

    def __call__(self, img) -> FeatureData:
        img8 = np.asarray(img)
        if img8.dtype != np.uint8:
            img8 = np.clip(img8, 0, 255).astype(np.uint8)
        if img8.ndim == 3:
            import cv2

            img8 = cv2.cvtColor(img8, cv2.COLOR_BGR2GRAY)
        kps, des = self._sift.detectAndCompute(img8, None)
        n = self.num_features
        xy = np.zeros((n, 2), np.float32)
        level = np.zeros((n,), np.int32)
        angle = np.zeros((n,), np.float32)
        size = np.full((n,), 3.2, np.float32)
        resp = np.zeros((n,), np.float32)
        dim = 128
        desc = np.zeros((n, dim), np.float32)
        valid = np.zeros((n,), bool)
        if kps:
            k = min(len(kps), n)
            order = np.argsort([-p.response for p in kps])[:k]
            xy[:k] = [kps[i].pt for i in order]
            angle[:k] = [kps[i].angle for i in order]
            size[:k] = [kps[i].size for i in order]
            resp[:k] = [kps[i].response for i in order]
            level[:k] = self._level_from_size(size[:k])
            d = des[order].astype(np.float32)
            if self.root_sift:
                d = np.sqrt(d / np.maximum(
                    np.abs(d).sum(axis=1, keepdims=True), 1e-7))
            desc[:k] = d
            valid[:k] = True
        return FeatureData(
            xy=jnp.asarray(xy), level=jnp.asarray(level),
            angle=jnp.asarray(angle), size=jnp.asarray(size),
            response=jnp.asarray(resp), desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
        )
