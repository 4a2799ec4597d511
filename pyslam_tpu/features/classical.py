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


class ShiTomasiExtractor:
    """TPU-native Shi-Tomasi (min-eigenvalue) corner detector (reference
    ``feature_shitomasi.py`` wraps cv2.goodFeaturesToTrack; the response
    here is the closed-form smaller structure-tensor eigenvalue over
    Gaussian-windowed Sobel gradients, selected by grid top-k NMS).
    Primarily the LK tracker's seed detector; composes with the patch
    descriptor networks for descriptor-based presets."""

    def __init__(self, num_features: int = 1000, nms_cell: int = 8,
                 window_sigma: float = 1.5):
        import functools

        import jax
        import jax.numpy as jnp

        from pyslam_tpu.ops import image as image_ops
        from pyslam_tpu.ops import nms as nms_ops

        self.num_features = num_features
        self.nms_cell = nms_cell
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(img, n):
            gx, gy = image_ops.sobel_gradients(img / 255.0)
            sxx = image_ops.gaussian_blur(gx * gx, sigma=window_sigma)
            syy = image_ops.gaussian_blur(gy * gy, sigma=window_sigma)
            sxy = image_ops.gaussian_blur(gx * gy, sigma=window_sigma)
            tr = 0.5 * (sxx + syy)
            det = jnp.sqrt(jnp.maximum(
                (0.5 * (sxx - syy)) ** 2 + sxy * sxy, 0.0))
            score = tr - det                     # min eigenvalue
            return nms_ops.grid_topk_keypoints(
                score, cell=self.nms_cell, per_cell=4, max_out=n)

        self._run = _run

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        import jax.numpy as jnp

        xy, resp, valid = self._run(jnp.asarray(img), self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 10.0, jnp.float32),
            response=resp,
            desc=jnp.zeros((n, 1), jnp.float32),   # LK seeds: no descriptor
            valid=valid)
