"""Feature matchers over dense device distance matrices.

Reference surface: pySLAM ``pyslam/local_features/feature_matcher.py``
(BF/FLANN matchers + ``goodMatchesOneToOne``).  Here a matcher is a thin
config object choosing the distance kernel (MXU Hamming for binary, matmul L2
/cosine for float descriptors) and the filtering mode; all compute is the
jitted ops in ``pyslam_tpu.ops.hamming`` / ``ops.matching``.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.features.types import NormType
from pyslam_tpu.ops import hamming, matching


class FeatureMatcherTypes(enum.Enum):
    BF = 0        # brute force + ratio test + one-to-one (default)
    NN = 1        # plain nearest neighbor with gate
    XFEAT = 2     # learned matcher slot (MNN over float descs)
    LIGHTGLUE = 3 # learned matcher slot


class FeatureMatcher:
    def __init__(
        self,
        norm: NormType = NormType.HAMMING,
        matcher_type: FeatureMatcherTypes = FeatureMatcherTypes.BF,
        max_distance: float | None = None,
        ratio_test: float | None = None,
    ):
        self.norm = norm
        self.matcher_type = matcher_type
        self.max_distance = (
            max_distance if max_distance is not None else Parameters.kMaxDescriptorDistance
        )
        self.ratio_test = ratio_test if ratio_test is not None else Parameters.kMatchRatioTest

    def distance_matrix(self, des1, des2) -> jnp.ndarray:
        if self.norm == NormType.HAMMING:
            return hamming.hamming_distance_matrix(des1, des2).astype(jnp.float32)
        if self.norm == NormType.L2:
            return hamming.l2_distance_matrix(des1, des2)
        # cosine distance for normalized float descriptors
        sim = des1 @ des2.T
        return 1.0 - sim

    def match(self, des1, des2, valid1=None, valid2=None, ratio=None, mask=None):
        """Returns (idx2_for_each_1 with -1, distances)."""
        d = self.distance_matrix(des1, des2)
        if self.matcher_type == FeatureMatcherTypes.NN:
            return matching.match_nn(
                d, self.max_distance, valid_a=valid1, valid_b=valid2, extra_mask=mask
            )
        return matching.match_ratio_test(
            d,
            self.max_distance,
            ratio=ratio if ratio is not None else self.ratio_test,
            valid_a=valid1,
            valid_b=valid2,
            cross_check=True,
            extra_mask=mask,
        )


class LightGlueFeatureMatcher(FeatureMatcher):
    """Attention matcher over (descriptors + keypoint coords); falls back to
    ratio-test BF for calls that only carry descriptors (stereo rows etc.)."""

    def __init__(self, norm=NormType.L2, input_dim: int = 256,
                 checkpoint: str | None = None, **kw):
        super().__init__(norm=norm, matcher_type=FeatureMatcherTypes.LIGHTGLUE, **kw)
        from pyslam_tpu.models.lightglue import LightGlueMatcher

        self.glue = LightGlueMatcher(input_dim=input_dim, checkpoint=checkpoint)

    def match_features(self, f1, f2, image_wh=(640.0, 480.0)):
        """FeatureData x FeatureData -> (idx2_for_each_1 with -1, conf)."""
        return self.glue.match(f1, f2, image_wh=image_wh)


def feature_matcher_factory(
    norm: NormType = NormType.HAMMING,
    matcher_type: FeatureMatcherTypes = FeatureMatcherTypes.BF,
    **kw,
) -> FeatureMatcher:
    if matcher_type == FeatureMatcherTypes.LIGHTGLUE:
        kw.pop("max_distance", None)
        return LightGlueFeatureMatcher(norm=norm, **kw)
    return FeatureMatcher(norm=norm, matcher_type=matcher_type, **kw)
