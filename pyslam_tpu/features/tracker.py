"""Feature trackers: detector+descriptor+matcher bundles + config presets.

Reference surface: pySLAM ``pyslam/local_features/feature_tracker.py:56``
(``feature_tracker_factory``) and ``feature_tracker_configs.py:43-510``
(``FeatureTrackerConfigs`` presets).  A tracker owns an extractor (ORB2 JAX
pipeline today; learned extractors plug in via the models package) and a
matcher; ``track(f1, f2)`` returns index pairs.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.features.matcher import (
    FeatureMatcher,
    FeatureMatcherTypes,
    feature_matcher_factory,
)
from pyslam_tpu.features.orb2 import ORB2Extractor, FeatureData
from pyslam_tpu.features.types import (
    FEATURE_INFO,
    FeatureDescriptorTypes,
    FeatureDetectorTypes,
    NormType,
)


class FeatureTrackerTypes(enum.Enum):
    DES_BF = 0    # descriptor matching, brute force (default)
    DES_NN = 1
    LK = 2        # Lucas-Kanade optical flow (pyramidal, JAX)
    XFEAT = 3
    LIGHTGLUE = 4
    MAST3R = 5    # dense two-view matcher (reference Mast3rFeatureTracker)
    LOFTR = 6     # detector-free transformer matcher (reference LoftrFeatureTracker)


@dataclass
class FeatureTrackerConfig:
    name: str = "ORB2"
    detector_type: FeatureDetectorTypes = FeatureDetectorTypes.ORB2
    descriptor_type: FeatureDescriptorTypes = FeatureDescriptorTypes.ORB2
    tracker_type: FeatureTrackerTypes = FeatureTrackerTypes.DES_BF
    num_features: int = 2000
    num_levels: int = 8
    scale_factor: float = 1.2
    ratio_test: float = 0.75
    extra: dict = field(default_factory=dict)

    def to_json(self):
        return {
            "name": self.name,
            "detector_type": self.detector_type.name,
            "descriptor_type": self.descriptor_type.name,
            "tracker_type": self.tracker_type.name,
            "num_features": self.num_features,
            "num_levels": self.num_levels,
            "scale_factor": self.scale_factor,
            "ratio_test": self.ratio_test,
        }

    @staticmethod
    def from_json(d):
        return FeatureTrackerConfig(
            name=d.get("name", "ORB2"),
            detector_type=FeatureDetectorTypes[d.get("detector_type", "ORB2")],
            descriptor_type=FeatureDescriptorTypes[d.get("descriptor_type", "ORB2")],
            tracker_type=FeatureTrackerTypes[d.get("tracker_type", "DES_BF")],
            num_features=d.get("num_features", 2000),
            num_levels=d.get("num_levels", 8),
            scale_factor=d.get("scale_factor", 1.2),
            ratio_test=d.get("ratio_test", 0.75),
        )


class FeatureTrackerConfigs:
    """Preset registry mirroring the reference's class-of-dicts style."""

    ORB2 = FeatureTrackerConfig(name="ORB2")
    ORB2_BF = FeatureTrackerConfig(name="ORB2_BF")
    ORB = FeatureTrackerConfig(name="ORB", num_levels=8)
    FAST_ORB = FeatureTrackerConfig(
        name="FAST_ORB", detector_type=FeatureDetectorTypes.FAST
    )
    LK_FAST = FeatureTrackerConfig(
        name="LK_FAST",
        detector_type=FeatureDetectorTypes.FAST,
        tracker_type=FeatureTrackerTypes.LK,
        num_levels=3,
    )
    LK_SHI_TOMASI = FeatureTrackerConfig(  # reference LK default seeds
        name="LK_SHI_TOMASI",
        detector_type=FeatureDetectorTypes.SHI_TOMASI,
        tracker_type=FeatureTrackerTypes.LK,
        num_features=1000,
        num_levels=1,
    )
    # learned-feature presets activate the flax models when weights are present
    SUPERPOINT = FeatureTrackerConfig(
        name="SUPERPOINT",
        detector_type=FeatureDetectorTypes.SUPERPOINT,
        descriptor_type=FeatureDescriptorTypes.SUPERPOINT,
        num_features=1000,
        num_levels=1,
        ratio_test=0.8,
    )
    XFEAT = FeatureTrackerConfig(
        name="XFEAT",
        detector_type=FeatureDetectorTypes.XFEAT,
        descriptor_type=FeatureDescriptorTypes.XFEAT,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    LIGHTGLUE = FeatureTrackerConfig(
        name="LIGHTGLUE",  # SuperPoint + LightGlue (reference preset name)
        detector_type=FeatureDetectorTypes.SUPERPOINT,
        descriptor_type=FeatureDescriptorTypes.SUPERPOINT,
        tracker_type=FeatureTrackerTypes.LIGHTGLUE,
        num_features=1000,
        num_levels=1,
        extra={"desc_dim": 256},
    )
    D2NET = FeatureTrackerConfig(
        name="D2NET",
        detector_type=FeatureDetectorTypes.D2NET,
        descriptor_type=FeatureDescriptorTypes.D2NET,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    KEYNET = FeatureTrackerConfig(
        name="KEYNET",
        detector_type=FeatureDetectorTypes.KEYNET,
        descriptor_type=FeatureDescriptorTypes.HARDNET,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    KEYNETAFFNETHARDNET = FeatureTrackerConfig(
        name="KEYNETAFFNETHARDNET",
        detector_type=FeatureDetectorTypes.KEYNET,
        descriptor_type=FeatureDescriptorTypes.HARDNET,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    LOFTR = FeatureTrackerConfig(
        name="LOFTR",
        tracker_type=FeatureTrackerTypes.LOFTR,
        num_features=1024,
        num_levels=1,
    )
    MAST3R = FeatureTrackerConfig(
        name="MAST3R",
        descriptor_type=FeatureDescriptorTypes.MAST3R,
        tracker_type=FeatureTrackerTypes.MAST3R,
        num_features=2000,
        num_levels=1,
        ratio_test=0.9,
    )
    DISK = FeatureTrackerConfig(
        name="DISK",
        detector_type=FeatureDetectorTypes.DISK,
        descriptor_type=FeatureDescriptorTypes.DISK,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    ALIKED = FeatureTrackerConfig(
        name="ALIKED",
        detector_type=FeatureDetectorTypes.ALIKED,
        descriptor_type=FeatureDescriptorTypes.ALIKED,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    R2D2 = FeatureTrackerConfig(
        name="R2D2",
        detector_type=FeatureDetectorTypes.R2D2,
        descriptor_type=FeatureDescriptorTypes.R2D2,
        num_features=2000,
        num_levels=1,
        ratio_test=0.8,
    )
    SIFT = FeatureTrackerConfig(
        name="SIFT",
        detector_type=FeatureDetectorTypes.SIFT,
        descriptor_type=FeatureDescriptorTypes.SIFT,
        num_levels=16,
    )
    ROOT_SIFT = FeatureTrackerConfig(  # benchmark preset #2 (BASELINE.md)
        name="ROOT_SIFT",
        detector_type=FeatureDetectorTypes.ROOT_SIFT,
        descriptor_type=FeatureDescriptorTypes.ROOT_SIFT,
        num_levels=16,
    )
    # ORB2 detector + patch-descriptor networks (reference presets
    # ORB2_HARDNET / ORB2_SOSNET / ORB2_L2NET, feature_tracker_configs.py)
    ORB2_HARDNET = FeatureTrackerConfig(
        name="ORB2_HARDNET", descriptor_type=FeatureDescriptorTypes.HARDNET,
    )
    ORB2_SOSNET = FeatureTrackerConfig(
        name="ORB2_SOSNET", descriptor_type=FeatureDescriptorTypes.SOSNET,
    )
    ORB2_L2NET = FeatureTrackerConfig(
        name="ORB2_L2NET", descriptor_type=FeatureDescriptorTypes.L2NET,
    )
    ORB2_TFEAT = FeatureTrackerConfig(
        name="ORB2_TFEAT", descriptor_type=FeatureDescriptorTypes.TFEAT,
    )
    SHI_TOMASI_HARDNET = FeatureTrackerConfig(
        name="SHI_TOMASI_HARDNET",
        detector_type=FeatureDetectorTypes.SHI_TOMASI,
        descriptor_type=FeatureDescriptorTypes.HARDNET,
        num_features=1000,
        num_levels=1,
    )
    SURF = FeatureTrackerConfig(
        name="SURF",
        detector_type=FeatureDetectorTypes.SURF,
        descriptor_type=FeatureDescriptorTypes.SURF,
        num_features=1000,
        num_levels=1,
        ratio_test=0.8,
    )
    KAZE = FeatureTrackerConfig(
        name="KAZE",
        detector_type=FeatureDetectorTypes.KAZE,
        descriptor_type=FeatureDescriptorTypes.KAZE,
        num_features=1000,
        num_levels=1,
        ratio_test=0.8,
    )
    AKAZE = FeatureTrackerConfig(
        name="AKAZE",
        detector_type=FeatureDetectorTypes.AKAZE,
        descriptor_type=FeatureDescriptorTypes.AKAZE,
        num_features=1000,
        num_levels=1,
    )
    # LightGlue attention matcher over alternative extractors (reference
    # presets LIGHTGLUE_DISK / LIGHTGLUE_ALIKED / LIGHTGLUE_SIFT)
    LIGHTGLUE_DISK = FeatureTrackerConfig(
        name="LIGHTGLUE_DISK",
        detector_type=FeatureDetectorTypes.DISK,
        descriptor_type=FeatureDescriptorTypes.DISK,
        tracker_type=FeatureTrackerTypes.LIGHTGLUE,
        num_features=2000,
        num_levels=1,
        extra={"desc_dim": 128},
    )
    LIGHTGLUE_ALIKED = FeatureTrackerConfig(
        name="LIGHTGLUE_ALIKED",
        detector_type=FeatureDetectorTypes.ALIKED,
        descriptor_type=FeatureDescriptorTypes.ALIKED,
        tracker_type=FeatureTrackerTypes.LIGHTGLUE,
        num_features=2000,
        num_levels=1,
        extra={"desc_dim": 128},
    )
    LIGHTGLUE_SIFT = FeatureTrackerConfig(
        name="LIGHTGLUE_SIFT",
        detector_type=FeatureDetectorTypes.SIFT,
        descriptor_type=FeatureDescriptorTypes.SIFT,
        tracker_type=FeatureTrackerTypes.LIGHTGLUE,
        num_levels=16,
        extra={"desc_dim": 128},
    )
    BRISK = FeatureTrackerConfig(  # FAST-pyramid detector (AGAST-class)
        name="BRISK", descriptor_type=FeatureDescriptorTypes.BRISK,
    )
    ORB2_FREAK = FeatureTrackerConfig(
        name="ORB2_FREAK", descriptor_type=FeatureDescriptorTypes.FREAK,
    )
    ORB2_BEBLID = FeatureTrackerConfig(
        name="ORB2_BEBLID", descriptor_type=FeatureDescriptorTypes.BEBLID,
    )
    ORB2_GEODESC = FeatureTrackerConfig(
        name="ORB2_GEODESC", descriptor_type=FeatureDescriptorTypes.GEODESC,
    )
    GEODESC = FeatureTrackerConfig(  # reference GEODESC preset slot
        name="GEODESC", descriptor_type=FeatureDescriptorTypes.GEODESC,
    )
    LOGPOLAR = FeatureTrackerConfig(
        name="LOGPOLAR", descriptor_type=FeatureDescriptorTypes.LOGPOLAR,
    )
    CONTEXTDESC = FeatureTrackerConfig(  # SIFT kps re-described (reference)
        name="CONTEXTDESC",
        detector_type=FeatureDetectorTypes.SIFT,
        descriptor_type=FeatureDescriptorTypes.CONTEXTDESC,
        num_levels=16,
        ratio_test=0.8,
    )
    LFNET = FeatureTrackerConfig(
        name="LFNET",
        detector_type=FeatureDetectorTypes.LFNET,
        descriptor_type=FeatureDescriptorTypes.LFNET,
        num_features=1000,
        num_levels=1,
        ratio_test=0.8,
    )
    DELF = FeatureTrackerConfig(
        name="DELF",
        detector_type=FeatureDetectorTypes.DELF,
        descriptor_type=FeatureDescriptorTypes.DELF,
        num_features=1000,
        num_levels=1,
        ratio_test=0.8,
    )
    XFEAT_LIGHTGLUE = FeatureTrackerConfig(
        name="XFEAT_LIGHTGLUE",
        detector_type=FeatureDetectorTypes.XFEAT,
        descriptor_type=FeatureDescriptorTypes.XFEAT,
        tracker_type=FeatureTrackerTypes.LIGHTGLUE,
        num_features=2000,
        num_levels=1,
        extra={"desc_dim": 64},
    )

    @staticmethod
    def get(name: str) -> FeatureTrackerConfig:
        cfg = getattr(FeatureTrackerConfigs, name, None)
        if cfg is None:
            raise KeyError(f"unknown tracker preset {name}")
        return cfg


class _PatchDescribedExtractor:
    """Detector + patch-network descriptor composition: run the base
    detector, then replace the descriptors with a patch-net forward over
    oriented 32x32 patches (one batched device dispatch)."""

    def __init__(self, base, kind: str, checkpoint=None):
        from pyslam_tpu.models.patch_descriptors import PatchDescriptorExtractor

        self.base = base
        self.descriptor = PatchDescriptorExtractor(kind)
        if checkpoint:
            self.descriptor.load_torch(checkpoint)
        self.scale_factors = base.scale_factors
        self.sigma2 = base.sigma2

    def __call__(self, img):
        fd = self.base(img)
        des = self.descriptor.compute(
            np.asarray(img, np.float32),
            np.asarray(fd.xy), np.asarray(fd.size), np.asarray(fd.angle))
        return fd._replace(desc=des)


class _ContextDescribedExtractor:
    """Detector + ContextDesc augmentation: re-describe the detector's
    keypoints with context-augmented descriptors (reference CONTEXTDESC
    preset runs over SIFT keypoints)."""

    def __init__(self, base, checkpoint=None):
        from pyslam_tpu.models.contextdesc import ContextDescExtractor

        self.base = base
        self.descriptor = ContextDescExtractor(checkpoint=checkpoint)
        self.scale_factors = base.scale_factors
        self.sigma2 = base.sigma2

    def __call__(self, img):
        fd = self.base(img)
        gray = np.asarray(img, np.float32)
        if gray.ndim == 3:
            gray = gray.mean(-1)
        des = self.descriptor.compute(
            gray, np.asarray(fd.xy), np.asarray(fd.size),
            np.asarray(fd.angle))
        return fd._replace(desc=des)


class FeatureTracker:
    """Detector + descriptor + matcher bundle."""

    def __init__(self, config: FeatureTrackerConfig):
        self.config = config
        self.num_features = config.num_features
        self.num_levels = config.num_levels
        self.scale_factor = config.scale_factor

        if config.detector_type in (FeatureDetectorTypes.ORB2, FeatureDetectorTypes.FAST):
            self.extractor = ORB2Extractor(
                num_features=config.num_features,
                num_levels=config.num_levels,
                scale_factor=config.scale_factor,
            )
            self.norm = NormType.HAMMING
        elif config.detector_type == FeatureDetectorTypes.SUPERPOINT:
            from pyslam_tpu.models.superpoint import SuperPointExtractor

            self.extractor = SuperPointExtractor(num_features=config.num_features)
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.XFEAT:
            from pyslam_tpu.models.xfeat import XFeatExtractor

            self.extractor = XFeatExtractor(num_features=config.num_features)
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.DISK:
            from pyslam_tpu.models.disk import DiskExtractor

            self.extractor = DiskExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.D2NET:
            from pyslam_tpu.models.d2net import D2NetExtractor

            self.extractor = D2NetExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.KEYNET:
            from pyslam_tpu.models.keynet import KeyNetExtractor

            self.extractor = KeyNetExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"),
                descriptor=config.descriptor_type.name
                if config.descriptor_type.name in ("HARDNET", "SOSNET",
                                                   "L2NET", "TFEAT")
                else "HARDNET")
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.ALIKED:
            from pyslam_tpu.models.aliked import AlikedExtractor

            self.extractor = AlikedExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.R2D2:
            from pyslam_tpu.models.r2d2 import R2D2Extractor

            self.extractor = R2D2Extractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.SHI_TOMASI:
            from pyslam_tpu.features.classical import ShiTomasiExtractor

            self.extractor = ShiTomasiExtractor(
                num_features=config.num_features)
            self.norm = NormType.L2
        elif config.detector_type in (FeatureDetectorTypes.SIFT,
                                      FeatureDetectorTypes.ROOT_SIFT):
            from pyslam_tpu.features.classical import CvSIFTExtractor

            self.extractor = CvSIFTExtractor(
                num_features=config.num_features,
                scale_factor=config.scale_factor,
                root_sift=config.detector_type == FeatureDetectorTypes.ROOT_SIFT,
            )
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.SURF:
            from pyslam_tpu.features.surf import SurfExtractor

            self.extractor = SurfExtractor(
                num_features=config.num_features)
            self.norm = NormType.L2
        elif config.detector_type in (FeatureDetectorTypes.KAZE,
                                      FeatureDetectorTypes.AKAZE):
            from pyslam_tpu.features.akaze import AkazeExtractor

            kaze = config.detector_type == FeatureDetectorTypes.KAZE
            self.extractor = AkazeExtractor(
                num_features=config.num_features,
                descriptor="KAZE" if kaze else "MLDB")
            self.norm = NormType.L2 if kaze else NormType.HAMMING
        elif config.detector_type == FeatureDetectorTypes.LFNET:
            from pyslam_tpu.models.lfnet import LFNetExtractor

            self.extractor = LFNetExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        elif config.detector_type == FeatureDetectorTypes.DELF:
            from pyslam_tpu.models.delf import DELFExtractor

            self.extractor = DELFExtractor(
                num_features=config.num_features,
                checkpoint=config.extra.get("checkpoint"))
            self.norm = NormType.L2
        else:
            raise ValueError(f"detector not supported: {config.detector_type}")

        # descriptor replacement: a patch network (HardNet/SOSNet/L2Net/
        # TFeat/GeoDesc/LogPolar) computed over the detector's oriented
        # keypoints (reference presets ORB2_HARDNET/.._SOSNET/.._L2NET,
        # feature_tracker_configs.py)
        from pyslam_tpu.features.types import PATCH_DESCRIPTOR_TYPES

        if (config.descriptor_type in PATCH_DESCRIPTOR_TYPES
                and config.detector_type != FeatureDetectorTypes.KEYNET):
            # (KeyNetExtractor computes its patch descriptors internally)
            self.extractor = _PatchDescribedExtractor(
                self.extractor, config.descriptor_type.name,
                checkpoint=config.extra.get("descriptor_checkpoint"))
            self.norm = NormType.L2
        elif config.descriptor_type == FeatureDescriptorTypes.CONTEXTDESC:
            self.extractor = _ContextDescribedExtractor(
                self.extractor,
                checkpoint=config.extra.get("descriptor_checkpoint"))
            self.norm = NormType.L2
        elif config.descriptor_type in (FeatureDescriptorTypes.BRISK,
                                        FeatureDescriptorTypes.FREAK,
                                        FeatureDescriptorTypes.BEBLID):
            from pyslam_tpu.features.binary_descriptors import (
                BinaryDescribedExtractor)

            self.extractor = BinaryDescribedExtractor(
                self.extractor, config.descriptor_type.name)
            self.norm = NormType.HAMMING

        info = FEATURE_INFO.get(config.descriptor_type)
        if config.tracker_type == FeatureTrackerTypes.LIGHTGLUE:
            mtype = FeatureMatcherTypes.LIGHTGLUE
        elif config.tracker_type == FeatureTrackerTypes.DES_NN:
            mtype = FeatureMatcherTypes.NN
        else:
            mtype = FeatureMatcherTypes.BF
        if mtype == FeatureMatcherTypes.LIGHTGLUE:
            self.matcher = feature_matcher_factory(
                norm=self.norm,
                matcher_type=mtype,
                input_dim=int(config.extra.get("desc_dim", 256)),
                checkpoint=config.extra.get("matcher_checkpoint"),
            )
        else:
            self.matcher = feature_matcher_factory(
                norm=self.norm,
                matcher_type=mtype,
                max_distance=info.max_distance if info else None,
                ratio_test=config.ratio_test,
            )
        self.scale_factors = self.extractor.scale_factors
        self.sigma2 = self.extractor.sigma2
        self.inv_sigma2 = 1.0 / self.sigma2

    # extraction ----------------------------------------------------------
    def detectAndCompute(self, img) -> FeatureData:
        return self.extractor(img)

    # matching ------------------------------------------------------------
    def match(self, f1: FeatureData, f2: FeatureData, ratio=None):
        """Match two FeatureData; returns (idx1, idx2) integer arrays."""
        if hasattr(self.matcher, "match_features"):
            idx2, _conf = self.matcher.match_features(f1, f2)
        else:
            idx2, dist = self.matcher.match(
                f1.desc, f2.desc, valid1=f1.valid, valid2=f2.valid, ratio=ratio
            )
            idx2 = np.asarray(idx2)
        idx1 = np.nonzero(idx2 >= 0)[0]
        return idx1, idx2[idx1]


class LkFeatureTracker(FeatureTracker):
    """Lucas-Kanade tracker (reference ``LkFeatureTracker`` at
    ``feature_tracker.py:202``): detect once, track keypoints frame-to-frame
    with pyramidal LK instead of descriptor matching."""

    def __init__(self, config: FeatureTrackerConfig):
        super().__init__(config)
        self._prev_img = None

    def track_lk(self, img0, img1, pts0):
        """(pts1, ok_mask, residuals) for (N,2) points from img0 to img1."""
        import jax.numpy as jnp

        from pyslam_tpu.ops import lk as lk_ops

        pts1, ok, res = lk_ops.lk_track_pyramidal(
            jnp.asarray(img0, jnp.float32),
            jnp.asarray(img1, jnp.float32),
            jnp.asarray(pts0, jnp.float32),
        )
        return np.asarray(pts1), np.asarray(ok), np.asarray(res)


class Mast3rFeatureTracker:
    """MASt3R dense tracker (reference ``feature_tracker.py:453``
    Mast3rFeatureTracker): keypoints are the most descriptor-confident
    pixels of the pointmap network; matching is descriptor reciprocal-NN.
    Exposes the standard detectAndCompute/match surface (descriptors are
    per-pixel, so single-image extraction works by pairing the image with
    itself) plus ``track_pair`` for true joint two-view inference."""

    def __init__(self, config: FeatureTrackerConfig):
        from pyslam_tpu.models.mast3r import Mast3rModel

        self.config = config
        self.num_features = config.num_features
        self.model = Mast3rModel(checkpoint=config.extra.get("checkpoint"))
        self.norm = NormType.L2
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2
        info = FEATURE_INFO[FeatureDescriptorTypes.MAST3R]
        self.matcher = feature_matcher_factory(
            norm=NormType.L2, matcher_type=FeatureMatcherTypes.BF,
            max_distance=info.max_distance, ratio_test=config.ratio_test)

    def detectAndCompute(self, img):
        import jax.numpy as jnp

        from pyslam_tpu.features.orb2 import FeatureData

        (_, _, d1, c1), _ = self.model.infer_pair(img, img)
        h_in, w_in = np.asarray(img).shape[:2]
        H, W = c1.shape
        n = self.num_features
        flat = np.argsort(-c1.reshape(-1))[:n]
        xy = np.zeros((n, 2), np.float32)
        desc = np.zeros((n, d1.shape[-1]), np.float32)
        valid = np.zeros((n,), bool)
        k = len(flat)
        # map net-resolution pixels back to input coordinates
        xy[:k, 0] = (flat % W) * (w_in / W)
        xy[:k, 1] = (flat // W) * (h_in / H)
        desc[:k] = d1.reshape(-1, d1.shape[-1])[flat]
        valid[:k] = True
        resp = np.zeros((n,), np.float32)
        resp[:k] = c1.reshape(-1)[flat]
        return FeatureData(
            xy=jnp.asarray(xy), level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=jnp.full((n,), 16.0, jnp.float32),
            response=jnp.asarray(resp), desc=jnp.asarray(desc),
            valid=jnp.asarray(valid))

    def match(self, f1, f2, ratio=None):
        idx2, _ = self.matcher.match(
            f1.desc, f2.desc, valid1=f1.valid, valid2=f2.valid, ratio=ratio)
        idx2 = np.asarray(idx2)
        idx1 = np.nonzero(idx2 >= 0)[0]
        return idx1, idx2[idx1]

    def track_pair(self, img1, img2):
        """Joint two-view dense matching; returns (xy1, xy2, scores) in
        each image's input pixel coordinates."""
        xy1, xy2, s = self.model.match_pair(img1, img2)
        h1, w1 = np.asarray(img1).shape[:2]
        h2, w2 = np.asarray(img2).shape[:2]
        Hn, Wn = self.model.cfg.img_hw
        xy1 = xy1 * np.array([w1 / Wn, h1 / Hn], np.float32)
        xy2 = xy2 * np.array([w2 / Wn, h2 / Hn], np.float32)
        return xy1, xy2, s


class LoftrFeatureTracker:
    """LoFTR dense tracker (reference ``feature_tracker.py:363``): no
    per-image descriptors; correspondences come from joint two-view
    inference (``track_pair``)."""

    def __init__(self, config: FeatureTrackerConfig):
        from pyslam_tpu.models.loftr import LoFTRConfig, LoFTRMatcher

        self.config = config
        self.num_features = config.num_features
        cfg = LoFTRConfig(max_matches=config.num_features,
                          img_hw=config.extra.get("img_hw", (480, 640)))
        self.matcher = LoFTRMatcher(
            cfg, checkpoint=config.extra.get("checkpoint"))
        self.norm = NormType.L2
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

    def track_pair(self, img1, img2):
        return self.matcher.match_pair(img1, img2)

    def detectAndCompute(self, img):
        raise NotImplementedError(
            "LoFTR is detector-free; use track_pair(img1, img2) — the "
            "reference LoftrFeatureTracker has the same restriction")


def feature_tracker_factory(config: FeatureTrackerConfig | str = "ORB2") -> FeatureTracker:
    if isinstance(config, str):
        config = FeatureTrackerConfigs.get(config)
    if config.tracker_type == FeatureTrackerTypes.LK:
        return LkFeatureTracker(config)
    if config.tracker_type == FeatureTrackerTypes.MAST3R:
        return Mast3rFeatureTracker(config)
    if config.tracker_type == FeatureTrackerTypes.LOFTR:
        return LoftrFeatureTracker(config)
    return FeatureTracker(config)
