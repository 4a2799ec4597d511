"""Fused stereo frame construction vs the legacy per-stage path."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene():
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType

    ds = SyntheticDataset(num_frames=3, sensor_type=SensorType.STEREO,
                          trajectory="line", step=0.4)
    from pyslam_tpu.slam.camera import PinholeCamera

    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * ds.baseline,
                        depth_threshold=20.0)
    return ds, cam


def test_fused_matches_legacy_stereo(scene):
    from pyslam_tpu.features.tracker import (FeatureTrackerConfig,
                                             FeatureTracker)
    from pyslam_tpu.slam.frame import Frame

    ds, cam = scene
    tracker = FeatureTracker(FeatureTrackerConfig(num_features=400,
                                                  num_levels=4))
    img, img_r = ds.getImage(0), ds.getImageRight(0)

    # fused path (default for undistorted cameras + ORB2)
    f_fused = Frame(cam, img, img_right=img_r, feature_tracker=tracker)
    assert f_fused._des_dev is not None

    # legacy path: force by hiding extract_stereo
    class _NoFused:
        def __init__(self, base):
            self._b = base
            self.scale_factors = base.scale_factors
            self.sigma2 = base.sigma2

        def __call__(self, im):
            return self._b(im)

    legacy_tracker = FeatureTracker(FeatureTrackerConfig(num_features=400,
                                                         num_levels=4))
    legacy_tracker.extractor = _NoFused(legacy_tracker.extractor)
    f_legacy = Frame(cam, img, img_right=img_r,
                     feature_tracker=legacy_tracker)

    # identical keypoints/descriptors (same extraction graph)
    assert np.allclose(np.asarray(f_fused.kps), np.asarray(f_legacy.kps),
                       atol=1e-4)
    assert (np.asarray(f_fused.des) == np.asarray(f_legacy.des)).all()

    # stereo association agreement: same matched set (up to the distance
    # matrix dtype), highly overlapping depths
    ok_f = f_fused.depths > 0
    ok_l = f_legacy.depths > 0
    both = ok_f & ok_l
    assert ok_f.sum() > 50
    agree = (ok_f == ok_l).mean()
    assert agree > 0.95, agree
    assert np.allclose(f_fused.depths[both], f_legacy.depths[both],
                       rtol=1e-3), \
        np.abs(f_fused.depths[both] - f_legacy.depths[both]).max()
    # depths consistent with the synthetic GT depth map
    gt = ds.getDepth(0)
    if gt is not None:
        xs = np.clip(np.round(np.asarray(f_fused.kps)[both, 0]).astype(int),
                     0, gt.shape[1] - 1)
        ys = np.clip(np.round(np.asarray(f_fused.kps)[both, 1]).astype(int),
                     0, gt.shape[0] - 1)
        rel = np.abs(f_fused.depths[both] - gt[ys, xs]) / gt[ys, xs]
        assert np.median(rel) < 0.1, np.median(rel)
