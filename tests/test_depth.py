import numpy as np
import pytest

from pyslam_tpu.depth_estimation.depth_estimator import (
    DepthEstimatorType,
    depth_estimator_factory,
)
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera


def test_sgm_on_synthetic_stereo():
    """SGM disparity vs the renderer's true depths."""
    ds = SyntheticDataset(num_frames=1, sensor_type=SensorType.STEREO)
    # RGBD variant of the same pose for GT depth
    ds_gt = SyntheticDataset(num_frames=1, sensor_type=SensorType.RGBD)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        bf=ds.fx * ds.baseline)
    est = depth_estimator_factory(DepthEstimatorType.DEPTH_SGBM, camera=cam,
                                  max_depth=45.0)
    depth, pts3d = est.infer(ds.getImage(0), ds.getImageRight(0))
    gt = np.asarray(ds_gt.getDepth(0))
    ok = (depth > 0) & (gt > 0) & (gt < 20.0)  # close range where bf/d resolves
    assert ok.mean() > 0.05, f"too few valid depths ({ok.mean():.3f})"
    rel_err = np.abs(depth[ok] - gt[ok]) / gt[ok]
    # median relative error under 15% on close structure
    assert np.median(rel_err) < 0.15, np.median(rel_err)
    assert pts3d.shape == depth.shape + (3,)


def test_depth_anything_graph_runs(rng):
    cam = PinholeCamera(128, 96, 100, 100, 64, 48)
    est = depth_estimator_factory(DepthEstimatorType.DEPTH_ANYTHING_V2, camera=cam)
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    depth, pts = est.infer(img)
    assert depth.shape == (96, 128)
    assert np.isfinite(depth).all()
