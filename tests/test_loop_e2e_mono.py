"""Monocular loop-closure e2e: the scale-drift case Sim3 exists for.

The reference corrects monocular loops with a 7-DoF Sim3 (scale included,
pySLAM ``loop_closing.py:195-470``, ``optimizer_g2o.py`` Sim3 vertex with
``fix_scale=False`` for mono); this asserts the full pipeline — DBoW3-style
detection, Sim3 geometry check with scale, correction propagation,
essential-graph PGO — closes a synthetic mono loop and repairs the drift.
"""

import numpy as np
import pytest

from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


@pytest.mark.slow
def test_mono_slam_loop_closure_sim3_scale():
    ds = SyntheticDataset(
        num_frames=175, sensor_type=SensorType.MONOCULAR,
        trajectory="loop", period=160,
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=0.0, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=800, num_levels=4)
    slam = Slam(cam, cfg, loop_detector_config="DBOW3",
                sensor_type=SensorType.MONOCULAR)
    assert slam.loop_closing is not None

    for i in range(len(ds)):
        slam.track(ds.getImage(i), frame_id=i, timestamp=ds.getTimestamp(i))

    assert slam.loop_closing.num_loops_closed >= 1, "mono loop not closed"
    ts, poses = slam.get_final_trajectory()
    assert len(ts) > 140, f"only {len(ts)} tracked frames"
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    # mono is scale-free: Sim3 (with_scale) alignment for ATE
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3],
                   with_scale=True)
    assert res.rmse < 0.6, res
