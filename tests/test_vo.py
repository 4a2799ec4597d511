import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig, feature_tracker_factory
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.io.ground_truth import GroundTruth, groundtruth_factory
from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.visual_odometry import VisualOdometry


@pytest.mark.slow
def test_vo_on_synthetic_sequence():
    ds = SyntheticDataset(
        num_frames=20, sensor_type=SensorType.MONOCULAR, trajectory="line", step=0.4
    )
    gt = groundtruth_factory({"type": "synthetic", "dataset": ds})
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy, fps=10.0)
    tracker = feature_tracker_factory(
        FeatureTrackerConfig(num_features=600, num_levels=4)
    )
    vo = VisualOdometry(cam, tracker, groundtruth=gt)
    for i in range(len(ds)):
        vo.track(ds.getImage(i), i, ds.getTimestamp(i))
        assert vo.num_matches > 20 or i == 0, f"frame {i}: {vo.num_matches} matches"

    est_p = vo.trajectory
    gt_p = gt.positions[: len(est_p)]
    ts = np.asarray(vo.timestamps)
    res = eval_ate(ts, est_p, gt.timestamps, gt_p, align=True, with_scale=False)
    # forward motion of 0.4m/frame x 19 frames = 7.6m path; VO should stay
    # well under 5% drift on this clean synthetic scene
    assert res.rmse < 0.4, res
