import numpy as np
import pytest

from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


@pytest.mark.slow
def test_rgbd_slam_loop_closure():
    """Circular trajectory with exact revisit: the loop detector must fire and
    the Sim3 correction + essential-graph PGO + GBA must repair the drift."""
    ds = SyntheticDataset(
        num_frames=175, sensor_type=SensorType.RGBD, trajectory="loop", period=160
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * 0.2, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=800, num_levels=4)
    slam = Slam(cam, cfg, loop_detector_config="DBOW3",
                sensor_type=SensorType.RGBD)
    assert slam.loop_closing is not None

    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), depth=ds.getDepth(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )

    assert slam.loop_closing.num_loops_closed >= 1, "loop was not detected/closed"
    ts, poses = slam.get_final_trajectory()
    assert len(ts) > 150, f"only {len(ts)} tracked frames"
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=False)
    assert res.rmse < 0.6, res


@pytest.mark.slow
def test_stereo_slam_full_circle_robustness():
    """Stereo on the full circle: tracking must survive all 160 frames with
    bounded drift (stereo depth noise at 20-40m makes the loop geometry check
    marginal on this renderer, so only robustness/drift are asserted)."""
    ds = SyntheticDataset(
        num_frames=160, sensor_type=SensorType.STEREO, trajectory="loop"
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=600, num_levels=4)
    slam = Slam(cam, cfg, loop_detector_config="DBOW3",
                sensor_type=SensorType.STEREO)
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    ts, poses = slam.get_final_trajectory()
    assert len(ts) >= 155, f"only {len(ts)} tracked frames"
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=False)
    # 75m path around the circle; <2.5% drift without loop closure
    assert res.rmse < 1.8, res
