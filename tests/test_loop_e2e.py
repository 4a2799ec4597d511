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
def test_stereo_slam_loop_closure():
    """Stereo circle WITH a true revisit tail (period < num_frames, like the
    RGBD loop test): the detector must fire, the Sim3 geometry check must
    ACCEPT at the revisit keyframes (6-DoF, fixed scale), and the correction
    + PGO must repair the drift.

    Diagnosed in round 4: with ``period == num_frames`` the circle never
    actually revisits the start, so every detector candidate pairs views
    from ACROSS the circle — there stereo depth noise at 20-40 m times the
    multi-meter viewpoint baseline legitimately defeats Sim3 verification
    (a GT-pose oracle scored ~0/60 of those matches as true).  The reference
    closes loops on real revisits; so must we.  The Sim3 RANSAC samples
    minimal sets weighted by inverse depth-variance (1/z^4), which is what
    lifts the true-revisit inlier count over the acceptance gate with noisy
    far stereo points in the pool."""
    ds = SyntheticDataset(
        num_frames=175, period=160, sensor_type=SensorType.STEREO,
        trajectory="loop",
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
    slam.finish()
    assert slam.loop_closing.num_loops_closed >= 1, (
        "stereo loop was not detected/closed"
    )
    ts, poses = slam.get_final_trajectory()
    assert len(ts) >= 168, f"only {len(ts)} tracked frames"
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=False)
    # 75m path; drift repaired by the loop correction (0.68 measured)
    assert res.rmse < 1.2, res
