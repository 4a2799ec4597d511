import numpy as np
import pytest

from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


def make_slam(ds, sensor_type, num_features=600):
    # depth_threshold: the synthetic scene's depth spread (4-40m) with a 20cm
    # baseline needs a KITTI-like close/far split (~20m), not the 40x-baseline
    # default
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=num_features, num_levels=4)
    return Slam(cam, cfg, sensor_type=sensor_type)


@pytest.mark.slow
def test_stereo_slam_synthetic():
    ds = SyntheticDataset(
        num_frames=30, sensor_type=SensorType.STEREO, trajectory="line", step=0.4
    )
    slam = make_slam(ds, SensorType.STEREO)
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    assert slam.map.num_keyframes() >= 2
    assert slam.map.num_points() > 100

    ts, poses = slam.get_final_trajectory()
    assert len(ts) > 25, f"only {len(ts)} tracked frames"
    est_p = poses[:, :3, 3]
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    gt_p = ds.poses[:, :3, 3]
    res = eval_ate(ts, est_p, gt_t, gt_p, align=True, with_scale=False)
    # 12m path; stereo SLAM should do much better than 2% drift
    assert res.rmse < 0.25, res


@pytest.mark.slow
def test_rgbd_slam_synthetic():
    ds = SyntheticDataset(
        num_frames=20, sensor_type=SensorType.RGBD, trajectory="line", step=0.3
    )
    slam = make_slam(ds, SensorType.RGBD)
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), depth=ds.getDepth(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    ts, poses = slam.get_final_trajectory()
    assert len(ts) > 15
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=False)
    assert res.rmse < 0.25, res


@pytest.mark.slow
def test_mono_slam_synthetic():
    # mono init needs parallax: several frames of forward motion accumulate
    # baseline before the essential-matrix bootstrap fires
    ds = SyntheticDataset(
        num_frames=30, sensor_type=SensorType.MONOCULAR, trajectory="line", step=0.4
    )
    slam = make_slam(ds, SensorType.MONOCULAR)
    for i in range(len(ds)):
        slam.track(ds.getImage(i), frame_id=i, timestamp=ds.getTimestamp(i))
    assert slam.map.num_keyframes() >= 2
    ts, poses = slam.get_final_trajectory()
    assert len(ts) > 12
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    # monocular: align with scale
    res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=True)
    assert res.rmse < 0.3, res


def test_dynamic_descriptor_threshold():
    from pyslam_tpu.slam.slam_dynamic_config import SLAMDynamicConfig, hamming_rows
    import numpy as np

    cfg = SLAMDynamicConfig(initial_th=64.0)
    # tight distance distribution -> threshold adapts downward
    rng = np.random.default_rng(0)
    for _ in range(30):
        cfg.update_descriptor_stats(rng.normal(12.0, 2.0, 200))
    assert 40.0 <= cfg.descriptor_distance_th < 50.0
    # bland scene: wide distances -> relaxes (but clamped to 1.5x initial)
    for _ in range(30):
        cfg.update_descriptor_stats(rng.normal(80.0, 10.0, 200))
    assert cfg.descriptor_distance_th <= 96.0 + 1e-6
    assert cfg.descriptor_distance_th > 64.0

    a = np.zeros((4, 256), np.int8)
    b = a.copy()
    b[0, :7] = 1
    assert hamming_rows(a, b).tolist() == [7, 0, 0, 0]
