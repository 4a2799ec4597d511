"""StageTimings + timings surface on the SLAM facade."""

import time

import numpy as np


def test_stage_timings():
    from pyslam_tpu.utils.profiling import StageTimings

    t = StageTimings("test")
    for _ in range(3):
        with t.stage("a"):
            time.sleep(0.01)
    with t.stage("b"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert rep["a"]["avg_ms"] >= 8.0
    assert rep["a"]["fps"] > 0
    assert "a=" in t.summary() and "[test]" in t.summary()


def test_slam_timings_surface():
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    ds = SyntheticDataset(num_frames=8, sensor_type=SensorType.STEREO,
                          trajectory="line", step=0.4)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * ds.baseline,
                        depth_threshold=20.0)
    slam = Slam(cam, FeatureTrackerConfig(num_features=400, num_levels=4),
                sensor_type=SensorType.STEREO)
    for i in range(6):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    tm = slam.timings()
    assert "tracking" in tm and "local_mapping" in tm
    assert "frame" in tm["tracking"]
    assert tm["tracking"]["frame"]["avg_ms"] > 0
    s = slam.timings_summary()
    assert "[tracking]" in s
