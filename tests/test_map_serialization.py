import os

import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.map_serialization import map_from_json, map_to_json
from pyslam_tpu.slam.slam import Slam


def build_small_slam(n_frames=12):
    ds = SyntheticDataset(num_frames=n_frames, sensor_type=SensorType.STEREO,
                          trajectory="line", step=0.4)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0)
    slam = Slam(cam, FeatureTrackerConfig(num_features=500, num_levels=3),
                sensor_type=SensorType.STEREO)
    for i in range(len(ds)):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    return slam, ds, cam


@pytest.mark.slow
def test_map_json_roundtrip(tmp_path):
    slam, ds, cam = build_small_slam()
    assert slam.map.num_keyframes() >= 2

    d = map_to_json(slam.map)
    m2 = map_from_json(d, slam.feature_tracker, cam)

    # structural equality
    assert m2.num_keyframes() == slam.map.num_keyframes()
    assert m2.num_points() == slam.map.num_points()
    assert m2.keyframe_order == slam.map.keyframe_order
    for kid in slam.map.keyframe_order:
        kf1 = slam.map.keyframes[kid]
        kf2 = m2.keyframes[kid]
        np.testing.assert_allclose(kf2.Tcw, kf1.Tcw, atol=1e-12)
        np.testing.assert_array_equal(kf2.points, kf1.points)
        np.testing.assert_array_equal(kf2.des, kf1.des)
        np.testing.assert_allclose(kf2.kps, kf1.kps, atol=1e-6)
        assert kf2.connected_keyframes == kf1.connected_keyframes
        assert kf2.parent == kf1.parent
    # observations reconstructed identically
    assert set(m2.observations.keys()) == set(slam.map.observations.keys())
    for pid in slam.map.observations:
        assert m2.observations[pid] == slam.map.observations[pid]
    # point payloads
    alive = slam.map.points.alive_ids()
    np.testing.assert_allclose(
        m2.points.pos[alive], slam.map.points.pos[alive], atol=1e-12
    )
    np.testing.assert_array_equal(m2.points.desc[alive], slam.map.points.desc[alive])


@pytest.mark.slow
def test_save_load_system_state_and_extend(tmp_path):
    """Save -> load -> the session relocalizes into the loaded map and
    continues (reference INIT_RELOCALIZE flow)."""
    slam, ds, cam = build_small_slam()
    n_kfs = slam.map.num_keyframes()
    state_dir = str(tmp_path / "state")
    slam.save_system_state(state_dir)
    assert os.path.exists(os.path.join(state_dir, "map.json"))
    assert os.path.exists(os.path.join(state_dir, "config_info.json"))

    slam2 = Slam(cam, FeatureTrackerConfig(num_features=500, num_levels=3),
                 loop_detector_config="DBOW3", sensor_type=SensorType.STEREO)
    slam2.load_system_state(state_dir)
    assert slam2.map.num_keyframes() == n_kfs
    assert slam2.tracking.state.name == "INIT_RELOCALIZE"

    # feed frames from inside the mapped region: must relocalize
    relocalized = False
    for i in range(3, 10):
        slam2.track(ds.getImage(i), img_right=ds.getImageRight(i),
                    frame_id=100 + i, timestamp=10.0 + ds.getTimestamp(i))
        if slam2.tracking.state.name == "OK":
            relocalized = True
            break
    assert relocalized, "failed to relocalize into the loaded map"
