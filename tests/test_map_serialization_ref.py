"""Reference-schema map.json interop (pySLAM ``map.py:945`` Map.to_json).

Round-trips a real SLAM-built map through the reference's cross-core JSON
schema and checks the emitted field names against the reference's per-class
layouts (``frame.py:657``, ``keyframe.py:78,373``, ``map_point.py:411``,
``camera.py:323``, ``slam.py:334-398``).
"""

import json

import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.map_serialization_ref import (
    b64json_to_np,
    map_from_reference_json,
    map_to_reference_json,
    np_to_b64json,
    np_to_rawjson,
    rawjson_to_np,
)
from pyslam_tpu.slam.slam import Slam

# field layouts straight from the reference source
REF_FRAME_FIELDS = {
    "id", "timestamp", "img_id", "pose", "camera", "is_keyframe",
    "median_depth", "fov_center_c", "fov_center_w", "is_blurry",
    "laplacian_var", "kps", "kps_r", "kpsu", "kpsn", "kps_sem", "octaves",
    "octaves_r", "sizes", "angles", "des", "des_r", "depths", "kps_ur",
    "points", "outliers", "kf_ref", "img", "depth_img", "img_right",
    "semantic_img", "semantic_instances_img", "mask", "mask_right",
}
REF_KEYFRAME_EXTRA_FIELDS = {
    "kid", "_is_bad", "lba_count", "to_be_erased", "_pose_Tcp",
    "is_Tcw_GBA_valid", "loop_query_id", "num_loop_words", "loop_score",
    "reloc_query_id", "num_reloc_words", "reloc_score", "GBA_kf_id",
    "Tcw_GBA", "Tcw_before_GBA",
}
REF_GRAPH_FIELDS = {
    "parent", "children", "loop_edges", "init_parent", "not_to_erase",
    "connected_keyframes_weights", "ordered_keyframes_weights",
    "is_first_connection",
}
REF_POINT_FIELDS = {
    "id", "_observations", "_frame_views", "_is_bad", "_num_observations",
    "num_times_visible", "num_times_found", "last_frame_id_seen", "pt",
    "color", "semantic_des", "semantic_color", "des", "_min_distance",
    "_max_distance", "normal", "first_kid", "kf_ref",
}
REF_MAP_FIELDS = {
    "FrameBase._id", "MapPointBase._id", "frames", "keyframes", "points",
    "keyframe_origins", "max_frame_id", "max_point_id", "max_keyframe_id",
    "viewer_scale",
}


@pytest.fixture(scope="module")
def built_slam():
    ds = SyntheticDataset(
        num_frames=12, sensor_type=SensorType.RGBD, trajectory="line",
        step=0.4,
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    slam = Slam(
        cam, FeatureTrackerConfig(num_features=400, num_levels=4),
        sensor_type=SensorType.RGBD,
    )
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), depth=ds.getDepth(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    slam.finish()
    assert slam.map.num_keyframes() >= 2
    return slam


def test_encodings_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 3)).astype(np.float32)
    np.testing.assert_array_equal(b64json_to_np(np_to_b64json(a)), a)
    b = rng.integers(0, 255, (5, 32)).astype(np.uint8)
    np.testing.assert_array_equal(rawjson_to_np(np_to_rawjson(b)), b)
    d = np_to_b64json(a)
    assert d["type"] == "npB64" and set(d) >= {"dtype", "shape", "data", "order"}
    r = np_to_rawjson(b)
    assert r["type"] == "npRaw" and isinstance(r["data"], list)


def test_reference_schema_field_names(built_slam):
    d = map_to_reference_json(
        built_slam.map, built_slam.camera, sensor_type=SensorType.RGBD
    )
    # wrapper (slam.py:334-398)
    assert set(d) >= {
        "USE_CPP_CORE", "sensor_type", "map", "feature_tracker_config",
        "loop_detector_config", "semantic_mapping_config",
    }
    body = d["map"]
    assert set(body) == REF_MAP_FIELDS
    kf = body["keyframes"][0]
    want = REF_FRAME_FIELDS | REF_KEYFRAME_EXTRA_FIELDS | REF_GRAPH_FIELDS
    missing = want - set(kf)
    assert not missing, f"keyframe json missing reference fields: {missing}"
    pt = body["points"][0]
    assert set(pt) == REF_POINT_FIELDS
    cam = kf["camera"]
    assert set(cam) >= {
        "type", "width", "height", "fx", "fy", "cx", "cy", "D", "fps", "bf",
        "b", "depth_factor", "depth_threshold", "is_distorted", "u_min",
        "u_max", "v_min", "v_max", "initialized", "K", "Kinv",
    }
    # must survive plain json (no numpy leakage)
    json.dumps(d)


def test_reference_schema_roundtrip(built_slam):
    m0 = built_slam.map
    d = json.loads(json.dumps(map_to_reference_json(
        m0, built_slam.camera, sensor_type=SensorType.RGBD)))
    m1 = map_from_reference_json(
        d, built_slam.feature_tracker, built_slam.camera
    )

    assert m1.num_keyframes() == m0.num_keyframes()
    assert m1.num_points() == m0.num_points()
    assert m1.keyframe_order == m0.keyframe_order

    for kid in m0.keyframe_order:
        k0, k1 = m0.keyframes[kid], m1.keyframes[kid]
        assert k1.id == k0.id
        np.testing.assert_allclose(k1.Tcw, k0.Tcw, atol=1e-9)
        np.testing.assert_allclose(k1.kps, k0.kps, atol=1e-6)
        np.testing.assert_array_equal(k1.levels, k0.levels)
        np.testing.assert_array_equal(k1.des, k0.des)
        np.testing.assert_array_equal(k1.points, k0.points)
        np.testing.assert_allclose(k1.depths, k0.depths, atol=1e-6)
        assert k1.parent == k0.parent
        assert k1.children == k0.children
        assert k1.connected_keyframes == k0.connected_keyframes

    st0, st1 = m0.points, m1.points
    alive0 = st0.alive_ids()
    np.testing.assert_array_equal(st1.alive_ids(), alive0)
    np.testing.assert_allclose(st1.pos[alive0], st0.pos[alive0], atol=1e-9)
    np.testing.assert_array_equal(st1.desc[alive0], st0.desc[alive0])
    np.testing.assert_allclose(st1.normal[alive0], st0.normal[alive0],
                               atol=1e-6)
    np.testing.assert_array_equal(st1.num_obs[alive0], st0.num_obs[alive0])
    assert m1.observations == m0.observations


def test_save_load_reference_schema(built_slam, tmp_path):
    """Slam.save_system_state(schema='reference') -> load auto-detects."""
    p = str(tmp_path / "refmap")
    built_slam.save_system_state(p, schema="reference")
    with open(f"{p}/map.json") as f:
        raw = json.load(f)
    assert "map" in raw and "keyframes" in raw["map"]

    slam2 = Slam(
        built_slam.camera, FeatureTrackerConfig(num_features=400, num_levels=4),
        sensor_type=SensorType.RGBD,
    )
    slam2.load_system_state(p)
    assert slam2.map.num_keyframes() == built_slam.map.num_keyframes()
    assert slam2.map.num_points() == built_slam.map.num_points()
    from pyslam_tpu.slam.tracking import TrackingState

    assert slam2.state == TrackingState.INIT_RELOCALIZE
