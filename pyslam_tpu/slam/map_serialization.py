"""Map JSON serialization (reference: pySLAM single-file ``map.json``,
``pyslam/slam/map.py:973`` Map.to_json/from_json and the per-class
``frame_serialization_*`` C++ twins).

Schema: keyframes carry poses + keypoint arrays + packed descriptors (base64)
+ per-slot point ids; map points carry positions/normals/ranges; observations
are reconstructed from keyframe slots on load.  Descriptors are packed from
bit-planes to uint8x32 at this boundary only.
"""

from __future__ import annotations

import base64

import numpy as np

from pyslam_tpu.slam.frame import Frame, KeyFrame
from pyslam_tpu.slam.map import Map


def _b64(arr: np.ndarray) -> dict:
    return {
        "dtype": str(arr.dtype),
        "shape": list(arr.shape),
        "data": base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode(),
    }


def _unb64(d: dict) -> np.ndarray:
    return np.frombuffer(
        base64.b64decode(d["data"]), dtype=np.dtype(d["dtype"])
    ).reshape(d["shape"]).copy()


def _desc_to_json(des: np.ndarray, key: str = "desc") -> dict:
    """Binary descriptors (int8 unpacked bits) -> bit-packed b64 (compact,
    matches the original schema); float descriptors -> raw b64."""
    if np.issubdtype(des.dtype, np.floating):
        return {f"{key}_float": _b64(des.astype(np.float32))}
    return {f"{key}_packed": _b64(np.packbits(des.astype(np.uint8), axis=1))}


def _desc_from_json(d: dict, key: str = "desc") -> np.ndarray:
    if f"{key}_float" in d:
        return _unb64(d[f"{key}_float"])
    return np.unpackbits(_unb64(d[f"{key}_packed"]), axis=1).astype(np.int8)


def map_to_json(m: Map) -> dict:
    st = m.points
    alive = st.alive_ids()
    points = {
        "ids": _b64(alive.astype(np.int64)),
        "pos": _b64(st.pos[alive]),
        **_desc_to_json(st.desc[alive]),
        "normal": _b64(st.normal[alive]),
        "min_dist": _b64(st.min_dist[alive]),
        "max_dist": _b64(st.max_dist[alive]),
        "num_obs": _b64(st.num_obs[alive]),
        "first_kid": _b64(st.first_kid[alive]),
    }
    keyframes = []
    for kid in m.keyframe_order:
        kf = m.keyframes[kid]
        keyframes.append(
            {
                "kid": kf.kid,
                "id": kf.id,
                "timestamp": kf.timestamp,
                "Tcw": kf.Tcw.reshape(-1).tolist(),
                "kps": _b64(kf.kps),
                "levels": _b64(kf.levels),
                "angles": _b64(kf.angles),
                **_desc_to_json(kf.des, key="des"),
                "valid": _b64(kf.valid),
                "points": _b64(kf.points),
                "kps_ur": _b64(kf.kps_ur),
                "depths": _b64(kf.depths),
                "parent": kf.parent,
                "children": sorted(kf.children),
                "loop_edges": sorted(kf.loop_edges),
                "connected": kf.connected_keyframes,
            }
        )
    return {
        "format": "pyslam_tpu_map_v1",
        "points": points,
        "keyframes": keyframes,
        "max_point_id": int(st.size),
    }


def map_from_json(d: dict, feature_tracker, camera) -> Map:
    m = Map()
    st = m.points
    ids = _unb64(d["points"]["ids"])
    if len(ids) > 0:
        needed = int(ids.max()) + 1
        while st.capacity < needed:
            st._grow()
        st.size = max(st.size, needed)
        st.pos[ids] = _unb64(d["points"]["pos"])
        desc = _desc_from_json(d["points"])
        st.ensure_desc_layout(desc)
        st.desc[ids] = desc
        st.normal[ids] = _unb64(d["points"]["normal"])
        st.min_dist[ids] = _unb64(d["points"]["min_dist"])
        st.max_dist[ids] = _unb64(d["points"]["max_dist"])
        st.num_obs[ids] = _unb64(d["points"]["num_obs"])
        st.first_kid[ids] = _unb64(d["points"]["first_kid"])
        st.valid[ids] = True

    max_kid = -1
    max_fid = -1
    for kfd in d["keyframes"]:
        f = Frame.__new__(Frame)
        f.id = kfd["id"]
        f.camera = camera
        f.timestamp = kfd["timestamp"]
        f.Tcw = np.asarray(kfd["Tcw"], np.float64).reshape(4, 4)
        f.feature_tracker = feature_tracker
        f.kps = _unb64(kfd["kps"])
        f.kps_raw = f.kps
        f.levels = _unb64(kfd["levels"])
        f.angles = _unb64(kfd["angles"])
        f.sizes = np.zeros(len(f.kps), np.float32)
        f.des = _desc_from_json(kfd, key="des")
        f.valid = _unb64(kfd["valid"])
        f.num_kps = len(f.kps)
        f.points = _unb64(kfd["points"])
        f.outliers = np.zeros(f.num_kps, bool)
        f.kps_ur = _unb64(kfd["kps_ur"])
        f.depths = _unb64(kfd["depths"])
        f.is_keyframe = True
        kf = KeyFrame(f, kid=kfd["kid"])
        kf.parent = kfd.get("parent")
        kf.children = set(kfd.get("children", []))
        kf.loop_edges = set(kfd.get("loop_edges", []))
        kf.connected_keyframes = {
            int(k): int(v) for k, v in kfd.get("connected", {}).items()
        }
        kf._reorder()
        m.add_keyframe(kf)
        max_kid = max(max_kid, kf.kid)
        max_fid = max(max_fid, kf.id)
        # rebuild observations from slots (keep the native mirror in sync)
        for kp_idx in np.nonzero(kf.points >= 0)[0]:
            pid = int(kf.points[kp_idx])
            if pid < st.size and st.valid[pid]:
                m.observations.setdefault(pid, {})[kf.kid] = int(kp_idx)
                if m._native is not None:
                    m._native.add_observation(pid, int(kf.kid), int(kp_idx))
            else:
                kf.points[kp_idx] = -1
    for pid, obs in m.observations.items():
        st.num_obs[pid] = len(obs)

    m.next_kid = max(m.next_kid, max_kid + 1)
    Frame._id_counter = max(Frame._id_counter, max_fid + 1)
    return m
