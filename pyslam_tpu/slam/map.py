"""Global map: SoA map-point store + keyframe registry + covisibility.

Design departure from the reference (pySLAM ``pyslam/slam/map.py:94-1270``,
``map_point.py``): map points are rows of capacity-doubling numpy arrays
(positions, descriptors, normals, scale-invariance distances, statistics)
rather than Python objects; observations are host dicts {pid: {kid: kp_idx}}.
Jitted consumers (projection matching, BA) receive compacted array slices —
the SoA layout means "build a BA problem" is pure fancy-indexing, no object
traversal.  Single-threaded host orchestration removes the reference's
``update_lock`` RLock requirement.
"""

from __future__ import annotations

import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.slam.frame import Frame, KeyFrame


class MapPointStorage:
    """Capacity-doubling SoA store for map points."""

    def __init__(self, capacity: int | None = None):
        cap = capacity or Parameters.kMapPointCapacityInitial
        self._alloc(cap)
        self.size = 0  # high-water mark (ids are never reused)

    def _alloc(self, cap):
        self.capacity = cap
        self.pos = np.zeros((cap, 3), np.float64)
        self.desc = np.zeros((cap, 256), np.int8)
        self.normal = np.zeros((cap, 3), np.float32)
        self.min_dist = np.zeros((cap,), np.float32)
        self.max_dist = np.full((cap,), np.inf, np.float32)
        self.valid = np.zeros((cap,), bool)       # alive (not culled/replaced)
        self.n_visible = np.zeros((cap,), np.int32)
        self.n_found = np.zeros((cap,), np.int32)
        self.first_kid = np.full((cap,), -1, np.int32)
        self.num_obs = np.zeros((cap,), np.int32)
        self.replaced_by = np.full((cap,), -1, np.int64)
        self.ref_level = np.zeros((cap,), np.int32)

    def _grow(self):
        old = self.__dict__.copy()
        # 4x growth: every capacity step recompiles the store-indexed fused
        # tracking graph, so take few, large steps (HBM cost is trivial —
        # ~70 B/row)
        cap = self.capacity * 4
        self._alloc(cap)
        self.ensure_desc_layout(old["desc"])  # keep adopted (dim, dtype)
        for name in ("pos", "desc", "normal", "min_dist", "max_dist", "valid",
                     "n_visible", "n_found", "first_kid", "num_obs",
                     "replaced_by", "ref_level"):
            getattr(self, name)[: old["capacity"]] = old[name]
        self.size = old["size"]

    def ensure_desc_layout(self, des: np.ndarray):
        """Adopt the session descriptor layout (dim, dtype) on first use.

        ORB2 stores 256 unpacked bits as int8; learned/SIFT descriptors are
        float32 of varying dim.  The store allocates the default binary
        layout and re-allocates once if the first written descriptors
        differ (only ever happens before any point exists)."""
        dim, dtype = des.shape[1], des.dtype
        if self.desc.shape[1] != dim or self.desc.dtype != dtype:
            self.desc = np.zeros((self.capacity, dim), dtype)

    def new_points(self, n: int) -> np.ndarray:
        while self.size + n > self.capacity:
            self._grow()
        ids = np.arange(self.size, self.size + n)
        self.size += n
        return ids

    def alive_ids(self) -> np.ndarray:
        return np.nonzero(self.valid[: self.size])[0]


class Map:
    def __init__(self):
        self.points = MapPointStorage()
        self.keyframes: dict[int, KeyFrame] = {}       # kid -> KeyFrame
        self.keyframe_order: list[int] = []            # insertion order
        # bumped on every point-store mutation: device-resident caches of
        # the store (Tracking.track_fused) key on it
        self.store_version = 0
        # observations: pid -> {kid: kp_idx} (authoritative store; a native
        # C++ mirror accelerates covisibility counting when the toolchain is
        # available — see pyslam_tpu.native)
        self.observations: dict[int, dict[int, int]] = {}
        # callbacks fired on delete_point(pid)/replace_point(old,new) so
        # sidecar per-point stores (semantic accumulators, embeddings) can
        # prune/merge; signature cb(old_pid, new_pid_or_None)
        self.point_removal_listeners: list = []
        self.max_frame_id = 0
        self.max_keyframe_id = 0
        # per-map kid counter: keyframe ids must be sequential WITHIN a map
        # (kid deltas drive freshness/culling logic), so assignment lives
        # here, not on a process-global class attribute
        self.next_kid = 0
        self._dev_store = None   # see device_store()
        self._native = None
        try:
            from pyslam_tpu.native import NativeObsGraph

            self._native = NativeObsGraph()
        except Exception:
            self._native = None

    def device_store(self):
        """Device-resident copy of the point-store arrays
        (pos f32, desc, normal, min_dist, max_dist-sanitized, valid),
        re-uploaded only when ``store_version`` changes.  Shared by the fused
        tracking step AND the back-end's fuse stage so the ~capacity*0.3 kB
        payload crosses the tunnel once per keyframe, not once per consumer."""
        import jax.numpy as jnp

        st = self.points
        key = (self.store_version, st.capacity, st.desc.shape[1],
               str(st.desc.dtype))
        if self._dev_store is None or self._dev_store[0] != key:
            self._dev_store = (key, (
                jnp.asarray(st.pos.astype(np.float32)),
                jnp.asarray(st.desc),
                jnp.asarray(st.normal),
                jnp.asarray(st.min_dist),
                jnp.asarray(np.where(np.isfinite(st.max_dist),
                                     st.max_dist, 1.0).astype(np.float32)),
                jnp.asarray(st.valid),
            ))
        return self._dev_store[1]

    # ------------------------------------------------------------ keyframes
    def add_keyframe(self, kf: KeyFrame):
        if kf.kid is None:
            kf.kid = self.next_kid
        self.next_kid = max(self.next_kid, kf.kid + 1)
        self.keyframes[kf.kid] = kf
        self.keyframe_order.append(kf.kid)
        self.max_keyframe_id = max(self.max_keyframe_id, kf.kid)

    def remove_keyframe(self, kf: KeyFrame):
        """Cull a keyframe: drop its observations, fix spanning tree."""
        if kf.kid not in self.keyframes:
            return
        for kp_idx, pid in enumerate(kf.points):
            if pid >= 0:
                self.remove_observation(int(pid), kf.kid)
        kf.points[:] = -1
        # detach from covisibility
        for other_kid in list(kf.connected_keyframes.keys()):
            other = self.keyframes.get(other_kid)
            if other is not None:
                other.erase_connection(kf.kid)
        # re-parent children to kf's parent
        for child_kid in list(kf.children):
            child = self.keyframes.get(child_kid)
            if child is not None:
                child.parent = kf.parent
                if kf.parent is not None and kf.parent in self.keyframes:
                    self.keyframes[kf.parent].children.add(child_kid)
        if kf.parent is not None and kf.parent in self.keyframes:
            self.keyframes[kf.parent].children.discard(kf.kid)
        kf.is_bad = True
        kf.drop_device_cache()   # free its HBM-resident arrays
        del self.keyframes[kf.kid]
        self.keyframe_order.remove(kf.kid)

    def num_keyframes(self) -> int:
        return len(self.keyframes)

    def last_keyframe(self) -> KeyFrame | None:
        return self.keyframes[self.keyframe_order[-1]] if self.keyframe_order else None

    # --------------------------------------------------------- observations
    def add_observation(self, pid: int, kf: KeyFrame, kp_idx: int):
        obs = self.observations.setdefault(pid, {})
        if kf.kid in obs:
            return
        obs[kf.kid] = int(kp_idx)
        kf.points[kp_idx] = pid
        self.points.num_obs[pid] = len(obs)
        if self._native is not None:
            self._native.add_observation(int(pid), int(kf.kid), int(kp_idx))

    def remove_observation(self, pid: int, kid: int):
        obs = self.observations.get(pid)
        if obs is None or kid not in obs:
            return
        kp_idx = obs.pop(kid)
        if self._native is not None:
            self._native.remove_observation(int(pid), int(kid))
        kf = self.keyframes.get(kid)
        if kf is not None and 0 <= kp_idx < len(kf.points) and kf.points[kp_idx] == pid:
            kf.points[kp_idx] = -1
        self.points.num_obs[pid] = len(obs)
        if len(obs) <= (1 if self._is_stereo_point(pid) else 1):
            # a point with <=1 observation left is dead weight
            if len(obs) == 0:
                self.delete_point(pid)

    def _is_stereo_point(self, pid) -> bool:
        return False  # refined later; culling uses num_obs thresholds

    def delete_point(self, pid: int):
        self.store_version += 1
        if self._native is not None:
            self._native.remove_point(int(pid))
        obs = self.observations.pop(pid, {})
        for kid, kp_idx in obs.items():
            kf = self.keyframes.get(kid)
            if kf is not None and kf.points[kp_idx] == pid:
                kf.points[kp_idx] = -1
        self.points.valid[pid] = False
        for cb in self.point_removal_listeners:
            cb(int(pid), None)

    def replace_point(self, old_pid: int, new_pid: int):
        """MapPoint.replace_with semantics (reference map_point.py): rebind all
        observations of old to new, merge stats."""
        if old_pid == new_pid:
            return
        self.store_version += 1
        obs_old = self.observations.pop(old_pid, {})
        if self._native is not None:
            self._native.remove_point(int(old_pid))
        st = self.points
        for kid, kp_idx in obs_old.items():
            kf = self.keyframes.get(kid)
            if kf is None:
                continue
            obs_new = self.observations.setdefault(new_pid, {})
            if kid in obs_new:
                # keyframe already sees the new point: drop the duplicate slot
                if kf.points[kp_idx] == old_pid:
                    kf.points[kp_idx] = -1
            else:
                obs_new[kid] = kp_idx
                kf.points[kp_idx] = new_pid
                if self._native is not None:
                    self._native.add_observation(int(new_pid), int(kid), int(kp_idx))
        st.n_visible[new_pid] += st.n_visible[old_pid]
        st.n_found[new_pid] += st.n_found[old_pid]
        st.num_obs[new_pid] = len(self.observations.get(new_pid, {}))
        st.replaced_by[old_pid] = new_pid
        st.valid[old_pid] = False
        for cb in self.point_removal_listeners:
            cb(int(old_pid), int(new_pid))

    def resolve_replacements(self, pids: np.ndarray) -> np.ndarray:
        """Follow replaced_by chains (bounded) for an id array."""
        out = np.asarray(pids).copy()
        for _ in range(4):
            rb = self.points.replaced_by[np.clip(out, 0, self.points.size - 1)]
            mask = (out >= 0) & (rb >= 0)
            if not mask.any():
                break
            out[mask] = rb[mask]
        return out

    # --------------------------------------------------------------- points
    def add_points_for_keyframe(
        self,
        kf: KeyFrame,
        kp_idxs: np.ndarray,
        positions: np.ndarray,
        kf2: KeyFrame | None = None,
        kp_idxs2: np.ndarray | None = None,
    ) -> np.ndarray:
        """Create new map points observed by kf (and optionally kf2)."""
        n = len(kp_idxs)
        if n == 0:
            return np.zeros(0, np.int64)
        self.store_version += 1
        pids = self.points.new_points(n)
        st = self.points
        st.ensure_desc_layout(kf.des)
        st.pos[pids] = positions
        st.valid[pids] = True
        st.first_kid[pids] = kf.kid
        st.desc[pids] = kf.des[kp_idxs]
        st.ref_level[pids] = kf.levels[kp_idxs]
        self._init_point_geometry(pids, kf, kp_idxs)
        for j, (pid, ki) in enumerate(zip(pids, kp_idxs)):
            self.add_observation(int(pid), kf, int(ki))
            if kf2 is not None and kp_idxs2 is not None:
                self.add_observation(int(pid), kf2, int(kp_idxs2[j]))
        st.n_visible[pids] = 1
        st.n_found[pids] = 1
        return pids

    def _init_point_geometry(self, pids, kf: KeyFrame, kp_idxs):
        st = self.points
        d = st.pos[pids] - kf.Ow[None, :]
        dist = np.linalg.norm(d, axis=1)
        st.normal[pids] = (d / np.maximum(dist[:, None], 1e-9)).astype(np.float32)
        levels = kf.levels[kp_idxs]
        sf = kf.feature_tracker.scale_factors
        level_scale = sf[levels]
        n_levels = len(sf)
        st.max_dist[pids] = (dist * level_scale).astype(np.float32)
        st.min_dist[pids] = (
            st.max_dist[pids] / sf[n_levels - 1]
        ).astype(np.float32)

    def update_point_descriptors_and_normals(self, pids):
        """Recompute best descriptor (min-median-distance, reference
        map_point.py best-descriptor update) and mean viewing direction."""
        self.store_version += 1
        st = self.points
        for pid in np.atleast_1d(pids):
            pid = int(pid)
            obs = self.observations.get(pid)
            if not obs or not st.valid[pid]:
                continue
            descs, dirs, dists, levels, sfs = [], [], [], [], None
            for kid, kp_idx in obs.items():
                kf = self.keyframes.get(kid)
                if kf is None:
                    continue
                descs.append(kf.des[kp_idx])
                v = st.pos[pid] - kf.Ow
                nv = np.linalg.norm(v)
                dirs.append(v / max(nv, 1e-9))
                dists.append(nv)
                levels.append(kf.levels[kp_idx])
                sfs = kf.feature_tracker.scale_factors
            if not descs:
                continue
            D = np.stack(descs)
            if len(descs) > 2:
                # tiny (n_obs x n_obs) distance matrix: HOST numpy — a device
                # dispatch per map point would dominate local mapping time
                if np.issubdtype(D.dtype, np.floating):
                    diff = D[:, None, :] - D[None, :, :]
                    dm = np.sqrt((diff * diff).sum(-1))
                else:
                    dd = D.astype(np.int16)
                    dm = np.abs(dd[:, None, :] - dd[None, :, :]).sum(-1)
                best = int(np.argmin(np.median(dm, axis=1)))
            else:
                best = 0
            st.desc[pid] = D[best]
            st.normal[pid] = np.mean(dirs, axis=0)
            n = np.linalg.norm(st.normal[pid])
            if n > 1e-9:
                st.normal[pid] /= n
            # scale-invariance range from the reference observation
            ref_kid = min(obs.keys())
            ref_kf = self.keyframes.get(ref_kid)
            if ref_kf is not None and sfs is not None:
                kp_idx = obs[ref_kid]
                dist = np.linalg.norm(st.pos[pid] - ref_kf.Ow)
                level = ref_kf.levels[kp_idx]
                st.max_dist[pid] = dist * sfs[level]
                st.min_dist[pid] = st.max_dist[pid] / sfs[-1]

    # --------------------------------------------------------- covisibility
    def update_connections(self, kf: KeyFrame, min_weight: int | None = None):
        """Rebuild kf's covisibility edges from shared map points (reference
        ``keyframe.py update_connections``; weight >= 15 shared points)."""
        if min_weight is None:
            min_weight = Parameters.kMinNumOfCovisiblePointsForCreatingConnection
        pids = kf.points[kf.points >= 0]
        if self._native is not None:
            counter = self._native.covisibility_counts(
                np.asarray(pids, np.int64), exclude_kid=int(kf.kid)
            )
        else:
            counter = {}
            for pid in pids:
                obs = self.observations.get(int(pid))
                if not obs:
                    continue
                for kid in obs.keys():
                    if kid != kf.kid:
                        counter[kid] = counter.get(kid, 0) + 1
        if not counter:
            return
        best_kid = max(counter, key=counter.get)
        kept = {k: w for k, w in counter.items() if w >= min_weight}
        if not kept:
            kept = {best_kid: counter[best_kid]}
        kf.connected_keyframes = kept
        kf._reorder()
        for kid, w in kept.items():
            other = self.keyframes.get(kid)
            if other is not None:
                other.add_connection(kf.kid, w)
        # spanning tree: first connection becomes parent
        if kf.parent is None and kf.kid != self.keyframe_order[0]:
            kf.parent = best_kid
            self.keyframes[best_kid].children.add(kf.kid)

    def get_local_keyframes(self, kf: KeyFrame, max_n: int | None = None) -> list[int]:
        max_n = max_n or Parameters.kMaxNumOfKeyframesInLocalMap
        out = [kf.kid] + kf.ordered_covisibles(max_n)
        return out[:max_n]

    def get_local_map_points(self, kids: list[int]) -> np.ndarray:
        pids: set[int] = set()
        for kid in kids:
            kf = self.keyframes.get(kid)
            if kf is None:
                continue
            pids.update(int(p) for p in kf.points[kf.points >= 0])
        alive = [p for p in pids if self.points.valid[p]]
        return np.asarray(sorted(alive), np.int64)

    # ------------------------------------------------------------ statistics
    def num_points(self) -> int:
        return int(self.points.valid[: self.points.size].sum())
