"""Tracking front-end: the per-frame state machine.

Reference: pySLAM ``pyslam/slam/tracking.py:1082-1449`` (``Tracking.track``)
and its helpers ``track_previous_frame`` (:351), ``track_reference_frame``
(:480), ``track_local_map`` (:670), ``need_new_keyframe`` (:761).  The state
machine (NO_IMAGES_YET -> NOT_INITIALIZED -> OK/LOST/RELOCALIZE) stays host
Python; every numeric stage — projection search, descriptor matching,
motion-only pose LM — is a jitted batched op from ``pyslam_tpu.ops``.

Per frame, OK path:
  1. motion-model pose prediction
  2. search_frame_by_projection against the previous frame's tracked points
     (fallback: full descriptor match against the reference keyframe)
  3. pose_optimization #1 (4x10 LM with outlier reclassification)
  4. track_local_map: project the covisibility-local map, match, pose opt #2
  5. keyframe decision + creation (stereo/RGBD: spawn close points)
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.ops import optim, slam_matching
from pyslam_tpu.slam.frame import Frame, KeyFrame
from pyslam_tpu.slam.initializer import Initializer
from pyslam_tpu.slam.map import Map
from pyslam_tpu.slam.motion_model import MotionModel
from pyslam_tpu.utils.logging import Printer
from pyslam_tpu.utils.padding import (
    cap_select,
    pad_fixed,
    pad_rows,
    pow2,
)


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3
    RELOCALIZE = 4
    INIT_RELOCALIZE = 5


class TrackingHistory:
    """Relative-pose history for final trajectory reconstruction (reference
    ``tracking.py:130`` TrackingHistory)."""

    def __init__(self):
        self.timestamps: list[float] = []
        self.relative_poses: list[np.ndarray] = []  # Tcr: frame rel. to ref KF
        self.ref_kids: list[int] = []
        self.states: list[TrackingState] = []

    def add(self, timestamp, Tcw, ref_kf: KeyFrame, state):
        Tcr = np.asarray(Tcw) @ ref_kf.Twc
        self.timestamps.append(timestamp)
        self.relative_poses.append(Tcr)
        self.ref_kids.append(ref_kf.kid)
        self.states.append(state)

    def final_trajectory(self, slam_map: Map):
        """Recompose absolute poses using (possibly loop-corrected) KF poses."""
        out_t, out_Twc = [], []
        for ts, Tcr, kid, st in zip(
            self.timestamps, self.relative_poses, self.ref_kids, self.states
        ):
            kf = slam_map.keyframes.get(kid)
            if kf is None or st not in (TrackingState.OK,):
                continue
            Tcw = Tcr @ kf.Tcw
            out_t.append(ts)
            out_Twc.append(np.linalg.inv(Tcw))
        return np.asarray(out_t), np.asarray(out_Twc)


class Tracking:
    def __init__(
        self,
        camera,
        feature_tracker,
        slam_map: Map,
        sensor_type: SensorType = SensorType.MONOCULAR,
        local_mapping=None,
    ):
        self.camera = camera
        self.tracker = feature_tracker
        self.map = slam_map
        self.sensor_type = sensor_type
        self.local_mapping = local_mapping
        self.state = TrackingState.NO_IMAGES_YET
        self.initializer = Initializer(sensor_type, feature_tracker.num_features)
        self.motion_model = MotionModel()
        self.history = TrackingHistory()

        self.f_prev: Frame | None = None
        self.kf_ref: KeyFrame | None = None
        self.num_matched_kps = 0
        self.num_inliers = 0
        self.num_lost_frames = 0
        self.last_kf_frame_id = -1
        self.relocalizer = None  # injected by Slam when loop detection is on
        self.reset_requested = False
        # pipelined frame loop: invoked once right after the fused tracking
        # dispatch, BEFORE its readback — Slam uses it to dispatch the NEXT
        # frame's extraction so it overlaps this frame's readback + host work
        self.on_fused_dispatched = None

        # per-stage moving-average timers (reference tracking.py:220-228
        # named timers; surfaced via Slam.timings / SlamPlotDrawer)
        from pyslam_tpu.utils.profiling import StageTimings

        self.timings = StageTimings("tracking")
        # device-resident point-store cache (track_fused): re-uploaded only
        # when Map.store_version changes (keyframe-granularity mutations)
        self._store_cache = None
        # cached device handles of per-frame-constant fused-graph args
        self._const_cache = None
        # 2-frames-in-flight pipeline state: the dispatched-but-unharvested
        # frame {frame, out, timestamp, harvested} and the most recent fused
        # output buffer (the chain base for the next dispatch)
        self._pending: dict | None = None
        self._last_fused_out = None

        # MAD-adaptive descriptor-distance gate (reference SLAMDynamicConfig)
        from pyslam_tpu.slam.slam_dynamic_config import SLAMDynamicConfig

        self.dyn_config = (
            SLAMDynamicConfig() if Parameters.kUseDynamicDesDistanceTh else None
        )

        self._ib = np.array(
            [camera.u_min, camera.u_max, camera.v_min, camera.v_max], np.float32
        )
        # session-fixed shape caps (TPU policy: one compile per graph for the
        # life of the run — see utils/padding.py): per-frame observation /
        # prev-point axes are bounded by the keypoint budget; the local-map
        # axis is capped and subsampled by observation count when exceeded
        self._cap_kps = pow2(feature_tracker.num_features)
        self._cap_map = pow2(Parameters.kTrackLocalMapMaxPoints)

    def prewarm(self):
        """Compile the LEGACY fallback graphs at the session's fixed shapes.

        The fused OK-path graphs compile naturally during the first tracked
        frames, but the fallback chain (``track_previous_frame`` /
        ``track_reference_frame`` / ``track_local_map`` + standalone pose
        optimization) only runs on motion-model breaks or relocalization —
        without prewarming, its first use pays a multi-second XLA compile in
        the middle of the session (round-3 bench: a 7.6 s ``track_prev``
        stage average caused entirely by one post-warmup compile).
        Hamming-descriptor sessions only (the production default layout).
        """
        from pyslam_tpu.features.types import NormType
        from pyslam_tpu.ops import hamming, matching as m_ops

        if getattr(self.tracker, "norm", None) != NormType.HAMMING:
            return
        import jax

        N = self.tracker.num_features
        L = len(self.tracker.scale_factors)
        rng = np.random.default_rng(0)
        des = jnp.asarray(rng.integers(0, 2, (N, 256)).astype(np.int8))
        kps = jnp.asarray(rng.uniform(10, 200, (N, 2)).astype(np.float32))
        levels = jnp.zeros((N,), jnp.int32)
        kvalid = jnp.ones((N,), bool)
        ur = jnp.full((N,), -1.0, jnp.float32)
        Tcw = jnp.asarray(np.eye(4, dtype=np.float32))
        K = jnp.asarray(self.camera.K, jnp.float32)
        ib = jnp.asarray(self._ib)
        sf = jnp.asarray(self.tracker.scale_factors)
        outs = []
        for m in {self._cap_kps, self._cap_map}:
            pts = jnp.asarray(rng.uniform(-5, 5, (m, 3)).astype(np.float32))
            outs.append(slam_matching.search_by_projection(
                pts, jnp.asarray(rng.integers(0, 2, (m, 256)).astype(np.int8)),
                jnp.asarray(np.tile([0, 0, 1.0], (m, 1)).astype(np.float32)),
                jnp.full((m,), 0.1, jnp.float32),
                jnp.full((m,), 50.0, jnp.float32), jnp.ones((m,), bool),
                kps, levels, des, kvalid, ur, Tcw, K, ib, sf,
                float(Parameters.kMaxReprojectionDistanceFrame),
                float(self.desc_dist_th), ratio=0.9,
            )[1])
        outs.append(optim.pose_optimization(
            Tcw,
            jnp.asarray(rng.uniform(-5, 5, (self._cap_kps, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 200, (self._cap_kps, 2)).astype(np.float32)),
            jnp.full((self._cap_kps,), -1.0, jnp.float32),
            jnp.ones((self._cap_kps,), jnp.float32),
            jnp.ones((self._cap_kps,), bool),
            K, bf=self.camera.bf,
        )[0])
        # track_reference_frame graphs
        d = hamming.descriptor_distance_matrix(des, des).astype(jnp.float32)
        outs.append(m_ops.match_ratio_test(
            d, Parameters.kMaxDescriptorDistance, ratio=0.7,
            valid_a=kvalid, valid_b=kvalid,
        )[0])
        ang, ok = pad_fixed(np.zeros(10, np.float32), self._cap_kps)
        outs.append(m_ops.rotation_histogram_filter(
            jnp.asarray(ang), jnp.asarray(pad_rows(np.zeros(10, np.float32),
                                                   len(ok))), jnp.asarray(ok),
        ))
        jax.block_until_ready(outs)

    @property
    def desc_dist_th(self) -> float:
        if self.dyn_config is not None:
            return self.dyn_config.descriptor_distance_th
        return float(Parameters.kMaxOrbDistanceSearchByReproj)

    # ------------------------------------------------------------ utilities
    def _pose_optimize(self, frame: Frame, pids: np.ndarray, kp_idxs: np.ndarray):
        """Motion-only LM on frame's current assignment; updates outliers."""
        st = self.map.points
        # pad the observation set to the session keypoint cap: ONE jit
        # specialization for the life of the run (obs count <= num kps)
        pts3d, valid = pad_fixed(st.pos[pids], self._cap_kps)
        m = len(valid)
        uv = pad_rows(frame.kps[kp_idxs], m)
        ur = pad_rows(frame.kps_ur[kp_idxs], m, fill=-1.0)
        sigma2 = pad_rows(frame.sigma2_for(kp_idxs), m, fill=1.0)
        T_opt, inliers, n_inl = optim.pose_optimization(
            jnp.asarray(frame.Tcw, jnp.float32),
            jnp.asarray(pts3d, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(ur, jnp.float32),
            jnp.asarray(sigma2, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(self.camera.K, jnp.float32),
            bf=self.camera.bf,
        )
        T_opt = np.asarray(T_opt)
        if not np.isfinite(T_opt).all():
            # diverged LM (degenerate geometry in f32): keep the predicted
            # pose and report zero inliers instead of poisoning the map
            return 0
        inliers = np.asarray(inliers)[: len(pids)]
        n_inl = int(inliers.sum())
        frame.update_pose(T_opt)
        frame.outliers[kp_idxs] = ~inliers
        # drop outlier assignments (reference clears f.points on outliers)
        bad = kp_idxs[~inliers]
        frame.points[bad] = -1
        return int(n_inl)

    def _assigned(self, frame: Frame):
        kp_idxs = np.nonzero(frame.points >= 0)[0]
        return frame.points[kp_idxs], kp_idxs

    # ------------------------------------------------ track vs previous frame
    def track_previous_frame(self, f_prev: Frame, f_cur: Frame) -> int:
        """Project prev-frame points into cur with widening radius (reference
        ``tracking.py:351-476``)."""
        pids_prev, kp_prev = self._assigned(f_prev)
        if len(pids_prev) == 0:
            return 0
        pids_prev = self.map.resolve_replacements(pids_prev)
        alive = (pids_prev >= 0) & self.map.points.valid[np.clip(pids_prev, 0, None)]
        pids_prev = pids_prev[alive]
        if len(pids_prev) == 0:
            return 0
        st = self.map.points
        pos_p, valid_p = pad_fixed(st.pos[pids_prev], self._cap_kps)
        m = len(valid_p)

        for radius in (
            Parameters.kMaxReprojectionDistanceFrame,
            Parameters.kMaxReprojectionDistanceFrameWide,
        ):
            idx_pt, kp_match, _ = slam_matching.search_by_projection(
                jnp.asarray(pos_p, jnp.float32),
                jnp.asarray(pad_rows(st.desc[pids_prev], m)),
                jnp.asarray(pad_rows(st.normal[pids_prev], m)),
                jnp.asarray(pad_rows(st.min_dist[pids_prev], m)),
                jnp.asarray(pad_rows(st.max_dist[pids_prev], m, fill=1.0)),
                jnp.asarray(valid_p),
                jnp.asarray(f_cur.kps), jnp.asarray(f_cur.levels),
                jnp.asarray(f_cur.des), jnp.asarray(f_cur.valid),
                jnp.asarray(f_cur.kps_ur),
                jnp.asarray(f_cur.Tcw, jnp.float32),
                jnp.asarray(self.camera.K, jnp.float32),
                jnp.asarray(self._ib),
                jnp.asarray(self.tracker.scale_factors),
                float(radius),
                float(self.desc_dist_th),
                ratio=0.9,
            )
            kp_match = np.asarray(kp_match)
            matched_kps = np.nonzero((kp_match >= 0) & (kp_match < len(pids_prev)))[0]
            if len(matched_kps) >= Parameters.kMinNumMatchedFeaturesSearchFrameByProjection:
                break

        f_cur.points[:] = -1
        f_cur.points[matched_kps] = pids_prev[kp_match[matched_kps]]
        return len(matched_kps)

    # ---------------------------------------------- track vs reference keyframe
    def track_reference_frame(self, kf: KeyFrame, f_cur: Frame) -> int:
        """Full descriptor match + map-point propagation (reference
        ``tracking.py:480-643``)."""
        from pyslam_tpu.ops import hamming, matching as m_ops

        d = hamming.descriptor_distance_matrix(
            jnp.asarray(kf.des), jnp.asarray(f_cur.des)
        ).astype(jnp.float32)
        kf_has_point = jnp.asarray((kf.points >= 0) & kf.valid)
        idx2, _ = m_ops.match_ratio_test(
            d, Parameters.kMaxDescriptorDistance, ratio=0.7,
            valid_a=kf_has_point, valid_b=jnp.asarray(f_cur.valid),
        )
        idx2 = np.asarray(idx2)
        i_kf = np.nonzero(idx2 >= 0)[0]
        i_cur = idx2[i_kf]
        if Parameters.kCheckOrientation and len(i_kf) > 0:
            from pyslam_tpu.ops import matching as mm

            # fixed-shape dispatch: matched count <= keypoint budget, so pad
            # to the session cap (one compile per session on TPU)
            ang_a, ok = pad_fixed(kf.angles[i_kf], self._cap_kps)
            ang_b = pad_rows(f_cur.angles[i_cur], len(ok))
            keep = np.asarray(
                mm.rotation_histogram_filter(
                    jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(ok),
                )
            )[: len(i_kf)]
            i_kf, i_cur = i_kf[keep], i_cur[keep]
        pids = self.map.resolve_replacements(kf.points[i_kf])
        alive = (pids >= 0) & self.map.points.valid[np.clip(pids, 0, None)]
        f_cur.points[:] = -1
        f_cur.points[i_cur[alive]] = pids[alive]
        f_cur.update_pose(self.f_prev.Tcw if self.f_prev is not None else kf.Tcw)
        return int(alive.sum())

    # --------------------------------------------------------- track local map
    def track_local_map(self, f_cur: Frame) -> int:
        if self.kf_ref is None:
            return 0
        kids = self.map.get_local_keyframes(self.kf_ref)
        local_pids = self.map.get_local_map_points(kids)
        if len(local_pids) == 0:
            return 0
        st = self.map.points
        local_pids = cap_select(
            local_pids, self._cap_map, score=st.num_obs[local_pids]
        )
        # count visible stats
        st.n_visible[local_pids] += 1

        pos_p, valid_p = pad_fixed(st.pos[local_pids], self._cap_map)
        m = len(valid_p)
        idx_pt, kp_match, _ = slam_matching.search_by_projection(
            jnp.asarray(pos_p, jnp.float32),
            jnp.asarray(pad_rows(st.desc[local_pids], m)),
            jnp.asarray(pad_rows(st.normal[local_pids], m)),
            jnp.asarray(pad_rows(st.min_dist[local_pids], m)),
            jnp.asarray(pad_rows(st.max_dist[local_pids], m, fill=1.0)),
            jnp.asarray(valid_p),
            jnp.asarray(f_cur.kps), jnp.asarray(f_cur.levels),
            jnp.asarray(f_cur.des), jnp.asarray(f_cur.valid),
            jnp.asarray(f_cur.kps_ur),
            jnp.asarray(f_cur.Tcw, jnp.float32),
            jnp.asarray(self.camera.K, jnp.float32),
            jnp.asarray(self._ib),
            jnp.asarray(self.tracker.scale_factors),
            float(Parameters.kMaxReprojectionDistanceMap),
            float(self.desc_dist_th),
            ratio=Parameters.kMatchRatioTestMap,
        )
        kp_match = np.asarray(kp_match)
        in_range = (kp_match >= 0) & (kp_match < len(local_pids))
        new_kps = np.nonzero(in_range & (f_cur.points < 0))[0]
        f_cur.points[new_kps] = local_pids[kp_match[new_kps]]

        pids, kp_idxs = self._assigned(f_cur)
        if len(pids) < Parameters.kMinTrackedFeaturesForPoseOpt:
            return 0
        n_inl = self._pose_optimize(f_cur, pids, kp_idxs)
        # found statistics
        good_pids, good_kps = self._assigned(f_cur)
        st.n_found[good_pids] += 1
        # adapt the descriptor gate to this frame's accepted matches
        if self.dyn_config is not None and len(good_pids) >= 10:
            from pyslam_tpu.slam.slam_dynamic_config import hamming_rows

            d = hamming_rows(st.desc[good_pids], f_cur.des[good_kps])
            self.dyn_config.update_descriptor_stats(d)
        return n_inl

    # ------------------------------------------------------ fused OK path
    def _device_store(self, st):
        """Device copies of the point-store arrays — the Map-owned cache
        (``Map.device_store``), invalidated by ``store_version``; a swapped
        Map (reset / load_system_state) carries its own empty cache so stale
        arrays can never leak across maps."""
        return self.map.device_store()

    def _dev_consts(self) -> dict:
        """Device handles for the per-frame-CONSTANT fused-tracking args.

        On the remote-attached TPU every jnp.asarray argument enqueues a
        host->device transfer with per-argument marshalling cost; the depth-1
        path paid ~10 of those per frame for values that never change.  The
        cache is keyed on the Parameter values so a mid-session flag mutation
        still takes effect (one rebuild)."""
        key = (
            float(Parameters.kMaxReprojectionDistanceFrame),
            float(Parameters.kMaxReprojectionDistanceFrameWide),
            float(Parameters.kMaxReprojectionDistanceMap),
            float(Parameters.kMatchRatioTestMap),
        )
        if self._const_cache is None or self._const_cache[0] != key:
            self._const_cache = (key, dict(
                K=jnp.asarray(self.camera.K, jnp.float32),
                ib=jnp.asarray(self._ib),
                sf=jnp.asarray(self.tracker.scale_factors),
                sigma2=jnp.asarray(self.tracker.sigma2, jnp.float32),
                bf=jnp.asarray(self.camera.bf, jnp.float32),
                rf=jnp.asarray(key[0], jnp.float32),
                rfw=jnp.asarray(key[1], jnp.float32),
                rm=jnp.asarray(key[2], jnp.float32),
                ratio=jnp.asarray(key[3], jnp.float32),
            ))
        return self._const_cache[1]

    def _local_map_rows(self, count_visible: bool = True):
        """(local_pids, padded idx_map) for the fused graphs, or None."""
        st = self.map.points
        kids = self.map.get_local_keyframes(self.kf_ref)
        local_pids = self.map.get_local_map_points(kids)
        if len(local_pids) == 0:
            return None
        local_pids = cap_select(
            local_pids, self._cap_map, score=st.num_obs[local_pids]
        )
        if count_visible:
            st.n_visible[local_pids] += 1
        idx_map, _ = pad_fixed(
            local_pids.astype(np.int32), self._cap_map, fill=-1
        )
        return local_pids, idx_map

    def _fused_dispatch(self, f_prev: Frame, f_cur: Frame):
        """DISPATCH half of the depth-1 fused step: build the index payloads
        from f_prev's host assignments and launch the graph.  Returns the
        device output handle or None when prerequisites are missing."""
        from pyslam_tpu.ops.fused_tracking import (
            track_frame_fused_indexed,
            track_frame_fused_meta,
        )

        st = self.map.points
        pids_prev, _ = self._assigned(f_prev)
        if len(pids_prev) == 0 or self.kf_ref is None:
            return None
        pids_prev = self.map.resolve_replacements(pids_prev)
        pids_prev = pids_prev[
            (pids_prev >= 0) & st.valid[np.clip(pids_prev, 0, None)]
        ]
        lm = self._local_map_rows()
        if len(pids_prev) < 10 or lm is None:
            return None
        local_pids, idx_map = lm

        idx_prev, _ = pad_fixed(
            pids_prev.astype(np.int32), self._cap_kps, fill=-1
        )
        store = self._device_store(st)
        c = self._dev_consts()
        shared_args = (
            jnp.asarray(idx_prev), jnp.asarray(idx_map),
            jnp.asarray(f_cur.Tcw, jnp.float32),
            c["K"], c["ib"], c["sf"], c["sigma2"], c["bf"],
            c["rf"], c["rfw"], c["rm"],
            jnp.asarray(self.desc_dist_th, jnp.float32),
            c["ratio"],
        )
        min_prev = Parameters.kMinNumMatchedFeaturesSearchFrameByProjection
        deferred = (
            getattr(f_cur, "_meta_dev", None) is not None
            and not f_cur.host_ready
        )
        from pyslam_tpu.utils.profiling import device_counters

        device_counters.dispatches += 1
        if deferred:
            out_dev = track_frame_fused_meta(
                f_cur._meta_dev, f_cur._des_dev, *store, *shared_args,
                min_prev_matches=min_prev,
            )
        else:
            out_dev = track_frame_fused_indexed(
                jnp.asarray(f_cur.kps), jnp.asarray(f_cur.levels),
                f_cur._des_dev
                if f_cur._des_dev is not None
                else jnp.asarray(f_cur.des),
                jnp.asarray(f_cur.valid),
                jnp.asarray(f_cur.kps_ur),
                *store, *shared_args,
                min_prev_matches=min_prev,
            )
        return out_dev

    def _dispatch_chained(self, f_cur: Frame, prev_out,
                          count_visible: bool = True):
        """Dispatch frame f_cur's tracking CHAINED on the previous frame's
        device output (2-frames-in-flight pipeline): pose prediction and the
        previous tracked set are both read from ``prev_out`` in-graph, so no
        host value of frame N-1 is needed at dispatch time."""
        from pyslam_tpu.ops.fused_tracking import track_frame_fused_chained

        lm = self._local_map_rows(count_visible=count_visible)
        if lm is None or f_cur._meta_dev is None:
            return None
        _, idx_map = lm
        store = self._device_store(self.map.points)
        c = self._dev_consts()
        from pyslam_tpu.utils.profiling import device_counters

        device_counters.dispatches += 1
        return track_frame_fused_chained(
            f_cur._meta_dev, f_cur._des_dev, prev_out,
            *store,
            jnp.asarray(idx_map),
            jnp.asarray(
                self.motion_model.velocity().astype(np.float32)
            ),
            c["K"], c["ib"], c["sf"], c["sigma2"], c["bf"],
            c["rf"], c["rfw"], c["rm"],
            jnp.asarray(self.desc_dist_th, jnp.float32),
            c["ratio"],
            min_prev_matches=(
                Parameters.kMinNumMatchedFeaturesSearchFrameByProjection),
            cap_prev=self._cap_kps,
        )

    def _fused_harvest(self, f_cur: Frame, out_dev):
        """HARVEST half: one packed device->host readback; unpack pose,
        resolved store rows (absolute map-point ids), inliers, match
        distances (and, for a deferred frame, its extraction meta riding in
        the same buffer).  Returns (n_prev, n_inl1, n_inl2) or None when the
        pose diverged."""
        from pyslam_tpu.utils.profiling import device_counters

        device_counters.readbacks += 1
        out = np.asarray(out_dev)
        N = f_cur.num_kps
        if len(out) > 3 * N + 19:
            f_cur.adopt_meta(out[3 * N + 19:].reshape(N, 9))
            out = out[: 3 * N + 19]
        elif not f_cur.host_ready:
            f_cur.ensure_host()
        T2 = out[:16].reshape(4, 4).astype(np.float64)
        n_prev, n_inl1, n_inl2 = (int(x) for x in out[16:19])
        if not np.isfinite(T2).all():
            return None

        st = self.map.points
        pid_rows = out[19 : 19 + N].astype(np.int64)
        inlier = out[19 + N : 19 + 2 * N] > 0
        match_dist = out[19 + 2 * N : 19 + 3 * N]
        f_cur.points[:] = -1
        # rows are absolute store rows resolved in-graph; re-check liveness
        # on host (a row can be culled/replaced between dispatch and harvest)
        ok = (pid_rows >= 0) & st.valid[np.clip(pid_rows, 0, None)]
        f_cur.points[ok] = pid_rows[ok]
        f_cur.outliers[:] = False
        f_cur.outliers[ok & ~inlier] = True
        f_cur.points[ok & ~inlier] = -1
        f_cur.update_pose(T2)

        good_pids, good_kps = self._assigned(f_cur)
        st.n_found[good_pids] += 1
        # adapt the descriptor gate to this frame's accepted matches using
        # the match distances computed IN-GRAPH (no descriptor transfer)
        if self.dyn_config is not None:
            d = match_dist[ok & inlier]
            self.dyn_config.update_descriptor_stats(d)
        return n_prev, n_inl1, n_inl2

    def track_fused(self, f_prev: Frame, f_cur: Frame):
        """One-dispatch tracking step (ops/fused_tracking.py): projection
        search vs prev + pose opt #1 + local-map search + pose opt #2 in a
        single jitted graph — ~8 device round trips collapse to 1 dispatch +
        1 readback.  A deferred-extraction frame (pipelined loop) feeds its
        device meta/descriptor handles straight into the graph; its host
        fields are unpacked from the SAME readback.  Returns
        (n_prev_matches, n_inl1, n_inl2) or None when prerequisites are
        missing (caller falls back to the legacy path)."""
        out_dev = self._fused_dispatch(f_prev, f_cur)
        if out_dev is None:
            return None
        # pipelined loop: enqueue the next frame's extraction behind this
        # dispatch so it computes while the host handles this readback
        if self.on_fused_dispatched is not None:
            cb, self.on_fused_dispatched = self.on_fused_dispatched, None
            cb()
        # keep the device buffer alive: it is the chain base for the
        # 2-frames-in-flight pipeline (next call dispatches against it)
        self._last_fused_out = out_dev
        return self._fused_harvest(f_cur, out_dev)

    # ----------------------------------------------------- keyframe decision
    def need_new_keyframe(self, f_cur: Frame) -> bool:
        """ORB-SLAM-style conditions (reference ``tracking.py:761-916``)."""
        if self.kf_ref is None:
            return False
        num_kfs = self.map.num_keyframes()
        frames_since_kf = f_cur.id - self.last_kf_frame_id

        # reference-KF tracked count with >=min_obs observations
        min_obs = 3 if num_kfs > 2 else 2
        ref_pids = self.kf_ref.points[self.kf_ref.points >= 0]
        ref_matches = int(
            (self.map.points.num_obs[ref_pids] >= min_obs).sum()
        ) if len(ref_pids) else 0
        # degenerate right after stereo/RGBD init: every point has ONE
        # observation, so the min_obs count is 0 and the ratio clause can
        # never fire; fall back to the KF's raw association count so the
        # second keyframe can spawn before tracking starves
        if ref_matches == 0:
            ref_matches = len(ref_pids)

        is_stereo = self.sensor_type in (SensorType.STEREO, SensorType.RGBD)
        # close-point bookkeeping (stereo/RGBD); the reference's absolute
        # thresholds (100 tracked / 70 non-tracked, tuned for 2000 features)
        # scale with the configured feature budget
        feat_scale = self.tracker.num_features / 2000.0
        n_tracked_close = 0
        n_nontracked_close = 0
        if is_stereo:
            close = (f_cur.depths > 0) & (
                f_cur.depths < self.camera.depth_threshold
            )
            tracked = (f_cur.points >= 0) & ~f_cur.outliers
            n_tracked_close = int((close & tracked).sum())
            n_nontracked_close = int((close & ~tracked).sum())
        need_close = is_stereo and (
            n_tracked_close
            < Parameters.kNumMinTrackedClosePointsForNewKfNonMonocular
            * feat_scale
            and n_nontracked_close
            > Parameters.kNumMaxNonTrackedClosePointsForNewKfNonMonocular
            * feat_scale
        )

        th_ratio = (
            Parameters.kThNewKfRefRatioStereo if is_stereo else Parameters.kThNewKfRefRatio
        )
        if num_kfs < 3:
            th_ratio = 0.4

        idle = self._local_mapping_idle()
        cond1a = frames_since_kf >= Parameters.kNumMaxFramesBetweenKfs
        cond1b = frames_since_kf >= Parameters.kNumMinFramesBetweenKfs and idle
        cond1c = is_stereo and (
            self.num_inliers
            < ref_matches * Parameters.kThNewKfRefRatioNonMonocular
            or need_close
        )
        cond2 = (
            self.num_inliers < ref_matches * th_ratio or need_close
        ) and self.num_inliers > Parameters.kNumMinPointsForNewKf

        if Parameters.kLogKeyFrameDecision:
            Printer.gray(
                f"[kf?] f={f_cur.id} inl={self.num_inliers} "
                f"ref={ref_matches} close(t/nt)={n_tracked_close}/"
                f"{n_nontracked_close} need_close={need_close} "
                f"1a={cond1a} 1b={cond1b}(idle={idle}) 1c={cond1c} "
                f"2={cond2} since={frames_since_kf}"
            )
        if not ((cond1a or cond1b or cond1c) and cond2):
            return False
        if idle:
            return True
        # back-end busy: interrupt its LBA and insert anyway while the queue
        # is short (reference tracking.py:906-916, ORB-SLAM NeedNewKeyFrame:
        # stereo/RGBD keyframes must NOT wait for the mapping thread — on a
        # fast-moving stream the map ages out of view within 2-3 frames and
        # tracking collapses before the back-end goes idle.  An earlier
        # design that made stereo wait for idleness lost tracking by frame 9
        # on the TPU bench for exactly this reason; keyframe cadence is
        # governed by the cond1/cond2 thresholds, never by back-end
        # busyness.)
        if self.local_mapping is not None:
            self.local_mapping.interrupt_optimization()
            return self.local_mapping.queue_size() < 3
        return False

    def _local_mapping_idle(self) -> bool:
        lm = self.local_mapping
        return lm is None or lm.accepts_keyframes()

    def create_new_keyframe(self, f_cur: Frame) -> KeyFrame:
        kf = KeyFrame(f_cur)
        # register current observations
        pids, kp_idxs = self._assigned(f_cur)
        self.map.add_keyframe(kf)
        for pid, ki in zip(pids, kp_idxs):
            self.map.add_observation(int(pid), kf, int(ki))
        # stereo/RGBD: create close map points not yet tracked (reference
        # tracking.py:918+ create_new_keyframe + stereo point creation)
        if self.sensor_type in (SensorType.STEREO, SensorType.RGBD):
            close = (
                (f_cur.depths > 0)
                & (f_cur.depths < self.camera.depth_threshold * 2.0)
                & (kf.points < 0)
                & kf.valid
            )
            idxs = np.nonzero(close)[0]
            if len(idxs) > 0:
                # sort by depth, cap at 100 beyond-threshold like ORB-SLAM
                order = np.argsort(f_cur.depths[idxs])
                idxs = idxs[order]
                pts_w, _ = kf.unproject_keypoints(idxs)
                self.map.add_points_for_keyframe(kf, idxs, pts_w)
        self.map.update_connections(kf)
        self.kf_ref = kf
        self.last_kf_frame_id = f_cur.id
        if self.local_mapping is not None:
            self.local_mapping.push_keyframe(kf)
        return kf

    # ----------------------------------------------------------------- track
    def track(self, img, img_right=None, depth=None, frame_id=0,
              timestamp=0.0, frame: Frame | None = None) -> Frame:
        with self.timings.stage("frame"):   # extraction + stereo match
            if frame is not None:
                f_cur = frame               # prefetched (pipelined loop)
            else:
                # defer the extraction readback exactly when the fused
                # tracking step will consume the device handles directly
                # (its packed readback then carries the meta, so the frame
                # pays ZERO extra transfers)
                defer = (
                    self.state == TrackingState.OK
                    and Parameters.kUseFusedTrackingStep
                    and Parameters.kUseSearchFrameByProjection
                    and Parameters.kUseMotionModel
                    and self.motion_model.is_ok
                    and img_right is not None
                )
                f_cur = Frame(
                    self.camera, img, img_right=img_right, depth=depth,
                    timestamp=timestamp, feature_tracker=self.tracker,
                    frame_id=frame_id, defer_features=defer,
                )

        # 2-frames-in-flight pipeline: with a chain base in hand and the OK
        # fused path active, frame N dispatches against frame N-1's DEVICE
        # output and the host harvests one frame behind (VERDICT r4 ask #1)
        if (
            Parameters.kTrackingPipelineDepth >= 2
            and self._pending is not None
            and self.state == TrackingState.OK
            and Parameters.kUseFusedTrackingStep
            and Parameters.kUseSearchFrameByProjection
            and Parameters.kUseMotionModel
            and getattr(f_cur, "_meta_dev", None) is not None
            and not f_cur.host_ready
        ):
            return self._track_pipelined(f_cur, frame_id, timestamp)
        # leaving (or not entering) pipelined mode: materialize the in-flight
        # frame first so f_prev/history are complete
        if self._pending is not None:
            self.flush_pipeline()

        if self.state != TrackingState.OK:
            # only the OK fused path consumes device meta handles directly;
            # every other state needs host keypoint fields now
            f_cur.ensure_host()

        if self.state == TrackingState.NO_IMAGES_YET:
            self.state = TrackingState.NOT_INITIALIZED

        if self.state == TrackingState.NOT_INITIALIZED:
            out = self.initializer.initialize(f_cur, self.map, self.tracker)
            if out.success:
                self.state = TrackingState.OK
                self.kf_ref = out.kf_cur
                self.f_prev = f_cur
                self.last_kf_frame_id = f_cur.id
                self.motion_model.update(f_cur.Tcw, timestamp)
                self.history.add(timestamp, f_cur.Tcw, self.kf_ref, TrackingState.OK)
                if self.local_mapping is not None:
                    self.local_mapping.push_keyframe(out.kf_cur)
            return f_cur

        return self._track_core(f_cur, frame_id, timestamp)

    _NOPRE = object()   # sentinel: no pre-computed fused result

    def _track_core(self, f_cur: Frame, frame_id, timestamp,
                    fused_pre=_NOPRE) -> Frame:
        """OK/LOST/RELOCALIZE state logic for one frame.

        ``fused_pre``: pipelined mode passes the already-harvested fused
        result here — a (n_prev, n_inl1, n_inl2) tuple (graph ran; pose and
        point assignments are already applied to ``f_cur``) or None (the
        graph failed/diverged: fall straight to the legacy chain).  The
        default sentinel means "not attempted yet": dispatch the depth-1
        fused step inside."""
        fused_ok = False
        if self.state == TrackingState.OK:
            fused_flags = (
                Parameters.kUseFusedTrackingStep
                and Parameters.kUseSearchFrameByProjection
                and self.motion_model.is_ok
            )
            out = None
            if fused_pre is not Tracking._NOPRE:
                out = fused_pre
            else:
                # 1. predict pose
                if Parameters.kUseMotionModel and self.motion_model.is_ok:
                    f_cur.update_pose(self.motion_model.predict(self.f_prev.Tcw))
                else:
                    f_cur.update_pose(self.f_prev.Tcw)
                # 2a. fused one-dispatch path (steps 2-4 in one jit graph)
                if fused_flags:
                    with self.timings.stage("track_fused"):
                        out = self.track_fused(self.f_prev, f_cur)

            if out is not None:
                n_prev, n_inl1, n_inl2 = out
                good = n_inl2 >= Parameters.kNumMinInliersTrackLocalMap or (
                    self.sensor_type == SensorType.MONOCULAR
                    and n_inl2
                    >= Parameters.kNumMinInliersPoseOptimizationTrackFrame
                )
                if good:
                    self.num_matched_kps = n_prev
                    self.num_inliers = n_inl2
                    fused_ok = True
                else:
                    # weak fused result: restore the motion prediction and
                    # run the legacy path with its fallback chain
                    f_cur.points[:] = -1
                    f_cur.outliers[:] = False
                    f_cur.update_pose(
                        self.motion_model.predict(self.f_prev.Tcw)
                        if Parameters.kUseMotionModel and self.motion_model.is_ok
                        else self.f_prev.Tcw
                    )
            elif fused_pre is not Tracking._NOPRE:
                # pipelined graph diverged: same restore before legacy
                f_cur.points[:] = -1
                f_cur.outliers[:] = False
                f_cur.update_pose(
                    self.motion_model.predict(self.f_prev.Tcw)
                    if Parameters.kUseMotionModel and self.motion_model.is_ok
                    else self.f_prev.Tcw
                )

            if not fused_ok:
                f_cur.ensure_host()   # legacy path needs host fields
                # 2. frame-to-frame tracking
                n_matched = 0
                with self.timings.stage("track_prev"):
                    if (Parameters.kUseSearchFrameByProjection
                            and self.motion_model.is_ok):
                        n_matched = self.track_previous_frame(
                            self.f_prev, f_cur)
                    if n_matched < Parameters.\
                            kMinNumMatchedFeaturesSearchFrameByProjection:
                        n_matched = self.track_reference_frame(
                            self.kf_ref, f_cur)
                self.num_matched_kps = n_matched

                # 3. pose optimization #1
                with self.timings.stage("pose_opt"):
                    pids, kp_idxs = self._assigned(f_cur)
                    if len(pids) >= Parameters.kMinTrackedFeaturesForPoseOpt:
                        self.num_inliers = self._pose_optimize(
                            f_cur, pids, kp_idxs)
                    else:
                        self.num_inliers = 0

                if self.num_inliers < Parameters.kNumMinInliersPoseOptimizationTrackFrame:
                    Printer.red(f"tracking failure on frame {frame_id} "
                                f"(inliers={self.num_inliers})")
                    self.state = TrackingState.LOST

        if self.state in (TrackingState.LOST, TrackingState.RELOCALIZE,
                          TrackingState.INIT_RELOCALIZE):
            f_cur.ensure_host()
            ok = self._relocalize(f_cur)
            if ok:
                Printer.green(f"relocalized at frame {frame_id}")
                self.state = TrackingState.OK
                self.motion_model.reset()
            else:
                self.num_lost_frames += 1
                # auto-reset when lost early in a young map (reference
                # tracking.py:1424-1435)
                if (
                    self.num_lost_frames > Parameters.kMaxLostFramesBeforeReset
                    and self.map.num_keyframes() <= 5
                    and self.state != TrackingState.INIT_RELOCALIZE
                ):
                    Printer.yellow("tracking lost early: requesting reset")
                    self.reset_requested = True
                self.f_prev = f_cur
                return f_cur

        # 4. track local map + pose optimization #2 (already inside the
        # fused graph when it succeeded)
        if not fused_ok:
            with self.timings.stage("track_local_map"):
                n_inl = self.track_local_map(f_cur)
            if n_inl >= Parameters.kNumMinInliersTrackLocalMap or (
                self.sensor_type == SensorType.MONOCULAR
                and n_inl >= Parameters.kNumMinInliersPoseOptimizationTrackFrame
            ):
                self.num_inliers = n_inl
                self.state = TrackingState.OK
            elif self.num_inliers < Parameters.kNumMinInliersPoseOptimizationTrackFrame:
                self.state = TrackingState.LOST

        if self.state == TrackingState.OK:
            self.motion_model.update(f_cur.Tcw, timestamp)
            # 5. keyframe decision
            with self.timings.stage("kf_decision"):
                if self.need_new_keyframe(f_cur):
                    self.create_new_keyframe(f_cur)
            self.history.add(timestamp, f_cur.Tcw, self.kf_ref, TrackingState.OK)
            self.num_lost_frames = 0
            # establish / refresh the pipeline chain base: the fused output
            # buffer (still on device) lets the NEXT call dispatch chained
            if (
                fused_ok
                and Parameters.kTrackingPipelineDepth >= 2
                and self._last_fused_out is not None
                and fused_pre is Tracking._NOPRE
            ):
                self._pending = {
                    "frame": f_cur, "out": self._last_fused_out,
                    "timestamp": timestamp, "harvested": True,
                }
                self._last_fused_out = None

        self.f_prev = f_cur
        return f_cur

    # ------------------------------------------------- pipelined frame loop
    def _track_pipelined(self, f_cur: Frame, frame_id, timestamp) -> Frame:
        """Steady-state pipelined step: dispatch frame N chained on frame
        N-1's device buffer, then harvest N-1 and run its full state logic.
        Wall time per call ~= max(host work, device work): the only blocking
        transfer is the readback of a buffer dispatched one call earlier.

        Failure handling: if N-1's harvest is weak, the legacy chain
        recovers it on host and frame N's (now-invalid) chained dispatch is
        discarded — N is re-dispatched depth-1 style against the recovered
        assignments, so the pipeline stays full and no frame is dropped.  If
        N-1 is LOST, frame N runs the normal LOST/relocalize path this call.
        """
        pend, self._pending = self._pending, None
        import os as _os
        import time as _time

        _tl = _os.environ.get("PYSLAM_FRAME_TIMELINE") == "1"
        with self.timings.stage("track_dispatch"):
            out_dev = self._dispatch_chained(f_cur, pend["out"])
        if _tl and not pend.get("harvested"):
            age = _time.perf_counter() - pend.get("t_dispatch", _time.perf_counter())
            print(f"[tl-harv] f{pend['frame'].id} age={age*1e3:.0f}ms "
                  f"ready={pend['out'].is_ready()}", flush=True)
        # enqueue the next frame's extraction behind this dispatch
        if self.on_fused_dispatched is not None:
            cb, self.on_fused_dispatched = self.on_fused_dispatched, None
            cb()

        chain_valid = True
        if pend.get("harvested"):
            ret = pend["frame"]     # already fully processed last call
        else:
            with self.timings.stage("track_harvest"):
                res = self._fused_harvest(pend["frame"], pend["out"])
            if res is not None:
                n_inl2 = res[2]
                chain_valid = (
                    n_inl2 >= Parameters.kNumMinInliersTrackLocalMap or (
                        self.sensor_type == SensorType.MONOCULAR
                        and n_inl2
                        >= Parameters.kNumMinInliersPoseOptimizationTrackFrame
                    )
                )
            else:
                chain_valid = False
            ret = self._track_core(
                pend["frame"], pend["frame"].id, pend["timestamp"],
                fused_pre=res,
            )
            # a keyframe was born from N-1 during harvest: the chained
            # dispatch for N predates its spawned close points AND the
            # covisibility move, and on a fast-turning camera (the map ages
            # out of view within 2-3 frames) that staleness loses tracking —
            # re-dispatch N against the fresh map instead (KF frames pay the
            # depth-1 latency; non-KF steady-state frames keep the overlap)
            if (
                self.state == TrackingState.OK
                and self.last_kf_frame_id == pend["frame"].id
            ):
                chain_valid = False

        if self.state != TrackingState.OK:
            # N-1 lost: the chained dispatch for N is garbage; run N through
            # the normal LOST/relocalize path right now (no frame dropped)
            return self._track_core(f_cur, frame_id, timestamp)

        # adaptive depth: the pipeline makes the keyframe decision run on
        # one-frame-stale inliers and spawn keyframes one frame late — fine
        # in steady state, fatal when tracking decays fast (the map ages out
        # of view within 2-3 frames; the CPU stereo stream lost tracking at
        # depth 2 exactly this way).  Below the danger threshold, process
        # THIS frame synchronously (depth-1 semantics: fresh inliers feed
        # the keyframe decision this very frame); the pipeline re-forms on
        # the next healthy frame.
        danger = max(
            2 * Parameters.kNumMinInliersTrackLocalMap,
            int(0.04 * self.tracker.num_features),
        )
        if self.num_inliers < danger:
            return self._track_core(f_cur, frame_id, timestamp)

        if out_dev is not None and chain_valid:
            self._pending = {
                "frame": f_cur, "out": out_dev, "timestamp": timestamp,
                "harvested": False, "t_dispatch": _time.perf_counter(),
            }
            return ret
        # chained dispatch unavailable or predicated on a recovered pose:
        # re-dispatch N depth-1 style against N-1's host assignments
        f_cur.update_pose(
            self.motion_model.predict(self.f_prev.Tcw)
            if self.motion_model.is_ok else self.f_prev.Tcw
        )
        out2 = self._fused_dispatch(self.f_prev, f_cur)
        if out2 is not None:
            self._pending = {
                "frame": f_cur, "out": out2, "timestamp": timestamp,
                "harvested": False, "t_dispatch": _time.perf_counter(),
            }
            return ret
        # cannot pipeline this frame at all: process it synchronously
        return self._track_core(f_cur, frame_id, timestamp)

    def flush_pipeline(self):
        """Materialize the in-flight pipelined frame (harvest + state
        logic).  Called when leaving the pipelined mode, at sequence end
        (``Slam.finish``), and before any consumer that needs a complete
        ``f_prev``/history."""
        if self._pending is None:
            return
        pend, self._pending = self._pending, None
        if pend.get("harvested"):
            return
        res = self._fused_harvest(pend["frame"], pend["out"])
        self._track_core(
            pend["frame"], pend["frame"].id, pend["timestamp"], fused_pre=res
        )

    # ------------------------------------------------------------ relocalize
    def _relocalize(self, f_cur: Frame) -> bool:
        if self.relocalizer is None:
            return False
        T, ok = self.relocalizer.relocalize(f_cur, self.map)
        if ok:
            f_cur.update_pose(T)
        return ok
