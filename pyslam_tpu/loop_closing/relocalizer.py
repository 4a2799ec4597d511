"""PnP-based relocalization (reference: pySLAM
``pyslam/slam/relocalizer.py:167-211`` + C++ ``pnpsolver``).

Pipeline per lost frame: BoW candidate keyframes from the database ->
descriptor match frame<->candidate map points (MXU Hamming) -> batched-
hypothesis RANSAC PnP -> LM pose refinement -> projection-match enrichment ->
accept with >= kRelocalizationFinalMinNumInliers inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.ops import hamming, matching as m_ops, optim, pnp
from pyslam_tpu.utils.padding import pad_bucket, pad_rows


class Relocalizer:
    def __init__(self, camera, keyframe_db=None, detector=None):
        self.camera = camera
        self.keyframe_db = keyframe_db
        self.detector = detector
        self._key = jax.random.PRNGKey(7)
        self._frame_words = None   # words of the frame being relocalized

    def _candidates(self, frame, slam_map) -> list[int]:
        self._frame_words = None
        if self.detector is not None and self.keyframe_db is not None:
            words, g_des = self.detector.describe_frame(frame)
            self._frame_words = words
            voc = getattr(self.detector, "vocabulary", None)
            if words is not None and voc is not None:
                # query-time tf-idf (see KeyFrameDatabase.score)
                self.keyframe_db.idf = voc.idf_weights()
            cands = self.keyframe_db.detect_relocalization_candidates(words, g_des)
            if cands:
                return cands
        # fallback: most recent keyframes
        return list(slam_map.keyframe_order[-5:])

    def _guided_mask(self, kid: int, kf_slots: np.ndarray):
        """DIRECT-INDEX guided matching (reference DBoW direct index +
        ``SearchByBoW``, relocalizer.py:167-211): restrict candidate feature
        pairs to those whose words share a vocabulary subtree at the direct-
        index level.  Returns a (P, N) bool mask or None when the vocabulary
        has no tree structure / no stored keypoint words."""
        voc = getattr(self.detector, "vocabulary", None)
        db = self.keyframe_db
        fw = self._frame_words
        if (voc is None or not hasattr(voc, "level_nodes_for")
                or db is None or fw is None):
            return None
        kp_words = db.kf_kp_words.get(kid)
        if kp_words is None or len(kp_words) <= kf_slots.max(initial=0):
            return None
        lvl = max(0, voc.depth - 3)
        a = voc.level_nodes_for(kp_words[kf_slots], lvl)
        b = voc.level_nodes_for(np.asarray(fw), lvl)
        return (a[:, None] == b[None, :]) & (a[:, None] >= 0)

    def relocalize(self, frame, slam_map):
        """Returns (Tcw, ok)."""
        cam = self.camera
        st = slam_map.points
        for kid in self._candidates(frame, slam_map):
            kf = slam_map.keyframes.get(kid)
            if kf is None:
                continue
            kf_slots = np.nonzero(kf.points >= 0)[0]
            if len(kf_slots) < 15:
                continue
            pids = slam_map.resolve_replacements(kf.points[kf_slots])
            alive = (pids >= 0) & st.valid[np.clip(pids, 0, None)]
            kf_slots, pids = kf_slots[alive], pids[alive]
            if len(pids) < 15:
                continue

            # match frame descriptors to the candidate's map-point descriptors
            d = hamming.descriptor_distance_matrix(
                jnp.asarray(st.desc[pids]), jnp.asarray(frame.des)
            ).astype(jnp.float32)
            mask = self._guided_mask(kid, kf_slots)
            if mask is not None:
                d_guided = jnp.where(jnp.asarray(mask), d, jnp.inf)
                idx, _ = m_ops.match_ratio_test(
                    d_guided, Parameters.kMaxDescriptorDistance, ratio=Parameters.kRelocalizationFeatureMatchRatioTest,
                    valid_b=jnp.asarray(frame.valid),
                )
                idx = np.asarray(idx)
                if (idx >= 0).sum() < Parameters.kRelocalizationMinPnPInliers:
                    mask = None   # too sparse under guidance: fall back
            if mask is None:
                idx, _ = m_ops.match_ratio_test(
                    d, Parameters.kMaxDescriptorDistance, ratio=Parameters.kRelocalizationFeatureMatchRatioTest,
                    valid_b=jnp.asarray(frame.valid),
                )
                idx = np.asarray(idx)
            rows = np.nonzero(idx >= 0)[0]
            if len(rows) < Parameters.kRelocalizationMinPnPInliers:
                continue
            kp_idx = idx[rows]
            p3d = st.pos[pids[rows]]
            xy = np.asarray(cam.unproject_points(frame.kps[kp_idx]))

            p3d_p, valid = pad_bucket(p3d.astype(np.float32))
            xy_p = pad_rows(xy.astype(np.float32), len(valid))
            self._key, k = jax.random.split(self._key)
            th2 = (5.99 / cam.fx ** 2)
            T, inl_mask, n_inl = pnp.solve_pnp_ransac(
                k, jnp.asarray(p3d_p), jnp.asarray(xy_p), jnp.asarray(valid),
                th2, Parameters.kRelocalizationPnPRansacIterations,
            )
            if int(n_inl) < Parameters.kRelocalizationMinPnPInliers:
                continue

            # refine + enrich: assign matched points to the frame and run the
            # full motion-only optimization
            frame.update_pose(np.asarray(T))
            frame.points[:] = -1
            inl = np.asarray(inl_mask)[: len(rows)]
            frame.points[kp_idx[inl]] = pids[rows[inl]]

            # enrichment: project the candidate's covisible map into the frame
            from pyslam_tpu.ops import slam_matching

            local = slam_map.get_local_map_points([kid] + kf.ordered_covisibles(10))
            if len(local) > 0:
                pos_p, valid_p = pad_bucket(st.pos[local])
                m = len(valid_p)
                _, kp_match, _ = slam_matching.search_by_projection(
                    jnp.asarray(pos_p, jnp.float32),
                    jnp.asarray(pad_rows(st.desc[local], m)),
                    jnp.asarray(pad_rows(st.normal[local], m)),
                    jnp.asarray(pad_rows(st.min_dist[local], m)),
                    jnp.asarray(pad_rows(st.max_dist[local], m, fill=1.0)),
                    jnp.asarray(valid_p),
                    jnp.asarray(frame.kps), jnp.asarray(frame.levels),
                    jnp.asarray(frame.des), jnp.asarray(frame.valid),
                    jnp.asarray(frame.kps_ur),
                    jnp.asarray(frame.Tcw, jnp.float32),
                    jnp.asarray(cam.K, jnp.float32),
                    jnp.asarray(
                        [cam.u_min, cam.u_max, cam.v_min, cam.v_max], np.float32
                    ),
                    jnp.asarray(frame.feature_tracker.scale_factors),
                    float(Parameters.kMaxReprojectionDistanceMapRelocalize),
                    float(Parameters.kMaxOrbDistanceSearchByReproj),
                )
                kp_match = np.asarray(kp_match)
                in_range = (kp_match >= 0) & (kp_match < len(local))
                new_kps = np.nonzero(in_range & (frame.points < 0))[0]
                frame.points[new_kps] = local[kp_match[new_kps]]

            slots = np.nonzero(frame.points >= 0)[0]
            if len(slots) < Parameters.kRelocalizationMinPnPInliers:
                continue
            pids_f = frame.points[slots]
            pts3d, valid = pad_bucket(st.pos[pids_f].astype(np.float32))
            m = len(valid)
            T_opt, inliers, n_inl2 = optim.pose_optimization(
                jnp.asarray(frame.Tcw, jnp.float32),
                jnp.asarray(pts3d),
                jnp.asarray(pad_rows(frame.kps[slots], m)),
                jnp.asarray(pad_rows(frame.kps_ur[slots], m, fill=-1.0)),
                jnp.asarray(pad_rows(frame.sigma2_for(slots), m, fill=1.0)),
                jnp.asarray(valid),
                jnp.asarray(cam.K, jnp.float32),
                bf=cam.bf,
            )
            inliers = np.asarray(inliers)[: len(slots)]
            if inliers.sum() >= Parameters.kRelocalizationFinalMinNumInliers * 0.5:
                frame.update_pose(np.asarray(T_opt))
                frame.points[slots[~inliers]] = -1
                return np.asarray(T_opt), True
        return frame.Tcw, False
