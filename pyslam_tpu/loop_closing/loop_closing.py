"""Loop closing orchestrator: detect -> consistency -> geometry -> correct.

Reference: pySLAM ``pyslam/loop_closing/loop_closing.py`` — the
LoopGroupConsistencyChecker (:107), LoopGeometryChecker (:195), LoopCorrector
(:470) pipeline, here driven synchronously from the host scheduler (the
reference's detector child process exists for CUDA model isolation; our
detector is a couple of jitted matmuls).

Geometry check: matched map points between the current and candidate keyframes
(MXU Hamming on point descriptors) -> batched Sim3 RANSAC on the 3D-3D pairs
-> Sim3 LM refinement with mutual reprojections -> acceptance at
>= kLoopClosingMinNumMatchedMapPoints matches.
Correction: Sim3 propagation to the current covisibility group, duplicate
fusion, essential-graph PGO over Sim(3) (scale free for monocular), then GBA.
"""

from __future__ import annotations

import os
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.loop_closing.keyframe_database import KeyFrameDatabase
from pyslam_tpu.loop_closing.loop_detector_configs import (
    GlobalDescriptorType,
    LoopDetectorConfig,
    LoopDetectorConfigs,
    LoopDetectorVocabularyType,
)
from pyslam_tpu.loop_closing.relocalizer import Relocalizer
from pyslam_tpu.loop_closing.vocabulary import BinaryVocabulary
from pyslam_tpu.ops import hamming, lie, matching as m_ops, optim, procrustes
from pyslam_tpu.slam.frame import KeyFrame
from pyslam_tpu.slam.map import Map
from pyslam_tpu.utils.logging import Printer
from pyslam_tpu.utils.padding import pad_bucket, pad_rows


class LoopDetector:
    """Global-descriptor computation on device + database bookkeeping.

    BoW-class types (DBOW2/DBOW3/IBOW/OBINDEX2) quantize against a binary
    vocabulary and return (words, tf-idf histogram); score-based types (VLAD,
    SAD; reference ``loop_detector_vpr.py`` class) return (None, g_des) and
    the keyframe database switches to pure similarity scoring."""

    def __init__(self, config: LoopDetectorConfig):
        self.config = config
        if config.vocabulary_type == LoopDetectorVocabularyType.PRETRAINED:
            from pyslam_tpu.loop_closing.vocabulary import (
                HierarchicalVocabulary,
            )

            self.vocabulary = HierarchicalVocabulary.load(
                config.extra["vocabulary_path"]
            )
        elif (config.vocabulary_type
              == LoopDetectorVocabularyType.HIERARCHICAL_SESSION):
            from pyslam_tpu.loop_closing.vocabulary import (
                HierarchicalVocabulary,
            )

            self.vocabulary = HierarchicalVocabulary(branching=8, depth=4)
        else:
            self.vocabulary = BinaryVocabulary(num_words=config.num_words)
        self._trained = False
        self._train_buffer: list[np.ndarray] = []
        gdt = config.global_descriptor_type
        self.vlad = None
        self.netvlad = None
        if gdt == GlobalDescriptorType.VLAD:
            from pyslam_tpu.loop_closing.vlad import VladVocabulary

            self.vlad = VladVocabulary(num_clusters=config.num_words)
        if gdt == GlobalDescriptorType.NETVLAD:
            from pyslam_tpu.models.netvlad import NetVLADExtractor

            Parameters.kRetainImageForVPR = True
            self.netvlad = NetVLADExtractor(
                checkpoint=config.extra.get("checkpoint")
            )
        if gdt == GlobalDescriptorType.MEGALOC:
            # MegaLoc: DINOv2-class ViT + SALAD Sinkhorn aggregation
            from pyslam_tpu.models.megaloc import MegaLocExtractor

            Parameters.kRetainImageForVPR = True
            self.netvlad = MegaLocExtractor(
                checkpoint=config.extra.get("checkpoint")
            )
        if gdt == GlobalDescriptorType.ALEXNET:
            from pyslam_tpu.loop_closing.vpr import AlexNetExtractor

            Parameters.kRetainImageForVPR = True
            self.netvlad = AlexNetExtractor(
                checkpoint=config.extra.get("checkpoint")
            )
        if gdt == GlobalDescriptorType.HDC_DELF:
            from pyslam_tpu.loop_closing.vpr import HDCDelfExtractor

            Parameters.kRetainImageForVPR = True
            self.netvlad = HDCDelfExtractor()
        if gdt in (GlobalDescriptorType.COSPLACE,
                   GlobalDescriptorType.EIGENPLACES):
            # gmberton CosPlace / EigenPlaces (ResNet + GeM + Linear); same
            # whole-image score-based path as NetVLAD
            from pyslam_tpu.models.cosplace import CosPlaceExtractor

            Parameters.kRetainImageForVPR = True
            self.netvlad = CosPlaceExtractor(
                checkpoint=config.extra.get("checkpoint")
            )
        self.score_based = gdt in (
            GlobalDescriptorType.VLAD, GlobalDescriptorType.SAD,
            GlobalDescriptorType.NETVLAD, GlobalDescriptorType.COSPLACE,
            GlobalDescriptorType.EIGENPLACES, GlobalDescriptorType.MEGALOC,
            GlobalDescriptorType.ALEXNET, GlobalDescriptorType.HDC_DELF,
        )

    def describe_frame(self, frame):
        desc = frame.des
        valid = frame.valid
        gdt = self.config.global_descriptor_type
        if self.netvlad is not None:
            img = getattr(frame, "img_vpr", None)
            if img is None:
                img = getattr(frame, "img_thumb", None)
            if img is not None:
                return None, self.netvlad(img)
            v = np.asarray(desc[valid], np.float32).mean(axis=0)
            return None, v / max(np.linalg.norm(v), 1e-12)
        if gdt == GlobalDescriptorType.VLAD:
            return None, self.vlad.global_descriptor(desc, valid)
        if gdt == GlobalDescriptorType.SAD:
            from pyslam_tpu.loop_closing.vlad import sad_descriptor

            img = getattr(frame, "img_thumb", None)
            if img is None:
                # no thumbnail retained: fall back to descriptor mean
                v = np.asarray(desc[valid], np.float32).mean(axis=0)
                return None, v / max(np.linalg.norm(v), 1e-12)
            return None, np.asarray(sad_descriptor(jnp.asarray(img, jnp.float32)))
        if (
            self.config.vocabulary_type == LoopDetectorVocabularyType.SESSION_TRAINED
            and not self._trained
        ):
            self._train_buffer.append(desc[valid][:: max(1, valid.sum() // 200)])
            if sum(len(b) for b in self._train_buffer) > 4000:
                self.vocabulary.train_kmeans(np.concatenate(self._train_buffer))
                self._trained = True
                self._train_buffer.clear()
        words = self.vocabulary.words_for(desc, valid)
        g_des = self.vocabulary.global_descriptor(words)
        return words, g_des


class LoopGroupConsistencyChecker:
    """Covisibility-group consistency across detections (reference :107-195)."""

    def __init__(self, min_consistency: int | None = None):
        self.min_consistency = (
            min_consistency or Parameters.kLoopClosingMinNumConsistentGroups
        )
        self.prev_groups: list[tuple[set, int]] = []

    def check(self, candidates: list[int], group_of) -> list[int]:
        """Returns candidates whose group has been consistent long enough."""
        accepted = []
        new_groups: list[tuple[set, int]] = []
        for cand in candidates:
            group = set(group_of(cand)) | {cand}
            count = 0
            for prev, c in self.prev_groups:
                if group & prev:
                    count = max(count, c + 1)
            new_groups.append((group, count))
            if count >= self.min_consistency - 1:
                accepted.append(cand)
        self.prev_groups = new_groups
        return accepted

    def reset(self):
        self.prev_groups = []


class LoopClosing:
    def __init__(
        self,
        slam_map: Map,
        camera,
        feature_tracker,
        detector_config: LoopDetectorConfig | str = "DBOW3",
        sensor_type: SensorType = SensorType.MONOCULAR,
    ):
        if isinstance(detector_config, str):
            detector_config = LoopDetectorConfigs.get(detector_config)
        self.map = slam_map
        self.camera = camera
        self.tracker = feature_tracker
        self.sensor_type = sensor_type
        self.detector = LoopDetector(detector_config)
        self.db = KeyFrameDatabase(
            getattr(self.detector.vocabulary, "num_words",
                    detector_config.num_words))
        self.consistency = LoopGroupConsistencyChecker()
        self.relocalizer = Relocalizer(camera, self.db, self.detector)
        self.local_mapping = None   # injected by Slam (drained on correction)
        self.queue: deque[KeyFrame] = deque()
        self.last_loop_kf_id = -1
        self.num_loops_closed = 0
        # concurrent GBA-then-correct protocol (reference
        # global_bundle_adjustment.py:184-310): the post-correction GBA runs
        # as polled device chunks while tracking continues; a newer loop
        # supersedes (aborts) an in-flight solve
        from pyslam_tpu.slam.global_bundle_adjustment import AsyncGBA

        self.gba = AsyncGBA(camera, feature_tracker)
        self._key = jax.random.PRNGKey(11)
        # the reference's acceptance counts assume a 2000-feature budget;
        # scale them like the keyframe-decision thresholds
        feat_scale = min(1.0, feature_tracker.num_features / 2000.0)
        self.min_bow_matches = max(
            12, int(Parameters.kLoopClosingGeometryCheckerMinNumBoWMatches * feat_scale)
        )
        self.min_sim3_inliers = max(
            10, int(Parameters.kSim3SolverMinInliers * feat_scale)
        )
        self.min_matched_points = max(
            18, int(Parameters.kLoopClosingMinNumMatchedMapPoints * feat_scale)
        )

    # --------------------------------------------------------- state machine
    def reset(self):
        """Clear all session loop-closing state (reference: the loop detector
        DB is reset with the session; ``Slam.reset`` must not leak it)."""
        self.queue.clear()
        self.db = KeyFrameDatabase(
            getattr(self.detector.vocabulary, "num_words",
                    self.detector.config.num_words))
        self.relocalizer.keyframe_db = self.db
        self.consistency.reset()
        self.last_loop_kf_id = -1
        self.num_loops_closed = 0
        self.gba._state = None          # discard an in-flight solve
        self.gba.abort_flag = False

    def save(self, path: str):
        """Persist the loop-closing DB: vocabulary + inverted index + global
        descriptors + counters (reference saves the detector DB via task
        messages, ``loop_detecting_process.py:170-187``; single-process here
        so it is one npz next to map.json)."""
        import os

        db = self.db
        kids = np.asarray(sorted(db.kf_gdes.keys()), np.int64)
        gdes = (
            np.stack([db.kf_gdes[int(k)] for k in kids])
            if len(kids) else np.zeros((0, 0), np.float32)
        )
        words_flat = (
            np.concatenate([db.kf_words[int(k)] for k in kids])
            if len(kids) else np.zeros((0,), np.int64)
        )
        offsets = np.cumsum(
            [0] + [len(db.kf_words[int(k)]) for k in kids]
        ).astype(np.int64)
        empty = np.zeros((0,), np.int64)
        kp_lists = [db.kf_kp_words.get(int(k), empty) for k in kids]
        kp_flat = np.concatenate(kp_lists) if len(kids) else empty
        kp_offsets = np.cumsum([0] + [len(a) for a in kp_lists]).astype(
            np.int64
        )
        state = {
            "kids": kids,
            "gdes": gdes,
            "words_flat": words_flat,
            "word_offsets": offsets,
            "kp_words_flat": kp_flat,          # direct index (per-kp words)
            "kp_word_offsets": kp_offsets,
            "last_loop_kf_id": self.last_loop_kf_id,
            "num_loops_closed": self.num_loops_closed,
        }
        voc = getattr(self.detector, "vocabulary", None)
        if voc is not None and getattr(voc, "seeded", False):
            if hasattr(voc, "level_nodes_for"):   # hierarchical tree
                voc.save(os.path.join(path, "loop_vocabulary.npz"))
                state["voc_checksum"] = voc.checksum()
            else:
                state.update(
                    voc_words_bits=voc.words_bits,
                    voc_doc_count=voc.doc_count,
                    voc_word_doc_count=voc.word_doc_count,
                )
        np.savez_compressed(os.path.join(path, "loop_closing_state.npz"),
                            **state)

    def load(self, path: str) -> bool:
        """Restore the saved DB (not rebuilt — word assignments stay
        consistent with the saved vocabulary).  Returns False when no state
        file exists."""
        import os

        fp = os.path.join(path, "loop_closing_state.npz")
        if not os.path.exists(fp):
            return False
        z = np.load(fp)
        self.reset()
        voc = getattr(self.detector, "vocabulary", None)
        voc_fp = os.path.join(path, "loop_vocabulary.npz")
        if os.path.exists(voc_fp):
            from pyslam_tpu.loop_closing.vocabulary import (
                HierarchicalVocabulary,
            )

            loaded = HierarchicalVocabulary.load(voc_fp)
            if "voc_checksum" in z and loaded.checksum() != str(
                z["voc_checksum"]
            ):
                Printer.red(
                    "loop DB vocabulary checksum mismatch: stored word "
                    "assignments are inconsistent — rebuilding DB instead"
                )
                return False
            self.detector.vocabulary = loaded
            self.detector._trained = True
        elif voc is not None and "voc_words_bits" in z:
            voc.words_bits = z["voc_words_bits"]
            voc._words_dev = jnp.asarray(voc.words_bits)
            voc.seeded = True
            voc.doc_count = int(z["voc_doc_count"])
            voc.word_doc_count = z["voc_word_doc_count"]
            self.detector._trained = True
        kids = z["kids"]
        gdes = z["gdes"]
        offs = z["word_offsets"]
        flat = z["words_flat"]
        kp_offs = z["kp_word_offsets"] if "kp_word_offsets" in z else None
        kp_flat = z["kp_words_flat"] if "kp_words_flat" in z else None
        for i, kid in enumerate(kids):
            # prefer the full per-kp words (direct index); older saves only
            # carried the unique word sets
            words = None
            if kp_offs is not None:
                kp = kp_flat[kp_offs[i]:kp_offs[i + 1]]
                if len(kp):
                    words = kp
            if words is None:
                w = flat[offs[i]:offs[i + 1]]
                words = w if len(w) else None
            self.db.add(int(kid), words, gdes[i])
        self.last_loop_kf_id = int(z["last_loop_kf_id"])
        self.num_loops_closed = int(z["num_loops_closed"])
        return True

    # ----------------------------------------------------------------- queue
    def add_keyframe(self, kf: KeyFrame):
        self.queue.append(kf)

    def step(self) -> bool:
        if not self.queue:
            return self.gba.poll()     # service an in-flight GBA
        kf = self.queue.popleft()
        if kf.is_bad or kf.kid not in self.map.keyframes:
            return True
        self.process_keyframe(kf)
        return True

    def finish(self):
        """Drain the detection queue and block until an in-flight GBA has
        applied (sequence end / before serialization)."""
        while self.queue:
            self.step()
        self.gba.finish()

    # ------------------------------------------------------------- detection
    def process_keyframe(self, kf: KeyFrame):
        words, g_des = self.detector.describe_frame(kf)
        kf.g_des = g_des
        # VLAD trains on the first keyframes of the session: once it fires,
        # re-describe every keyframe stored with the placeholder descriptor
        vlad = self.detector.vlad
        if vlad is not None and vlad.consume_just_trained():
            for kid2 in list(self.db.kf_gdes):
                kf2 = self.map.keyframes.get(kid2)
                if kf2 is not None:
                    g2 = vlad.global_descriptor(kf2.des, kf2.valid)
                    self.db.kf_gdes[kid2] = g2
                    kf2.g_des = g2
            kf.g_des = g_des = vlad.global_descriptor(kf.des, kf.valid)

        candidates: list[int] = []
        if (
            kf.kid - self.last_loop_kf_id
            >= Parameters.kLoopDetectionMinFramesAfterLastDetection
            and self.map.num_keyframes() > 10
        ):
            # refresh the query-time idf weights from the vocabulary's
            # CURRENT document statistics (DBoW3-style tf-idf scoring;
            # stored vectors stay raw tf so rankings never drift)
            voc = getattr(self.detector, "vocabulary", None)
            if words is not None and voc is not None:
                self.db.idf = voc.idf_weights()
            candidates = self.db.detect_loop_candidates(
                kf.kid, words, g_des,
                set(kf.connected_keyframes.keys()),
                lambda kid: self._covisibles(kid),
            )
        # always register AFTER querying (avoid self-hit)
        self.db.add(kf.kid, words, g_des)
        if words is not None:
            self.detector.vocabulary.add_document(words)
        if not candidates:
            self.consistency.check([], self._covisibles)
            return

        consistent = self.consistency.check(candidates, self._covisibles)
        for cand_kid in consistent:
            cand = self.map.keyframes.get(cand_kid)
            if cand is None or cand.is_bad:
                continue
            # temporal gate: a candidate a few keyframes old is re-detection
            # of the local neighborhood, not a loop — correcting against it is
            # degenerate (observed: adjacent-KF 'loop' whose Sim3/PGO blew up)
            if kf.kid - cand_kid < Parameters.kLoopDetectionMinKeyframeDistance:
                continue
            ok, S12, matches = self.geometry_check(kf, cand)
            if ok:
                Printer.green(
                    f"LOOP: kf {kf.kid} <-> kf {cand_kid} "
                    f"({matches} matched points)"
                )
                self.correct_loop(kf, cand, S12)
                self.last_loop_kf_id = kf.kid
                self.num_loops_closed += 1
                self.consistency.reset()
                break

    def _covisibles(self, kid: int) -> list[int]:
        kf = self.map.keyframes.get(kid)
        return kf.ordered_covisibles(Parameters.kLoopClosingNumCovisiblesForCandidate) if kf else []

    # -------------------------------------------------------- geometry check
    def geometry_check(self, kf: KeyFrame, cand: KeyFrame):
        """Sim3 RANSAC + refinement between the two keyframes' map points.

        Returns (ok, S12 mapping cand-camera coords -> kf-camera coords,
        num_matches)."""
        dbg = os.environ.get("PYSLAM_TPU_LOOP_DEBUG") == "1"
        st = self.map.points
        cam = self.camera
        slots1 = np.nonzero(kf.points >= 0)[0]
        if len(slots1) < 20:
            return False, None, 0
        pids1 = self.map.resolve_replacements(kf.points[slots1])
        a1 = (pids1 >= 0) & st.valid[np.clip(pids1, 0, None)]
        slots1, pids1 = slots1[a1], pids1[a1]

        # loop side: the candidate's whole covisibility-group point set.  Old
        # keyframes retain few direct associations (the probation culling is
        # aggressive by design), but their neighborhoods hold hundreds of
        # surviving points; each is expressed in the candidate's camera frame
        # and gated to its frustum (uv2 synthesized by projection — positions
        # come from OTHER cameras, so the Sim3 is still over-constrained).
        pids2 = self.map.get_local_map_points(
            [cand.kid] + cand.ordered_covisibles(10)
        )
        if len(pids2) < 20:
            return False, None, 0
        p2_all = (cand.Tcw[:3, :3] @ st.pos[pids2].T).T + cand.Tcw[:3, 3]
        z2 = p2_all[:, 2]
        u2 = cam.fx * p2_all[:, 0] / np.maximum(z2, 1e-9) + cam.cx
        v2 = cam.fy * p2_all[:, 1] / np.maximum(z2, 1e-9) + cam.cy
        in_view = (
            (z2 > 0.1) & (u2 >= cam.u_min) & (u2 < cam.u_max)
            & (v2 >= cam.v_min) & (v2 < cam.v_max)
        )
        pids2 = pids2[in_view]
        if len(pids2) < 20:
            return False, None, 0

        # descriptor matching between the two point sets; with a tree
        # vocabulary, gate pairs to shared direct-index subtrees (reference
        # SearchByBoW quality: fewer aliased far matches feed the Sim3)
        d = hamming.descriptor_distance_matrix(
            jnp.asarray(st.desc[pids1]), jnp.asarray(st.desc[pids2])
        ).astype(jnp.float32)
        voc = self.detector.vocabulary
        kp_words1 = self.db.kf_kp_words.get(kf.kid)
        idx = None
        if (hasattr(voc, "level_nodes_for") and kp_words1 is not None
                and len(kp_words1) > slots1.max(initial=0)):
            lvl = max(0, voc.depth - Parameters.kLoopClosingDirectIndexLevel)
            w2 = voc.words_for(
                st.desc[pids2], np.ones(len(pids2), bool)
            )
            a = voc.level_nodes_for(kp_words1[slots1], lvl)
            b = voc.level_nodes_for(w2, lvl)
            mask = (a[:, None] == b[None, :]) & (a[:, None] >= 0)
            idx_g, _ = m_ops.match_ratio_test(
                jnp.where(jnp.asarray(mask), d, jnp.inf),
                Parameters.kMaxDescriptorDistance,
                ratio=Parameters.kLoopClosingFeatureMatchRatioTest,
            )
            idx_g = np.asarray(idx_g)
            if (idx_g >= 0).sum() >= self.min_bow_matches:
                idx = idx_g
        if idx is None:
            idx, _ = m_ops.match_ratio_test(
                d, Parameters.kMaxDescriptorDistance,
                ratio=Parameters.kLoopClosingFeatureMatchRatioTest
            )
            idx = np.asarray(idx)
        rows = np.nonzero(idx >= 0)[0]
        if dbg:
            print(f"[geom-dbg] pids1={len(pids1)} pids2={len(pids2)} "
                  f"bow_matches={len(rows)} (min {self.min_bow_matches})",
                  flush=True)
        if len(rows) < self.min_bow_matches:
            return False, None, 0

        p1_w = st.pos[pids1[rows]]
        # express in camera frames
        p1_c = (kf.Tcw[:3, :3] @ p1_w.T).T + kf.Tcw[:3, 3]
        p2_c = (cand.Tcw[:3, :3] @ st.pos[pids2[idx[rows]]].T).T + cand.Tcw[:3, 3]

        uv1 = kf.kps[slots1[rows]]
        zz = np.maximum(p2_c[:, 2], 1e-9)
        uv2 = np.stack(
            [cam.fx * p2_c[:, 0] / zz + cam.cx, cam.fy * p2_c[:, 1] / zz + cam.cy], 1
        )
        sig1 = self.tracker.sigma2[kf.levels[slots1[rows]]]
        sig2 = np.ones(len(rows), np.float32)

        p1_p, valid = pad_bucket(p1_c.astype(np.float32))
        m = len(valid)
        p2_p = pad_rows(p2_c.astype(np.float32), m)
        self._key, k = jax.random.split(self._key)
        fix_scale = self.sensor_type != SensorType.MONOCULAR
        # depth-sigma-aware hypothesis sampling: stereo/RGBD depth error
        # grows ~z^2, so a minimal triple containing far points yields a
        # useless Horn solution even though reprojection SCORING tolerates
        # far points.  Weight ∝ 1/max(z1,z2)^4 (inverse depth-variance^2)
        # steers the solved-from triples toward near geometry while every
        # correspondence still votes.
        zmax = np.maximum(np.maximum(p1_c[:, 2], p2_c[:, 2]), 0.5)
        w_near = (1.0 / zmax ** 4).astype(np.float32)
        # reprojection-scored RANSAC (3D-3D scoring fails on far-point stereo
        # depth noise; see ops.procrustes.sim3_ransac_reproj docstring)
        S12, inl, n_inl = procrustes.sim3_ransac_reproj(
            k,
            jnp.asarray(p1_p), jnp.asarray(p2_p),
            jnp.asarray(pad_rows(uv1.astype(np.float32), m)),
            jnp.asarray(pad_rows(uv2.astype(np.float32), m)),
            jnp.asarray(pad_rows(sig1.astype(np.float32), m, fill=1.0)),
            jnp.asarray(pad_rows(sig2.astype(np.float32), m, fill=1.0)),
            jnp.asarray(valid),
            jnp.asarray(self.camera.K, jnp.float32),
            jnp.asarray(self.camera.K, jnp.float32),
            num_hyp=Parameters.kSim3SolverRansacIterations,
            with_scale=not fix_scale,
            sample_weights=jnp.asarray(pad_rows(w_near, m)),
        )
        if dbg:
            print(f"[geom-dbg] ransac inliers={int(n_inl)} "
                  f"(min {self.min_sim3_inliers})", flush=True)
        if int(n_inl) < self.min_sim3_inliers:
            return False, None, 0
        S_opt, inl2, n_inl2 = optim.optimize_sim3(
            jnp.asarray(np.asarray(S12), jnp.float32),
            jnp.asarray(pad_rows(p1_c.astype(np.float32), m)),
            jnp.asarray(pad_rows(p2_c.astype(np.float32), m)),
            jnp.asarray(pad_rows(uv1.astype(np.float32), m)),
            jnp.asarray(pad_rows(uv2.astype(np.float32), m)),
            jnp.asarray(pad_rows(sig1.astype(np.float32), m, fill=1.0)),
            jnp.asarray(pad_rows(sig2.astype(np.float32), m, fill=1.0)),
            jnp.asarray(valid),
            jnp.asarray(self.camera.K, jnp.float32),
            jnp.asarray(self.camera.K, jnp.float32),
            chi2_th=Parameters.kLoopClosingTh2,
            fix_scale=fix_scale,
            inliers_init=inl,
        )
        if dbg:
            print(f"[geom-dbg] sim3-opt inliers={int(n_inl2)}", flush=True)
        if int(n_inl2) < self.min_sim3_inliers:
            return False, None, int(n_inl2)
        S12_np = np.asarray(S_opt, np.float64)

        # Sim3-guided enrichment (reference ``search_by_sim3``): project the
        # loop side's local map through the estimated Sim3 into the current
        # keyframe and pick up additional matches before final acceptance.
        n_extra, S12_np = self._search_by_sim3(kf, cand, S12_np)
        n_final = int(n_inl2) + n_extra
        if n_final < self.min_matched_points:
            return False, None, n_final
        return True, S12_np, n_final

    def _search_by_sim3(self, kf: KeyFrame, cand: KeyFrame, S12: np.ndarray):
        """Project loop-side local points through S12 into kf; count extra
        descriptor-gated window matches (projection through a Sim3 matrix is
        valid: u = fx x/z is invariant to the embedded scale)."""
        from pyslam_tpu.ops import slam_matching

        m = self.map
        st = m.points
        loop_pids = m.get_local_map_points([cand.kid] + cand.ordered_covisibles(10))
        if len(loop_pids) == 0:
            return 0, S12
        own = set(int(p) for p in kf.points[kf.points >= 0])
        loop_pids = np.asarray([p for p in loop_pids if int(p) not in own], np.int64)
        if len(loop_pids) == 0:
            return 0, S12
        Scw = S12 @ self._se3_to_S(cand.Tcw)  # world -> (scaled) cam1 frame
        s_scale, R, t = self._S_to_srt(Scw)
        Ow = -R.T @ (t / s_scale)
        d = st.pos[loop_pids] - Ow[None, :]
        dist = np.linalg.norm(d, axis=1)
        normals = (d / np.maximum(dist[:, None], 1e-9)).astype(np.float32)

        pos_p, valid_p = pad_bucket(st.pos[loop_pids])
        mm = len(valid_p)
        _, kp_match, _ = slam_matching.search_by_projection(
            jnp.asarray(pos_p, jnp.float32),
            jnp.asarray(pad_rows(st.desc[loop_pids], mm)),
            jnp.asarray(pad_rows(normals, mm)),
            jnp.asarray(np.zeros(mm, np.float32)),
            jnp.asarray(np.full(mm, 1e9, np.float32)),
            jnp.asarray(valid_p),
            jnp.asarray(kf.kps), jnp.asarray(kf.levels),
            jnp.asarray(kf.des), jnp.asarray(kf.valid),
            jnp.asarray(kf.kps_ur),
            jnp.asarray(Scw, jnp.float32),
            jnp.asarray(self.camera.K, jnp.float32),
            jnp.asarray(
                [self.camera.u_min, self.camera.u_max,
                 self.camera.v_min, self.camera.v_max], np.float32
            ),
            jnp.asarray(self.tracker.scale_factors),
            7.5,
            float(Parameters.kMaxDescriptorDistance),
        )
        kp_match = np.asarray(kp_match)
        n_extra = int(((kp_match >= 0) & (kp_match < len(loop_pids))).sum())
        return n_extra, S12

    # ------------------------------------------------------------ correction
    def correct_loop(self, kf: KeyFrame, cand: KeyFrame, S12: np.ndarray):
        """Propagate the Sim3 correction and optimize the essential graph."""
        # stop/drain local mapping before mutating the whole map (reference
        # LoopCorrector stops the local-mapping thread, loop_closing.py:519):
        # a pending LBA applied AFTER the Sim3 propagation would re-impose
        # pre-correction geometry
        lm = getattr(self, "local_mapping", None)
        if lm is not None:
            lm.finish()
        m = self.map
        st = m.points

        # corrected Sim3 of the current keyframe: Scw_cur = S12 * Scw_cand
        S_cand = self._se3_to_S(cand.Tcw)
        if not np.isfinite(S12).all():
            Printer.red("loop correction skipped: non-finite Sim3")
            return
        S_cur_corrected = S12 @ S_cand

        # current covisibility group (+ itself)
        group = [kf.kid] + [
            k for k in kf.ordered_covisibles() if k in m.keyframes
        ]
        Twc_cur = kf.Twc

        # snapshot old poses
        S_old = {kid: self._se3_to_S(m.keyframes[kid].Tcw) for kid in m.keyframe_order}

        corrected: dict[int, np.ndarray] = {}
        for kid in group:
            kf_i = m.keyframes[kid]
            T_ic = kf_i.Tcw @ Twc_cur  # relative to current
            corrected[kid] = self._se3_to_S(T_ic) @ S_cur_corrected

        # correct the group's map points: p' = S_new^-1 (S_old p)
        moved: set[int] = set()
        for kid in group:
            kf_i = m.keyframes[kid]
            pids = kf_i.points[kf_i.points >= 0]
            pids = pids[st.valid[pids]]
            fresh = [int(p) for p in pids if int(p) not in moved]
            if not fresh:
                continue
            moved.update(fresh)
            fresh = np.asarray(fresh)
            P = st.pos[fresh]
            S_o = S_old[kid]
            S_n = corrected[kid]
            Pm = self._sim3_apply(np.linalg.inv(S_n) @ S_o, P)
            st.pos[fresh] = Pm
            self.map.store_version += 1
        # apply corrected poses (fold scale into translation: Tcw = [R t/s])
        for kid in group:
            s, R, t = self._S_to_srt(corrected[kid])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t / s
            m.keyframes[kid].update_pose(T)

        # loop edges
        kf.loop_edges.add(cand.kid)
        cand.loop_edges.add(kf.kid)

        # fuse loop-side points into the corrected group
        self._fuse_loop_points(kf, cand)

        # essential-graph PGO
        self._essential_graph_pgo(kf, cand, S_old, corrected)

        # full GBA to polish — dispatched concurrently (reference launches
        # GBA in its own process after correction, global_bundle_adjustment
        # .py:184): chunks are polled by step() while tracking continues;
        # keyframes/points born during the solve are folded in on completion.
        # dispatch() supersedes any still-running solve from a prior loop
        # (the reference's mbStopGBA on a new loop detection).
        self.gba.dispatch(m, iters=Parameters.kOptimizerGBAIterations)

    def _fuse_loop_points(self, kf: KeyFrame, cand: KeyFrame):
        from pyslam_tpu.ops import slam_matching

        m = self.map
        st = m.points
        loop_pids = m.get_local_map_points(
            [cand.kid] + cand.ordered_covisibles(10)
        )
        if len(loop_pids) == 0:
            return
        for kid in [kf.kid] + kf.ordered_covisibles(10):
            kf_i = m.keyframes.get(kid)
            if kf_i is None:
                continue
            own = set(int(p) for p in kf_i.points[kf_i.points >= 0])
            cand_pids = np.asarray(
                [p for p in loop_pids if int(p) not in own and st.valid[int(p)]],
                np.int64,
            )
            if len(cand_pids) == 0:
                continue
            pos_p, valid_p = pad_bucket(st.pos[cand_pids])
            mm = len(valid_p)
            best_kp, _ = slam_matching.fuse_candidates(
                jnp.asarray(pos_p, jnp.float32),
                jnp.asarray(pad_rows(st.desc[cand_pids], mm)),
                jnp.asarray(pad_rows(st.normal[cand_pids], mm)),
                jnp.asarray(pad_rows(st.min_dist[cand_pids], mm)),
                jnp.asarray(pad_rows(st.max_dist[cand_pids], mm, fill=1.0)),
                jnp.asarray(valid_p),
                jnp.asarray(kf_i.kps), jnp.asarray(kf_i.levels),
                jnp.asarray(kf_i.des), jnp.asarray(kf_i.valid),
                jnp.asarray(kf_i.kps_ur),
                jnp.asarray(kf_i.Tcw, jnp.float32),
                jnp.asarray(self.camera.K, jnp.float32),
                jnp.asarray(self.camera.bf, jnp.float32),
                jnp.asarray(
                    [self.camera.u_min, self.camera.u_max,
                     self.camera.v_min, self.camera.v_max], np.float32
                ),
                jnp.asarray(self.tracker.scale_factors),
                jnp.asarray(self.tracker.sigma2),
                float(Parameters.kMaxDescriptorDistance) * 0.5,
            )
            best_kp = np.asarray(best_kp)[: len(cand_pids)]
            for row, kp_idx in enumerate(best_kp):
                if kp_idx < 0:
                    continue
                pid = int(cand_pids[row])
                existing = int(kf_i.points[kp_idx])
                if existing >= 0 and st.valid[existing]:
                    if existing != pid:
                        # loop point wins (it is older/more established)
                        m.replace_point(existing, pid)
                else:
                    m.add_observation(pid, kf_i, int(kp_idx))
            m.update_connections(kf_i)

    def _essential_graph_pgo(self, kf, cand, S_old, corrected):
        m = self.map
        kids = list(m.keyframe_order)
        row = {kid: i for i, kid in enumerate(kids)}
        V = len(kids)

        S_init = np.stack([
            corrected.get(kid, self._se3_to_S(m.keyframes[kid].Tcw))
            for kid in kids
        ])

        edges = set()
        for kid in kids:
            kf_i = m.keyframes[kid]
            if kf_i.parent is not None and kf_i.parent in row:
                edges.add((min(kid, kf_i.parent), max(kid, kf_i.parent)))
            for le in kf_i.loop_edges:
                if le in row:
                    edges.add((min(kid, le), max(kid, le)))
            for nkid, w in kf_i.connected_keyframes.items():
                if w >= 100 and nkid in row:
                    edges.add((min(kid, nkid), max(kid, nkid)))
        edges = sorted(edges)
        if not edges:
            return
        ei = np.asarray([row[a] for a, b in edges], np.int32)
        ej = np.asarray([row[b] for a, b in edges], np.int32)
        # measurements from PRE-correction poses, except the loop edge and
        # edges internal to the corrected group (post-correction relative)
        S_meas = []
        group = set(corrected.keys())
        for (a, b) in edges:
            if a in group and b in group:
                Sa, Sb = corrected[a], corrected[b]
            elif (a == kf.kid and b == cand.kid) or (a == cand.kid and b == kf.kid):
                Sa = corrected.get(a, S_old[a])
                Sb = corrected.get(b, S_old[b])
            else:
                Sa, Sb = S_old[a], S_old[b]
            S_meas.append(Sa @ np.linalg.inv(Sb))
        S_meas = np.stack(S_meas)

        fixed = np.zeros(V, bool)
        fixed[row[cand.kid]] = True

        S_opt = optim.pose_graph_optimize(
            jnp.asarray(S_init, jnp.float64),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(S_meas, jnp.float64),
            jnp.ones((len(edges),), bool),
            jnp.asarray(fixed),
            iters=Parameters.kOptimizerPGOIterations,
            fix_scale=self.sensor_type != SensorType.MONOCULAR,
        )
        S_opt = np.asarray(S_opt)
        if not np.isfinite(S_opt).all():
            Printer.red("PGO diverged (non-finite poses): discarding correction")
            return

        # write back: points corrected by their reference KF's delta
        st = m.points
        pid_ref_kid = {}
        for pid in st.alive_ids():
            obs = m.observations.get(int(pid))
            if obs:
                pid_ref_kid[int(pid)] = min(obs.keys())
        for pid, ref_kid in pid_ref_kid.items():
            if ref_kid not in row:
                continue
            i = row[ref_kid]
            S_o = corrected.get(ref_kid, S_old.get(ref_kid))
            if S_o is None:
                continue
            delta = np.linalg.inv(S_opt[i]) @ S_o
            st.pos[pid] = self._sim3_apply(delta, st.pos[pid][None, :])[0]
            self.map.store_version += 1
        for kid in kids:
            s, R, t = self._S_to_srt(S_opt[row[kid]])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t / s
            m.keyframes[kid].update_pose(T)

    # --------------------------------------------------------------- helpers
    @staticmethod
    def _se3_to_S(T: np.ndarray) -> np.ndarray:
        return np.asarray(T, np.float64).copy()

    @staticmethod
    def _S_to_srt(S: np.ndarray):
        sR = S[:3, :3]
        s = np.cbrt(np.linalg.det(sR))
        return s, sR / s, S[:3, 3]

    @staticmethod
    def _sim3_apply(S: np.ndarray, pts: np.ndarray) -> np.ndarray:
        return pts @ S[:3, :3].T + S[:3, 3]

    # ------------------------------------------------------------- interface
    def wait_if_closing(self):
        pass  # synchronous scheduler: nothing to wait for
