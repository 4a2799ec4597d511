"""Local mapping back-end (reference: pySLAM ``pyslam/slam/local_mapping.py``
+ ``local_mapping_core.py``).

Per new keyframe: associate/refresh map points -> cull recent points ->
triangulate new points against covisible neighbors (epipolar-gated dense
matching on device) -> fuse duplicates -> local bundle adjustment (Schur LM
over the covisibility window) -> cull redundant keyframes (90% rule).

Scheduling: the reference runs this on a thread so tracking overlaps the
back-end (``local_mapping.py:244-246``), with an abort flag letting tracking
interrupt a long LBA when a new keyframe is pending (``tracking.py:906-907``,
``optimizer_g2o.py:614-853``).  The TPU-native equivalent keeps ONE host
thread and gets the overlap from JAX async dispatch instead: each tracked
frame advances the back-end by one bounded slice (``step_async``) — host
stages (associate/triangulate/fuse) run one per frame, and the LBA is
dispatched to the device in iteration CHUNKS whose results are only polled
(``jax.Array.is_ready``), never awaited.  Tracking latency on keyframe
frames is therefore bounded by the largest single slice, not the whole
pipeline; the device crunches LBA chunks while the host tracks the next
frames.  ``push_keyframe`` with an LBA in flight sets ``opt_abort_flag``:
no further chunks are dispatched and the partial result is applied — the
same early-termination semantics as the reference's g2o abort flag.
"""

from __future__ import annotations

import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.ops import geometry, optim, slam_matching
from pyslam_tpu.slam.frame import KeyFrame
from pyslam_tpu.slam.map import Map
from pyslam_tpu.utils.logging import Printer
from pyslam_tpu.utils.profiling import device_counters
from pyslam_tpu.utils.padding import (
    bucket_size,
    bucket_size_linear,
    cap_select,
    fixed_shapes,
    pad_fixed,
    pad_rows,
    pow2,
)


class LocalMapping:
    def __init__(self, slam_map: Map, camera, sensor_type: SensorType,
                 feature_tracker=None):
        self.map = slam_map
        self.camera = camera
        self.sensor_type = sensor_type
        self.tracker = feature_tracker
        self.queue: deque[KeyFrame] = deque()
        self.recent_pids: list[int] = []
        self.kf_cur: KeyFrame | None = None
        self.opt_abort_flag = False
        self.time_lba = 0.0
        # async scheduler state: the keyframe job being advanced slice-by-
        # slice, and the in-flight chunked LBA (device futures + metadata)
        self._job: KeyFrame | None = None
        self._job_stage = 0
        self._tri_job: dict | None = None    # in-flight triangulation match
        self._fuse_job: dict | None = None   # in-flight fuse match
        self._lba: dict | None = None
        self.lba_chunks_aborted = 0   # observability for the abort test
        self._kf_count = 0            # processed keyframes (large-BA cadence)
        self._next_large_ba = 0       # kf-count threshold for the next one
        from pyslam_tpu.utils.profiling import StageTimings

        self.timings = StageTimings("local_mapping")
        self.loop_closing = None            # injected by Slam
        self.volumetric_integrator = None   # injected by Slam
        self.semantic_mapping = None        # injected by Slam
        # session-fixed shape caps (TPU policy, see utils/padding.py)
        n_feat = (
            feature_tracker.num_features
            if feature_tracker is not None
            else Parameters.kNumFeatures
        )
        self._cap_kps = pow2(n_feat)
        self._cap_map = pow2(Parameters.kTrackLocalMapMaxPoints)
        # device-resident stacked keyframe store for the batch matchers
        # (slam/kf_device_store.py): rows written once per keyframe, the
        # tri/fuse dispatches gather them in-graph — replaces per-call
        # jnp.stack of per-frame handles (VERDICT r4 ask #4)
        self._kf_store = None

    def _kf_rows(self, kfs):
        """Store rows for keyframes (uploading misses); None when the
        keyframes don't share the store's session shape."""
        from pyslam_tpu.slam.kf_device_store import KFDeviceStore

        kf0 = kfs[0]
        N, D = kf0.kps.shape[0], kf0.des.shape[1]
        if any(k.kps.shape[0] != N or k.des.shape[1] != D for k in kfs):
            return None
        ks = self._kf_store
        if ks is None or ks.N != N or ks.D != D:
            self._kf_store = ks = KFDeviceStore(
                32, N, D, jnp.asarray(kf0.des[:1, :1]).dtype
            )
        if len(kfs) > ks.B:
            return None
        return ks.rows_for(kfs)

    # --------------------------------------------------------------- queue
    def push_keyframe(self, kf: KeyFrame):
        # interrupt protocol: a newly pending keyframe aborts the in-flight
        # LBA (reference tracking.py:906-907 -> g2o abort flag) so the
        # back-end reaches the fresh keyframe promptly
        if self._lba is not None:
            self.opt_abort_flag = True
        self.queue.append(kf)

    def is_idle(self) -> bool:
        return (
            len(self.queue) == 0
            and self._job is None
            and self._lba is None
        )

    def accepts_keyframes(self) -> bool:
        """Whether a new keyframe can be digested promptly — the signal the
        keyframe policy needs (reference ``local_mapping.is_idle`` on its
        thread).  An in-flight LBA does NOT count as busy here: it is an
        asynchronously polled device job that ``push_keyframe`` aborts at the
        next chunk boundary, so it never delays accepting a keyframe the way
        a busy mapping THREAD does in the reference.  Gating insertion on
        LBA completion starves the map (LBA windows span multiple frames on
        a remote accelerator).  Likewise a job whose triangulation has
        already harvested (stage >= 3: fuse/LBA remain) counts as accepting:
        its new map points exist, and the polled fuse/LBA tails span several
        frames each — holding keyframes for them starved the map on TPU
        (37/120 frames tracked when this gated on job completion)."""
        if self.sensor_type == SensorType.MONOCULAR:
            # monocular quality hinges on every keyframe's LBA landing
            # un-aborted (scale drifts otherwise): a busy job defers the
            # next keyframe, like the reference's mono policy
            return len(self.queue) == 0 and self._job is None
        return len(self.queue) == 0 and (
            self._job is None or self._job_stage >= 3
        )

    def queue_size(self) -> int:
        return len(self.queue)

    # ------------------------------------------------------- async schedule
    # job slices: 0=associate+cull (host bookkeeping), 1=tri-dispatch,
    # 2=tri-harvest (polled), 3=fuse-dispatch, 4=fuse-harvest (polled),
    # 5=lba dispatch, 6=cull_kfs + handoff (the dispatched LBA stays in
    # flight; _lba_poll services its chunks and applies the result
    # independently of the job).  Associate and tri-dispatch are separate
    # slices on purpose: together they were a single 150-300 ms host stage
    # — the largest single block the frame loop could stall behind.
    _N_SLICES = 7

    def step_async(self, start_new_jobs: bool = True) -> bool:
        """Advance the back-end (call once per tracked frame).  Never blocks
        on the device: consumes all progress available WITHOUT waiting — host
        slices, plus LBA chunk transitions whose results are already ready —
        then yields to tracking.  Returns True if any work was done.

        Host slices run under a WALL-CLOCK budget rather than one-per-frame:
        the reference's mapping thread digests a keyframe within a frame or
        two, and the keyframe policy (``need_new_keyframe``) relies on the
        back-end going idle quickly — a fixed one-slice cadence kept
        ``is_idle()`` false for ~4 frames after every keyframe, which
        throttled keyframe insertion and starved the map (stereo/RGBD never
        inserts while the back-end is busy, reference tracking.py:903-916).
        The first slice always runs; further slices run while under budget,
        so per-frame host latency stays bounded by budget + one slice.

        On the CPU test backend the budget is counted in SLICES instead of
        wall time (one full keyframe job per frame): wall-clock budgets make
        keyframe cadence — and through it tracking quality — depend on
        machine load, which made CPU tests flaky."""
        did = False
        t0 = time.perf_counter()
        budget = Parameters.kLocalMappingHostBudgetMs * 1e-3
        from pyslam_tpu.utils.padding import fixed_shapes

        wall_budget = fixed_shapes()   # accelerators: real-time bound
        max_slices = 1 if budget <= 0 else self._N_SLICES
        n_slices = 0
        import os as _os

        _dbg = _os.environ.get("PYSLAM_FRAME_TIMELINE") == "1"
        _trace: list[tuple[int, float]] = []
        for _ in range(64):   # progress budget (each iteration is bounded)
            # LBA chunks are serviced alongside the job slices, not in front
            # of them: waiting for the whole chunked LBA before letting the
            # job finish (cull + handoff) stretched every keyframe job to
            # 5+ frames, which throttled keyframe insertion through the
            # queue cap and thinned map coverage (tracking losses on the
            # 60-frame TPU stereo run).  _lba_apply already guards against
            # keyframes culled while its chunks were in flight.
            if self._lba is not None and self._lba_poll(block=False):
                did = True
                continue      # chunk transition done: poll again
            if self._job is None:
                if not self.queue or not start_new_jobs:
                    break
                self._job = self.queue.popleft()
                self._job_stage = 0
                self.kf_cur = self._job
            over = (
                (time.perf_counter() - t0 > budget)
                if wall_budget
                else (n_slices >= max_slices)
            )
            # stage 1 (triangulation dispatch) is budget-EXEMPT: it now
            # costs ~10-20 ms host (keyframe-store row gathers — no stacks,
            # no uploads) and deferring it a frame delays the keyframe's new
            # map points exactly when tracking needs them most (the map ages
            # out of view within 2-3 frames on fast turns)
            if did and over and self._job_stage != 1:
                break
            # bootstrap: while the map is tiny, tracking quality depends on
            # each keyframe's points landing before the next frame — run the
            # job synchronously (polled stages would stretch it over several
            # frames and starve the young map)
            bootstrap = self.map.num_keyframes() <= 4
            _ts = time.perf_counter()
            _stage = self._job_stage
            if not self._advance_slice(block=bootstrap):
                break      # stage waiting on an in-flight device result
            if _dbg:
                _trace.append((_stage, time.perf_counter() - _ts))
            n_slices += 1
            did = True
        if _dbg and (time.perf_counter() - t0) > 0.1:
            print(
                "[tl-lm] "
                + " ".join(f"s{s}:{1e3*d:.0f}" for s, d in _trace)
                + f" total={1e3*(time.perf_counter()-t0):.0f}",
                flush=True,
            )
        return did

    def harvest(self) -> bool:
        """Apply back-end device results that are ALREADY ready (LBA chunk
        transitions, triangulation/fuse harvests whose futures resolved
        while the previous frame was on the host) and issue the follow-on
        dispatches.  Never blocks, never STARTS a new keyframe job — called
        right before tracking a new frame so (a) refinements are visible and
        (b) the in-flight job advances twice per frame instead of once
        (one-advance-per-frame stretched a job over ~8 frames, which
        throttled keyframe insertion through the queue cap and starved the
        map on the TPU bench)."""
        return self.step_async(start_new_jobs=False)

    def interrupt_optimization(self):
        """Tracking-side interrupt: a keyframe is needed NOW (reference
        ``tracking.py:906-907`` -> g2o abort flag).  The in-flight LBA stops
        after its current chunk; a not-yet-dispatched LBA is skipped."""
        self.opt_abort_flag = True

    def _advance_slice(self, block: bool = False):
        """Advance the keyframe job one stage.  Device-readback stages
        (triangulation/fuse harvests) POLL their futures and return False
        when still in flight — the frame loop never blocks behind queued
        device work (``block=True`` restores synchronous semantics for the
        drain/test paths).  Returns True if the stage ran."""
        kf = self._job
        t = self.timings
        s = self._job_stage
        if s == 0:
            with t.stage("process_kf"):
                self.process_new_keyframe(kf)
            with t.stage("cull_points"):
                self.cull_map_points()
        elif s == 1:
            with t.stage("tri_dispatch"):
                self._tri_job = self._tri_dispatch(kf)
            self._job_stage = 2 if self._tri_job is not None else 3
            return True
        elif s == 2:
            job = self._tri_job
            fut = job["fut"] if "fut" in job else job["fut_list"][-1]
            if block:
                jax.block_until_ready(fut)
            elif not fut.is_ready():
                return False
            with t.stage("triangulate"):
                self._tri_job = None
                self._tri_harvest(kf, job)
        elif s == 3:
            with t.stage("fuse_dispatch"):
                self._fuse_job = self._fuse_dispatch(kf)
            self._job_stage = 4 if self._fuse_job is not None else 5
            return True
        elif s == 4:
            job = self._fuse_job
            fut = job["parts"][-1][0]
            if block:
                jax.block_until_ready(fut)
            elif not fut.is_ready():
                return False
            with t.stage("fuse"):
                self._fuse_job = None
                self._fuse_harvest(kf, job)
        elif s == 5:
            if self._lba is not None:
                # LBA slot still busy (previous window's chunks in flight):
                # wait for it — push_keyframe already set the abort flag if
                # a newer keyframe is pending, so the slot frees quickly
                if block:
                    while self._lba is not None:
                        self._lba_poll(block=True)
                else:
                    return False
            if self.map.num_keyframes() > 2:
                with t.stage("lba_dispatch"):
                    self._lba_dispatch(kf)
            self._job_stage = 6
            return True
        elif s >= 6:
            with t.stage("cull_kfs"):
                self.cull_keyframes(kf)
            self._trim_device_caches(kf)
            # hand the keyframe onward (reference local_mapping.py:488-513)
            if self.loop_closing is not None:
                self.loop_closing.add_keyframe(kf)
            if self.semantic_mapping is not None:
                self.semantic_mapping.add_keyframe(kf)
            if self.volumetric_integrator is not None:
                self.volumetric_integrator.add_keyframe(kf)
            self._job = None
            # periodic large-window BA (reference local_mapping.py:467-476
            # runs it on its own thread every kEveryNumFramesLargeWindowBA
            # keyframes): dispatch a wider-window LBA through the same async
            # chunk machinery — it occupies the LBA slot and is polled like
            # any other, so tracking latency stays bounded.  Deferred cadence:
            # if the slot is busy at the threshold, run at the first idle
            # opportunity instead of skipping the period.
            self._kf_count += 1
            if self._next_large_ba == 0:
                self._next_large_ba = Parameters.kEveryNumFramesLargeWindowBA
            if (
                Parameters.kUseLargeWindowBA
                and self._lba is None
                and not self.queue
                and self._kf_count >= self._next_large_ba
                and self.map.num_keyframes() > 4
            ):
                self._next_large_ba = (
                    self._kf_count + Parameters.kEveryNumFramesLargeWindowBA
                )
                with t.stage("large_ba_dispatch"):
                    self._lba_dispatch(
                        kf, window_size=Parameters.kLargeBAWindowSize
                    )
            return True
        self._job_stage = s + 1
        return True

    def _trim_device_caches(self, kf: KeyFrame):
        """Bound HBM use: free per-KF device caches (descriptor blocks etc.)
        outside the new keyframe's covisibility neighborhood.  ``Frame.dev``
        transparently re-uploads on next use, so this is purely a
        memory/bandwidth trade — without it, HBM grows ~N*D bytes per live
        keyframe for the life of the session (advisor r03)."""
        keep = set(kf.ordered_covisibles(Parameters.kLocalBAWindowSize))
        keep.add(kf.kid)
        keep.update(self.map.keyframe_order[-4:])
        for kid in self.map.keyframe_order:
            if kid not in keep:
                other = self.map.keyframes.get(kid)
                if other is not None and other._dev_cache:
                    other.drop_device_cache()

    def finish(self):
        """Drain the back-end completely (blocking).  Used at sequence end,
        before loop corrections/GBA, and by the synchronous test path."""
        while self._job is not None or self.queue or self._lba is not None:
            if self._job is None and self._lba is None:
                self._job = self.queue.popleft()
                self._job_stage = 0
                self.kf_cur = self._job
            self._drain_current_job()

    def _drain_current_job(self):
        while self._job is not None or self._lba is not None:
            if self._lba is not None:
                self._lba_poll(block=True)
            else:
                self._advance_slice(block=True)

    # synchronous compatibility surface
    def step(self) -> bool:
        """Process one queued keyframe to completion; True if work done."""
        if self._job is not None or self._lba is not None:
            self._drain_current_job()
            return True
        if not self.queue:
            return False
        self._job = self.queue.popleft()
        self._job_stage = 0
        self.kf_cur = self._job
        self._drain_current_job()
        return True

    def run_all(self):
        self.finish()

    # ---------------------------------------------------------------- core
    def do_local_mapping(self, kf: KeyFrame):
        """Synchronous single-keyframe pipeline (tests / direct callers)."""
        assert self._job is None and self._lba is None
        self._job = kf
        self._job_stage = 0
        self.kf_cur = kf
        self._drain_current_job()

    # ------------------------------------------------- process_new_keyframe
    def process_new_keyframe(self, kf: KeyFrame):
        """Associate tracked points, refresh normals/descriptors (reference
        ``local_mapping_core.py:110``)."""
        pids = kf.points[kf.points >= 0]
        for pid, ki in zip(pids, np.nonzero(kf.points >= 0)[0]):
            self.map.add_observation(int(pid), kf, int(ki))
        self.map.update_point_descriptors_and_normals(np.unique(pids))
        self.map.update_connections(kf)
        # points created recently (for culling window)
        fresh = pids[self.map.points.first_kid[pids] >= kf.kid - 2]
        self.recent_pids = list(np.unique(np.concatenate([
            np.asarray(self.recent_pids, np.int64), fresh
        ])))

    # ------------------------------------------------------ cull_map_points
    def cull_map_points(self):
        """Found-ratio + observation-count culling (reference
        ``local_mapping_core.py:128``)."""
        if not self.recent_pids or self.kf_cur is None:
            return
        st = self.map.points
        keep = []
        for pid in self.recent_pids:
            if not st.valid[pid]:
                continue
            found_ratio = st.n_found[pid] / max(st.n_visible[pid], 1)
            age = self.kf_cur.kid - st.first_kid[pid]
            if found_ratio < Parameters.kMapPointCullingMinFoundRatio:
                self.map.delete_point(pid)
            elif age >= 2 and st.num_obs[pid] <= (
                2 if self.sensor_type != SensorType.MONOCULAR else 2
            ):
                self.map.delete_point(pid)
            elif age >= 3:
                pass  # survived probation
            else:
                keep.append(pid)
        self.recent_pids = keep

    # ------------------------------------------------- create_new_map_points
    def create_new_map_points(self, kf: KeyFrame):
        """Blocking wrapper: dispatch + immediate harvest (sync paths)."""
        job = self._tri_dispatch(kf)
        if job is None:
            return 0
        return self._tri_harvest(kf, job)

    def _tri_dispatch(self, kf: KeyFrame):
        """Epipolar search + triangulation with covisible neighbors
        (reference ``local_mapping.py:560``) — DISPATCH half.

        All covisible neighbors are matched in ONE vmapped device dispatch
        (:func:`ops.slam_matching.epipolar_triangulation_match_batch`); the
        result is NOT read back here — the async scheduler polls it and runs
        :meth:`_tri_harvest` when ready, so the readback never blocks the
        frame loop behind other queued device work.  Triangulation (host f64
        DLT — a jnp f64 request truncates to f32 on TPU and the DLT
        eigensolve noise inflates drift measurably) and the acceptance gates
        run on host at harvest time."""
        n_neighbors = (
            Parameters.kLocalMappingNumNeighborKeyFramesMonocular
            if self.sensor_type == SensorType.MONOCULAR
            else Parameters.kLocalMappingNumNeighborKeyFramesStereo
        )
        neighbor_kids = kf.ordered_covisibles(n_neighbors)
        cam = self.camera

        # ---- host prep per neighbor: baseline gate, fundamental, epipole
        neighbors = []   # (kf2, F_21, epipole2)
        for kid2 in neighbor_kids:
            kf2 = self.map.keyframes.get(kid2)
            if kf2 is None or kf2.is_bad:
                continue
            # baseline check: skip if baseline too small vs scene depth
            baseline = np.linalg.norm(kf2.Ow - kf.Ow)
            if self.sensor_type == SensorType.MONOCULAR:
                pids2 = kf2.points[kf2.points >= 0]
                if len(pids2) > 0:
                    pc = (kf2.Tcw[:3, :3] @ self.map.points.pos[pids2].T).T + kf2.Tcw[:3, 3]
                    med_depth = np.median(pc[:, 2]) if len(pc) else 1.0
                else:
                    med_depth = 1.0
                if baseline / max(med_depth, 1e-6) < Parameters.kMinRatioBaselineDepth:
                    continue
            elif baseline < cam.b:
                continue
            # F21 such that x2^T F x1 = 0 with T_21 = cam1->cam2 (host 3x3)
            T21 = kf2.Tcw @ np.linalg.inv(kf.Tcw)
            F = geometry.fundamental_np(T21, cam.K, cam.K).astype(np.float32)
            # epipole of kf's center in kf2 image
            c1_in_2 = kf2.Tcw[:3, :3] @ kf.Ow + kf2.Tcw[:3, 3]
            if abs(c1_in_2[2]) < 1e-6:
                epi = np.array([1e6, 1e6], np.float32)
            else:
                epi = np.array(
                    [
                        cam.fx * c1_in_2[0] / c1_in_2[2] + cam.cx,
                        cam.fy * c1_in_2[1] / c1_in_2[2] + cam.cy,
                    ],
                    np.float32,
                )
            neighbors.append((kf2, F, epi))
        if not neighbors:
            return None

        sigma2 = jnp.asarray(self.tracker.sigma2)
        free1 = (kf.points < 0) & kf.valid & ~kf.outliers
        max_dist = float(Parameters.kMaxDescriptorDistance)
        rows = (
            self._kf_rows([n[0] for n in neighbors])
            if neighbors[0][0].kps.shape == kf.kps.shape
            and neighbors[0][0].des.shape == kf.des.shape
            else None
        )
        if rows is not None:
            # one batched dispatch over the neighbor axis, padded to the
            # FIXED covisibility cap (pad rows repeat row 0 with free2=False
            # so they match nothing).  A fixed pad width means exactly ONE
            # compiled graph per config for the life of the run.  Neighbor
            # payloads are gathered IN-GRAPH from the device-resident
            # keyframe store (one row write per keyframe's lifetime) — only
            # row indices, the small free masks (mutable: they depend on
            # current point assignments) and the 3x3 F / epipole blocks
            # cross the tunnel here.
            B = len(neighbors)
            Bp = max(2, n_neighbors)
            pad = Bp - B
            rows_p = np.concatenate([rows, np.full(pad, rows[0], np.int32)])
            free2 = np.stack(
                [(n[0].points < 0) & n[0].valid & ~n[0].outliers
                 for n in neighbors]
                + [np.zeros_like(neighbors[0][0].valid, bool)] * pad
            )
            Fs = np.stack([n[1] for n in neighbors] + [neighbors[0][1]] * pad)
            epis = np.stack([n[2] for n in neighbors] + [neighbors[0][2]] * pad)
            ks = self._kf_store
            device_counters.dispatches += 1
            idx2_dev = slam_matching.epipolar_triangulation_match_kfstore(
                kf.dev("kps"), kf.dev("levels"), kf.dev("des"),
                jnp.asarray(free1),
                ks.kps, ks.levels, ks.des,
                jnp.asarray(rows_p),
                jnp.asarray(free2),
                jnp.asarray(Fs, jnp.float32), jnp.asarray(epis, jnp.float32),
                sigma2, max_dist,
            )
            return {"fut": idx2_dev, "neighbors": neighbors, "B": B}
        else:
            # mixed extraction shapes (e.g. after a config change): fall back
            # to one dispatch per neighbor (futures, harvested together)
            futs = []
            for kf2, F, epi in neighbors:
                free2 = (kf2.points < 0) & kf2.valid & ~kf2.outliers
                device_counters.dispatches += 1
                idx2, _ = slam_matching.epipolar_triangulation_match(
                    jnp.asarray(kf.kps), jnp.asarray(kf.levels),
                    jnp.asarray(kf.des), jnp.asarray(free1),
                    jnp.asarray(kf2.kps), jnp.asarray(kf2.levels),
                    jnp.asarray(kf2.des), jnp.asarray(free2),
                    jnp.asarray(F, jnp.float32), jnp.asarray(epi),
                    sigma2, max_dist,
                )
                futs.append(idx2)
            return {"fut_list": futs, "neighbors": neighbors}

    def _tri_harvest(self, kf: KeyFrame, job: dict) -> int:
        """Host half after the match futures resolved: DLT + map insert."""
        neighbors = job["neighbors"]
        device_counters.readbacks += 1
        if "fut" in job:
            idx2_all = np.asarray(job["fut"])[: job["B"]]
        else:
            idx2_all = [np.asarray(f) for f in job["fut_list"]]
        total_new = 0
        for b, (kf2, F, epi) in enumerate(neighbors):
            total_new += self._triangulate_pairs(kf, kf2, idx2_all[b])
        if total_new:
            self.map.update_connections(kf)
        return total_new

    def _triangulate_pairs(self, kf: KeyFrame, kf2: KeyFrame, idx2) -> int:
        """Host half of triangulation for one neighbor: pair selection
        (re-checked against keypoint slots claimed by earlier neighbors in
        this round, since the batched match saw the pre-round free masks),
        f64 DLT, acceptance gates, map insertion."""
        cam = self.camera
        i1 = np.nonzero(idx2 >= 0)[0]
        if len(i1) == 0:
            return 0
        i2 = idx2[i1]
        still_free = (kf.points[i1] < 0) & (kf2.points[i2] < 0)
        i1, i2 = i1[still_free], i2[still_free]
        if len(i1) == 0:
            return 0

        xy1 = np.asarray(cam.unproject_points(kf.kps[i1]))
        xy2 = np.asarray(cam.unproject_points(kf2.kps[i2]))
        pts = geometry.triangulate_dlt_np(kf.Tcw, kf2.Tcw, xy1, xy2)
        sig1 = self.tracker.sigma2[kf.levels[i1]] / cam.fx**2
        sig2 = self.tracker.sigma2[kf2.levels[i2]] / cam.fx**2
        ok = geometry.triangulation_checks_np(
            pts, kf.Tcw, kf2.Tcw, xy1, xy2, sig1, sig2,
            cos_max_parallax=Parameters.kCosMaxParallax,
        )
        # scale-consistency check between the two observations
        d1 = np.linalg.norm(pts - kf.Ow, axis=1)
        d2 = np.linalg.norm(pts - kf2.Ow, axis=1)
        sf = self.tracker.scale_factors
        ratio_dist = d2 / np.maximum(d1, 1e-9)
        ratio_octave = sf[kf.levels[i1]] / sf[kf2.levels[i2]]
        rf = Parameters.kScaleConsistencyFactor
        ok &= (ratio_dist < ratio_octave * rf) & (ratio_dist * rf > ratio_octave)

        sel = np.nonzero(ok)[0]
        if len(sel) == 0:
            return 0
        pids = self.map.add_points_for_keyframe(
            kf, i1[sel], pts[sel], kf2=kf2, kp_idxs2=i2[sel]
        )
        self.map.update_point_descriptors_and_normals(pids)
        self.recent_pids.extend(int(p) for p in pids)
        return len(pids)

    # --------------------------------------------------------- fuse (device)
    def fuse_map_points(self, kf: KeyFrame):
        """Blocking wrapper: dispatch + immediate harvest (sync paths)."""
        job = self._fuse_dispatch(kf)
        if job is None:
            return
        self._fuse_harvest(kf, job)

    def _fuse_dispatch(self, kf: KeyFrame):
        """Project neighbors' points into kf and vice versa; merge duplicates
        (reference ``geometry_matchers.search_and_fuse:662``) — DISPATCH
        half; the async scheduler polls the futures and applies the merges in
        :meth:`_fuse_harvest` (both match directions are dispatched together
        from the SAME pre-fuse point assignments; re-fusing a point the other
        direction already bound is a no-op in harvest).

        TWO device round trips total, and (the remote-TPU-critical part)
        near-ZERO upload: candidate map points are gathered IN-GRAPH from the
        device-resident point store (``Map.device_store``) via (M,) index +
        (B,M) mask payloads, and target keyframes feed their keypoint arrays
        through their cached device handles (``Frame.dev``) — the multi-MB
        descriptor blocks never re-cross the tunnel
        (:func:`ops.slam_matching.fuse_candidates_store_batch`)."""
        neighbor_kids = kf.ordered_covisibles(10)
        if not neighbor_kids:
            return
        st = self.map.points
        store = self.map.device_store()
        shared_args = (
            jnp.asarray(self.camera.K, jnp.float32),
            jnp.asarray(self.camera.bf, jnp.float32),
            jnp.asarray(
                [self.camera.u_min, self.camera.u_max,
                 self.camera.v_min, self.camera.v_max], jnp.float32
            ),
            jnp.asarray(self.tracker.scale_factors),
            jnp.asarray(self.tracker.sigma2),
            float(Parameters.kMaxDescriptorDistance) * 0.5,
        )

        def dispatch(cand_idx, valid_rows, targets):
            """One store-indexed device call: shared candidate rows
            (cand_idx, padded) x per-target masks x target keyframes.
            Returns the DEVICE result (no readback here).  Target payloads
            are gathered in-graph from the keyframe device store when the
            shapes match (rows is not None); the stacked fallback keeps
            mixed-shape sessions working."""
            device_counters.dispatches += 1
            rows = self._kf_rows(targets)
            if rows is not None:
                ks = self._kf_store
                best, _ = slam_matching.fuse_candidates_kfstore(
                    *store,
                    jnp.asarray(cand_idx, jnp.int32),
                    jnp.asarray(np.stack(valid_rows)),
                    ks.kps, ks.levels, ks.des, ks.valid, ks.kps_ur,
                    jnp.asarray(rows),
                    jnp.asarray(
                        np.stack([t.Tcw for t in targets]).astype(np.float32)
                    ),
                    *shared_args,
                )
                return best
            best, _ = slam_matching.fuse_candidates_store_batch(
                *store,
                jnp.asarray(cand_idx, jnp.int32),
                jnp.asarray(np.stack(valid_rows)),
                jnp.stack([t.dev("kps") for t in targets]),
                jnp.stack([t.dev("levels") for t in targets]),
                jnp.stack([t.dev("des") for t in targets]),
                jnp.stack([t.dev("valid") for t in targets]),
                jnp.stack([t.dev("kps_ur") for t in targets]),
                jnp.asarray(
                    np.stack([t.Tcw for t in targets]).astype(np.float32)
                ),
                *shared_args,
            )
            return best

        # each entry: (future, targets: [KeyFrame], cand_pids)
        parts = []

        # ---- neighbors' points into kf: one B=1 dispatch, M = map cap
        neigh_pids = np.asarray(
            self.map.get_local_map_points(neighbor_kids), np.int64
        )
        own = kf.points[kf.points >= 0]
        cand = neigh_pids[~np.isin(neigh_pids, own)]
        if len(cand):
            cand = cap_select(
                cand, self._cap_map, score=st.num_obs[cand]
            )
            idx_p, vmask = pad_fixed(
                cand.astype(np.int32), self._cap_map, fill=-1
            )
            parts.append((dispatch(idx_p, [vmask], [kf]), [kf], cand))

        # ---- kf's points into the neighbors: the SAME candidate rows (kf's
        # points) for every target, filtered per target by an activity mask;
        # uniform-shape neighbors share ONE vmapped dispatch
        kf_pids = kf.points[kf.points >= 0]
        kf_pids = np.unique(kf_pids[st.valid[kf_pids]])
        if len(kf_pids):
            idx2_p, vmask2 = pad_fixed(
                kf_pids.astype(np.int32), self._cap_kps, fill=-1
            )
            kf_pids = kf_pids[: len(idx2_p)]
            uniform, mask_rows = [], []
            for kid2 in neighbor_kids:
                kf2 = self.map.keyframes.get(kid2)
                if kf2 is None:
                    continue
                keep = ~np.isin(kf_pids, kf2.points[kf2.points >= 0])
                if not keep.any():
                    continue
                row = vmask2.copy()
                row[: len(kf_pids)] &= keep
                if (kf2.kps.shape != kf.kps.shape
                        or kf2.des.shape != kf.des.shape):
                    parts.append((dispatch(idx2_p, [row], [kf2]),   # mixed
                                  [kf2], kf_pids))
                else:
                    uniform.append(kf2)
                    mask_rows.append(row)
            if uniform:
                # fixed neighbor axis on TPU: one compile per session
                Bp = (max(10, len(uniform)) if fixed_shapes()
                      else bucket_size(len(uniform), minimum=2))
                pad = Bp - len(uniform)
                targets = uniform + [uniform[0]] * pad
                rows = mask_rows + [np.zeros_like(mask_rows[0])] * pad
                parts.append((dispatch(idx2_p, rows, targets), uniform,
                              kf_pids))
        if not parts:
            return None
        return {"parts": parts}

    def _fuse_harvest(self, kf: KeyFrame, job: dict):
        """Apply the fuse matches (merge duplicates / add observations)."""
        st = self.map.points

        def harvest(target_kf: KeyFrame, cand_pids: np.ndarray, best_kp):
            for row, kp_idx in enumerate(best_kp):
                if kp_idx < 0:
                    continue
                pid = int(cand_pids[row])
                if not st.valid[pid]:
                    continue
                existing = int(target_kf.points[kp_idx])
                if existing >= 0 and st.valid[existing]:
                    if existing == pid:
                        continue
                    # keep the point with more observations
                    if st.num_obs[existing] >= st.num_obs[pid]:
                        self.map.replace_point(pid, existing)
                    else:
                        self.map.replace_point(existing, pid)
                else:
                    self.map.add_observation(pid, target_kf, int(kp_idx))

        for fut, targets, cand_pids in job["parts"]:
            device_counters.readbacks += 1
            best = np.asarray(fut)
            for j, kf2 in enumerate(targets):
                harvest(kf2, cand_pids, best[j, : len(cand_pids)])

        self.map.update_point_descriptors_and_normals(
            np.unique(kf.points[kf.points >= 0])
        )
        self.map.update_connections(kf)

    def _collect_ba_observations(self, local_pids, kid_to_row, all_kids):
        """BA edge-list assembly: (cam_idx, pt_idx, uv, ur, sigma2) arrays.

        The edge dump comes from the native C++ observation graph in one pass
        (``og_collect_observations``; pure-Python fallback otherwise); the
        per-observation measurements are then VECTORIZED gathers from per-
        keyframe arrays stacked along a camera axis — no Python loop over
        observations (the reference assembles these edges in C++ too,
        ``optimizer_g2o.cpp``)."""
        m = self.map
        if m._native is not None:
            pt_rows, kids_arr, kp_arr = m._native.collect_observations(local_pids)
        else:
            pt_l, kid_l, kp_l = [], [], []
            for i, pid in enumerate(local_pids):
                for kid, kp_idx in m.observations.get(int(pid), {}).items():
                    pt_l.append(i)
                    kid_l.append(kid)
                    kp_l.append(kp_idx)
            pt_rows = np.asarray(pt_l, np.int64)
            kids_arr = np.asarray(kid_l, np.int32)
            kp_arr = np.asarray(kp_l, np.int32)
        if len(pt_rows) == 0:
            return (np.zeros(0, np.int32),) * 2 + (
                np.zeros((0, 2), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.float32),
            )

        max_kid = max(kid_to_row)
        lut = np.full(max_kid + 1, -1, np.int32)
        for kid, row in kid_to_row.items():
            lut[kid] = row
        ok = kids_arr <= max_kid
        cam = np.where(ok, lut[np.clip(kids_arr, 0, max_kid)], -1)
        ok &= cam >= 0
        pt_rows, kp_arr, cam = pt_rows[ok], kp_arr[ok], cam[ok]

        kps_stack = np.stack([m.keyframes[k].kps for k in all_kids])
        ur_stack = np.stack([m.keyframes[k].kps_ur for k in all_kids])
        lvl_stack = np.stack([m.keyframes[k].levels for k in all_kids])
        uv = kps_stack[cam, kp_arr]
        ur = ur_stack[cam, kp_arr]
        sig2 = self.tracker.sigma2[lvl_stack[cam, kp_arr]]
        # semantic weighting (reference optimizer_g2o.py:728-729): scale each
        # observation's information by its keypoint's class stability weight
        # (information *= w  <=>  sigma2 /= w); keyframes without per-kp
        # labels contribute unweighted
        if (
            Parameters.kUseSemanticsInOptimization
            and self.semantic_mapping is not None
        ):
            # gate on ANY labeled keyframe in the window — the newest one is
            # never labeled yet (segmentation runs after its LBA in the
            # pipeline), so gating on it would disable weighting entirely
            any_sem = any(
                getattr(m.keyframes[k], "kps_sem", None) is not None
                for k in all_kids
            )
            if any_sem:
                sem_stack = np.stack([
                    (
                        k_f.kps_sem
                        if getattr(k_f, "kps_sem", None) is not None
                        else np.full(len(k_f.kps), -1, np.int64)
                    )
                    for k_f in (m.keyframes[k] for k in all_kids)
                ])
                w = self.semantic_mapping.get_semantic_weight(
                    sem_stack[cam, kp_arr]
                )
                sig2 = sig2 / np.maximum(np.asarray(w, np.float64), 1e-6)
        return (
            cam.astype(np.int32), pt_rows.astype(np.int32),
            uv.astype(np.float32), ur.astype(np.float32),
            sig2.astype(np.float32),
        )

    # ------------------------------------------------------------ local BA
    def local_bundle_adjustment(self, kf: KeyFrame):
        """Synchronous covisibility-window Schur LM (dispatch + drain)."""
        self._lba_dispatch(kf)
        while self._lba is not None:
            self._lba_poll(block=True)

    def _lba_build(self, kf: KeyFrame, window_size: int | None = None):
        """Assemble the padded BAProblem for kf's covisibility window.

        Returns (problem, meta) or None when the window is too small
        (reference ``optimizer_g2o.py:614`` edge assembly)."""
        window_kids = [kf.kid] + kf.ordered_covisibles(
            window_size
            if window_size is not None
            else Parameters.kLocalBAWindowSize
        )
        window_kids = [k for k in window_kids if k in self.map.keyframes]
        local_pids = self.map.get_local_map_points(window_kids)
        if len(local_pids) < 10:
            return None
        # hard cap on points: keep the best-constrained (most observations)
        # so the TPU problem shape stays fixed (see padding note below)
        if len(local_pids) > Parameters.kLBAMaxPoints:
            nobs = np.asarray([
                len(self.map.observations.get(int(p), {})) for p in local_pids
            ])
            local_pids = np.asarray(local_pids)[
                np.argsort(-nobs, kind="stable")[: Parameters.kLBAMaxPoints]
            ]
        # fixed set: keyframes outside the window observing local points,
        # capped at the camera budget (most-observing first — dropping a
        # far keyframe only removes its anchoring observations)
        window = set(window_kids)
        fixed_counts: dict[int, int] = {}
        for pid in local_pids:
            for kid in self.map.observations.get(int(pid), {}):
                if kid not in window and kid in self.map.keyframes:
                    fixed_counts[kid] = fixed_counts.get(kid, 0) + 1
        max_fixed = Parameters.kLBAMaxCameras - len(window_kids)
        fixed_kids = set(
            sorted(fixed_counts, key=lambda k: (-fixed_counts[k], k))
            [:max_fixed]
        )
        all_kids = window_kids + sorted(fixed_kids)
        # always fix the first keyframe of the map (gauge)
        kid_to_row = {kid: i for i, kid in enumerate(all_kids)}
        pid_to_row = {int(p): i for i, p in enumerate(local_pids)}

        cam_idx, pt_idx, uvs, urs, sig2 = self._collect_ba_observations(
            local_pids, kid_to_row, all_kids
        )
        if len(cam_idx) < 20:
            return None
        if len(cam_idx) > Parameters.kLBAMaxObservations:
            n = Parameters.kLBAMaxObservations
            cam_idx, pt_idx = cam_idx[:n], pt_idx[:n]
            uvs, urs, sig2 = uvs[:n], urs[:n], sig2[:n]

        st = self.map.points
        poses = np.stack([self.map.keyframes[k].Tcw for k in all_kids])
        points = st.pos[local_pids]
        fixed = np.zeros(len(all_kids), bool)
        for kid in fixed_kids:
            fixed[kid_to_row[kid]] = True
        first_kid = self.map.keyframe_order[0]
        if first_kid in kid_to_row:
            fixed[kid_to_row[first_kid]] = True
        if not fixed.any():
            fixed[0] = True

        # Shape policy, the TPU-critical detail: on an accelerator each new
        # (C, P, O) combination is a fresh XLA compile of the whole Schur-LM
        # graph (minutes through a tunnel), while padded FLOPs on the MXU
        # are nearly free — so the TPU path pads every LBA to the ONE capped
        # steady-state shape and compiles exactly once per iters-variant.
        # On CPU (the test suite) padded FLOPs are real costs and compiles
        # are cheap, so fine-grained buckets stay.
        if fixed_shapes():
            C = Parameters.kLBAMaxCameras
            P = Parameters.kLBAMaxPoints
            O = Parameters.kLBAMaxObservations
        else:
            C = bucket_size_linear(len(all_kids), 8)
            P = bucket_size(len(local_pids), 256)
            O = bucket_size(len(cam_idx), 1024)
        poses = pad_rows(poses, C)
        poses[len(all_kids):] = np.eye(4)
        fixed = pad_rows(fixed, C, fill=True)
        points = pad_rows(points, P)
        obs_valid = np.zeros(O, bool)
        obs_valid[: len(cam_idx)] = True

        problem = optim.BAProblem(
            poses=jnp.asarray(poses, jnp.float32),
            points=jnp.asarray(points, jnp.float32),
            cam_idx=jnp.asarray(pad_rows(np.asarray(cam_idx, np.int32), O), jnp.int32),
            pt_idx=jnp.asarray(pad_rows(np.asarray(pt_idx, np.int32), O), jnp.int32),
            uv=jnp.asarray(pad_rows(np.stack(uvs), O), jnp.float32),
            ur=jnp.asarray(pad_rows(np.asarray(urs, np.float32), O, fill=-1.0), jnp.float32),
            sigma2=jnp.asarray(pad_rows(np.asarray(sig2, np.float32), O, fill=1.0), jnp.float32),
            valid=jnp.asarray(obs_valid),
            fixed=jnp.asarray(fixed),
            K=jnp.asarray(self.camera.K, jnp.float32),
            bf=jnp.asarray(self.camera.bf, jnp.float32),
        )
        meta = {
            "local_pids": local_pids,
            "all_kids": all_kids,
            "kid_to_row": kid_to_row,
            "fixed": fixed,
            "cam_idx": cam_idx,
            "pt_idx": pt_idx,
        }
        return problem, meta

    def _lba_dispatch(self, kf: KeyFrame, window_size: int | None = None):
        """Dispatch the first LBA iteration chunk; results are polled by
        ``_lba_poll`` — the host never waits here."""
        # reference g2o clears mbAbortBA at BA start (optimizer_g2o.py:648):
        # an interrupt only stops FURTHER iterations, it never skips the
        # window's first chunk — every keyframe gets at least one LM pass
        self.opt_abort_flag = False
        built = self._lba_build(kf, window_size=window_size)
        if built is None:
            return
        problem, meta = built
        # two-phase shape like the reference g2o LBA (optimize(5) always,
        # then optimize(10) unless aborted, ``optimizer_g2o.py:824``): the
        # first chunk always runs and applies; the remainder is dispatched
        # at first poll unless a new keyframe interrupted meanwhile.  The
        # LM damping state (lam) is threaded through, so an un-aborted
        # chunked run is numerically identical to one full-length run.
        total = Parameters.kOptimizerLBAIterations
        chunk = max(2, (total + 1) // 2)
        # EVERY dispatch uses the same static ``iters=chunk`` so the whole
        # chunked run compiles exactly two graph variants (lam0=None for the
        # first chunk, lam0=array for the rest) — a variable-size remainder
        # chunk was the round-3 post-warmup compile leak.  The remainder is
        # rounded UP to a whole chunk (at worst chunk-1 extra LM iterations
        # past ``total``, which only converges further).
        rest = total - min(chunk, total)
        device_counters.dispatches += 1
        result = optim.bundle_adjust(
            problem, iters=min(chunk, total), return_state=True
        )
        meta.update(
            problem=problem,
            chunk=chunk,
            iters_left=-(-rest // chunk) * chunk,
            result=result,
        )
        self._lba = meta

    def _lba_poll(self, block: bool) -> bool:
        """Service the in-flight LBA.  Non-blocking unless ``block``: when
        the current chunk's device result is ready, either dispatch the next
        chunk or (last chunk / abort requested) apply the result."""
        lba = self._lba
        (new_poses_dev, new_points_dev, cost_dev, lam_dev,
         inl_dev) = lba["result"]
        if block:
            import jax

            jax.block_until_ready(new_poses_dev)
        elif not new_poses_dev.is_ready():
            return False
        if lba["iters_left"] > 0 and not self.opt_abort_flag:
            prob = lba["problem"]._replace(
                poses=new_poses_dev, points=new_points_dev
            )
            n = lba["chunk"]   # fixed static iters: no compile variants
            lba["problem"] = prob
            device_counters.dispatches += 1
            lba["result"] = optim.bundle_adjust(
                prob, iters=n, lam0=lam_dev, return_state=True
            )
            lba["iters_left"] -= n
            return True
        if self.opt_abort_flag and lba["iters_left"] > 0:
            self.lba_chunks_aborted += 1
        self._lba_apply(lba, new_poses_dev, new_points_dev, inl_dev)
        self._lba = None
        self.opt_abort_flag = False
        return True

    def _lba_apply(self, lba: dict, new_poses_dev, new_points_dev,
                   inl_dev=None):
        """Write back LBA results; guards against map mutations that happened
        while the chunks were in flight (culled keyframes, dead points)."""
        local_pids = lba["local_pids"]
        all_kids = lba["all_kids"]
        kid_to_row = lba["kid_to_row"]
        fixed = lba["fixed"]
        cam_idx = lba["cam_idx"]
        pt_idx = lba["pt_idx"]
        st = self.map.points

        device_counters.readbacks += 1
        new_poses = np.asarray(new_poses_dev, np.float64)
        new_points = np.asarray(new_points_dev, np.float64)
        if not (np.isfinite(new_poses).all() and np.isfinite(new_points).all()):
            Printer.red("LBA diverged (non-finite result): discarding update")
            return

        # outlier observation pruning (post-BA chi2, reference removes
        # edges); the mask rides in the bundle_adjust result buffer, so
        # reading it here is free — it resolved with the chunk we polled
        if inl_dev is not None:
            inlier_mask = np.asarray(inl_dev)[: len(cam_idx)]
        else:
            inlier_mask = np.asarray(optim.ba_outlier_mask(
                lba["problem"]._replace(
                    poses=jnp.asarray(new_poses, jnp.float32),
                    points=jnp.asarray(new_points, jnp.float32))
            ))[: len(cam_idx)]
        for o in np.nonzero(~inlier_mask)[0]:
            pid = int(local_pids[pt_idx[o]])
            kid = all_kids[cam_idx[o]]
            self.map.remove_observation(pid, kid)

        for kid, row in kid_to_row.items():
            if not fixed[row] and kid in self.map.keyframes:
                self.map.keyframes[kid].update_pose(new_poses[row])
                self.map.keyframes[kid].lba_count += 1
        alive = st.valid[local_pids]
        st.pos[local_pids[alive]] = new_points[: len(local_pids)][alive]
        # pos-only delta: the device store ships just these rows' positions
        # instead of a full re-upload (LBA applies land every few frames)
        self.map._mark_dirty(local_pids[alive], pos_only=True)

    # --------------------------------------------------------- cull keyframes
    def cull_keyframes(self, kf: KeyFrame):
        """90%-redundancy rule (reference ``local_mapping_core.py:173``)."""
        sf = self.tracker.scale_factors
        for kid in kf.ordered_covisibles():
            kf_o = self.map.keyframes.get(kid)
            if kf_o is None or kid == self.map.keyframe_order[0]:
                continue
            pids = kf_o.points[kf_o.points >= 0]
            if len(pids) == 0:
                continue
            n_redundant = 0
            n_points = 0
            for kp_idx, pid in zip(np.nonzero(kf_o.points >= 0)[0], pids):
                pid = int(pid)
                if not self.map.points.valid[pid]:
                    continue
                obs = self.map.observations.get(pid, {})
                n_points += 1
                if len(obs) <= Parameters.kKeyframeCullingMinNumPoints:
                    continue
                level = kf_o.levels[kp_idx]
                n_better = 0
                for okid, okp in obs.items():
                    if okid == kid:
                        continue
                    okf = self.map.keyframes.get(okid)
                    if okf is None:
                        continue
                    if okf.levels[okp] <= level + 1:
                        n_better += 1
                        if n_better >= Parameters.kKeyframeCullingMinNumPoints:
                            break
                if n_better >= Parameters.kKeyframeCullingMinNumPoints:
                    n_redundant += 1
            if n_points > 0 and n_redundant > (
                Parameters.kKeyframeCullingRedundantObsRatio * n_points
            ):
                self.map.remove_keyframe(kf_o)
