"""Global bundle adjustment over the whole map.

Reference: pySLAM ``pyslam/slam/global_bundle_adjustment.py`` (GBA in a forked
process) + ``optimizer_g2o.py:332``.  Here GBA is one batched Schur-LM solve
on device — the map's SoA layout makes problem construction pure indexing.
The multi-chip variant (observations sharded over a mesh with psum'd normal
equations) lives in ``pyslam_tpu.parallel.sharded_ba``.

:class:`AsyncGBA` is the concurrent-GBA-then-correct protocol (reference
``global_bundle_adjustment.py:184-310`` runs GBA in its own process while
tracking/mapping continue, then folds keyframes and points created meanwhile
into the corrected frame): the solve is dispatched as polled device chunks
(same machinery as the async LBA), the host snapshots which keyframes/points
the problem contains, and on completion propagates the correction to
everything born during the solve — keyframes via spanning-tree composition,
points via their reference keyframe's old→new pose.  A new loop correction
arriving mid-solve aborts it (reference ``mbStopGBA``) and the stale result
is discarded.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.ops import optim
from pyslam_tpu.slam.map import Map


def build_full_problem(m: Map, camera, feature_tracker, loop_kf_id=None):
    """Flatten the whole map into a BAProblem + index mappings."""
    kids = list(m.keyframe_order)
    kid_to_row = {k: i for i, k in enumerate(kids)}
    pids = m.points.alive_ids()
    pid_to_row = {int(p): i for i, p in enumerate(pids)}

    # bulk edge dump (native C++ graph when available) + vectorized gathers
    if m._native is not None:
        pt_rows, kids_arr, kp_arr = m._native.collect_observations(pids)
    else:
        pt_l, kid_l, kp_l = [], [], []
        for i, pid in enumerate(pids):
            for kid, kp_idx in m.observations.get(int(pid), {}).items():
                pt_l.append(i)
                kid_l.append(kid)
                kp_l.append(kp_idx)
        pt_rows = np.asarray(pt_l, np.int64)
        kids_arr = np.asarray(kid_l, np.int32)
        kp_arr = np.asarray(kp_l, np.int32)
    max_kid = max(kids) if kids else 0
    lut = np.full(max_kid + 1, -1, np.int32)
    for kid, row in kid_to_row.items():
        lut[kid] = row
    ok = kids_arr <= max_kid
    cam_idx = np.where(ok, lut[np.clip(kids_arr, 0, max_kid)], -1)
    ok &= cam_idx >= 0
    pt_idx, kp_arr, cam_idx = pt_rows[ok], kp_arr[ok], cam_idx[ok]
    kps_stack = np.stack([m.keyframes[k].kps for k in kids])
    ur_stack = np.stack([m.keyframes[k].kps_ur for k in kids])
    lvl_stack = np.stack([m.keyframes[k].levels for k in kids])
    uvs = kps_stack[cam_idx, kp_arr]
    urs = ur_stack[cam_idx, kp_arr]
    sig2 = feature_tracker.sigma2[lvl_stack[cam_idx, kp_arr]]

    poses = np.stack([m.keyframes[k].Tcw for k in kids])
    fixed = np.zeros(len(kids), bool)
    fixed[0] = True  # gauge: first keyframe fixed

    problem = optim.BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(m.points.pos[pids], jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(uvs, jnp.float32),
        ur=jnp.asarray(urs, jnp.float32),
        sigma2=jnp.asarray(sig2, jnp.float32),
        valid=jnp.ones((len(cam_idx),), bool),
        fixed=jnp.asarray(fixed),
        K=jnp.asarray(camera.K, jnp.float32),
        bf=jnp.asarray(camera.bf, jnp.float32),
    )
    return problem, kids, pids


def global_bundle_adjustment(m: Map, camera, feature_tracker, iters=None,
                             use_sharded: bool = False):
    """Run GBA and write results back into the map. Returns final cost."""
    iters = iters or Parameters.kOptimizerGBAIterations
    if m.num_keyframes() < 2:
        return 0.0
    problem, kids, pids = build_full_problem(m, camera, feature_tracker)
    if use_sharded:
        from pyslam_tpu.parallel.sharded_ba import bundle_adjust_sharded

        new_poses, new_points, cost = bundle_adjust_sharded(problem, iters=iters)
    else:
        new_poses, new_points, cost = optim.bundle_adjust(problem, iters=iters)
    new_poses = np.asarray(new_poses, np.float64)
    new_points = np.asarray(new_points, np.float64)
    if not (np.isfinite(new_poses).all() and np.isfinite(new_points).all()):
        from pyslam_tpu.utils.logging import Printer

        Printer.red("GBA diverged (non-finite result): discarding update")
        return float("inf")
    for i, kid in enumerate(kids):
        if i > 0:
            m.keyframes[kid].update_pose(new_poses[i])
    m.points.pos[pids] = new_points
    m.store_version += 1
    return float(cost)


class AsyncGBA:
    """Chunked, abortable whole-map BA with after-the-fact correction
    propagation — the reference's process-GBA protocol, TPU-style."""

    def __init__(self, camera, feature_tracker):
        self.camera = camera
        self.feature_tracker = feature_tracker
        self._state: dict | None = None
        self.abort_flag = False
        self.runs_completed = 0
        self.runs_aborted = 0
        self.last_cost = float("nan")

    @property
    def running(self) -> bool:
        return self._state is not None

    def dispatch(self, m: Map, iters: int | None = None):
        """Start a GBA over the map's CURRENT keyframes/points.  Any solve
        already in flight is superseded (aborted + discarded) — the caller
        just corrected the map, so its snapshot is stale."""
        if self._state is not None:
            self.runs_aborted += 1
            self._state = None
        self.abort_flag = False
        iters = iters or Parameters.kOptimizerGBAIterations
        if m.num_keyframes() < 2:
            return
        problem, kids, pids = build_full_problem(
            m, self.camera, self.feature_tracker
        )
        chunk = max(2, iters // 3)
        result = optim.bundle_adjust(
            problem, iters=min(chunk, iters), return_state=True
        )
        self._state = {
            "map": m,
            "problem": problem,
            "kids": kids,
            "pids": np.asarray(pids),
            "chunk": chunk,
            "iters_left": iters - min(chunk, iters),
            "result": result,
        }

    def abort(self):
        """New loop detected mid-solve (reference ``mbStopGBA``): stop after
        the in-flight chunk and discard the stale result."""
        if self._state is not None:
            self.abort_flag = True

    def poll(self, block: bool = False) -> bool:
        """Service the in-flight solve; returns True while work remains.
        Non-blocking unless ``block``."""
        st = self._state
        if st is None:
            return False
        new_poses_dev, new_points_dev, cost_dev, lam_dev = st["result"][:4]
        if block:
            import jax

            jax.block_until_ready(new_poses_dev)
        elif not new_poses_dev.is_ready():
            return True
        if self.abort_flag:
            self._state = None
            self.abort_flag = False
            self.runs_aborted += 1
            return False
        if st["iters_left"] > 0:
            prob = st["problem"]._replace(
                poses=new_poses_dev, points=new_points_dev
            )
            n = min(st["chunk"], st["iters_left"])
            st["problem"] = prob
            st["result"] = optim.bundle_adjust(
                prob, iters=n, lam0=lam_dev, return_state=True
            )
            st["iters_left"] -= n
            return True
        self._apply(st, new_poses_dev, new_points_dev, cost_dev)
        self._state = None
        return False

    def finish(self):
        while self.poll(block=True):
            pass

    # ------------------------------------------------------------- write-back
    def _apply(self, st: dict, new_poses_dev, new_points_dev, cost_dev):
        from pyslam_tpu.utils.logging import Printer

        m: Map = st["map"]
        kids = st["kids"]
        pids = st["pids"]
        new_poses = np.asarray(new_poses_dev, np.float64)
        new_points = np.asarray(new_points_dev, np.float64)
        if not (np.isfinite(new_poses).all() and np.isfinite(new_points).all()):
            Printer.red("async GBA diverged (non-finite): discarding update")
            return
        self.last_cost = float(np.asarray(cost_dev))
        self.runs_completed += 1

        in_snapshot = set(kids)
        pts = m.points
        # pre-apply poses (apply-time, NOT dispatch-time: local mapping may
        # have refined both parent and child coherently during the solve —
        # the correction must preserve the relative pose as it stands NOW,
        # exactly the reference's correct-after-GBA composition)
        Tcw_pre = {kid: kf.Tcw.copy() for kid, kf in m.keyframes.items()}

        # 1. snapshot keyframes: direct write-back (gauge row 0 stays)
        corrected = set()
        for i, kid in enumerate(kids):
            kf = m.keyframes.get(kid)
            if kf is None:
                continue
            corrected.add(kid)
            if i > 0:
                kf.update_pose(new_poses[i])

        # 2. keyframes created DURING the solve: spanning-tree composition
        # (reference correct_keyframes_after_GBA: Tchild_w' = Tchild_w *
        # Tw_parent * Tparent_w') — keyframe_order guarantees parents come
        # first, so a chain of new keyframes corrects transitively
        n_born_kfs = 0
        for kid in m.keyframe_order:
            kf = m.keyframes[kid]
            if kid in in_snapshot:
                continue
            parent = getattr(kf, "parent", None)
            if parent is None or parent not in corrected:
                continue                     # parent untouched: child stays
            T_rel = Tcw_pre[kid] @ np.linalg.inv(Tcw_pre[parent])
            kf.update_pose(T_rel @ m.keyframes[parent].Tcw)
            corrected.add(kid)
            n_born_kfs += 1

        # 3. snapshot points: direct write-back (skip since-deleted slots)
        alive = pts.valid[pids]
        pids_alive = pids[alive]
        pts.pos[pids_alive] = new_points[: len(pids)][alive]

        # 4. points created DURING the solve: move with their reference
        # keyframe's pre→post pose (reference corrects via mnBAGlobalForKF)
        all_alive = pts.alive_ids()
        born_later = np.setdiff1d(all_alive, pids, assume_unique=False)
        for pid in born_later:
            ref_kid = int(pts.first_kid[pid])
            kf = m.keyframes.get(ref_kid)
            if kf is None or ref_kid not in corrected:
                continue
            T_pre = Tcw_pre[ref_kid]
            p = pts.pos[pid]
            p_cam = T_pre[:3, :3] @ p + T_pre[:3, 3]
            Twc = kf.Twc
            pts.pos[pid] = Twc[:3, :3] @ p_cam + Twc[:3, 3]
        m.store_version += 1
        Printer.green(
            f"async GBA applied: {len(kids)} KFs (+{n_born_kfs} "
            f"born-during), {len(pids_alive)} pts (+{len(born_later)} "
            f"born-during), cost {self.last_cost:.3f}"
        )
