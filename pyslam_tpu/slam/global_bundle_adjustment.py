"""Global bundle adjustment over the whole map.

Reference: pySLAM ``pyslam/slam/global_bundle_adjustment.py`` (GBA in a forked
process) + ``optimizer_g2o.py:332``.  Here GBA is one batched Schur-LM solve
on device — the map's SoA layout makes problem construction pure indexing.
The multi-chip variant (observations sharded over a mesh with psum'd normal
equations) lives in ``pyslam_tpu.parallel.sharded_ba``.
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
