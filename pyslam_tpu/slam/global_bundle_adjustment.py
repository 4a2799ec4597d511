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

    cam_idx, pt_idx, uvs, urs, sig2 = [], [], [], [], []
    for pid in pids:
        for kid, kp_idx in m.observations.get(int(pid), {}).items():
            kf = m.keyframes.get(kid)
            if kf is None:
                continue
            cam_idx.append(kid_to_row[kid])
            pt_idx.append(pid_to_row[int(pid)])
            uvs.append(kf.kps[kp_idx])
            urs.append(kf.kps_ur[kp_idx])
            sig2.append(feature_tracker.sigma2[kf.levels[kp_idx]])

    poses = np.stack([m.keyframes[k].Tcw for k in kids])
    fixed = np.zeros(len(kids), bool)
    fixed[0] = True  # gauge: first keyframe fixed

    problem = optim.BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(m.points.pos[pids], jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(np.stack(uvs), jnp.float32),
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
    return float(cost)
