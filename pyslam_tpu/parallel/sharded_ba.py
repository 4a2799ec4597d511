"""Observation-sharded bundle adjustment over a device mesh.

The GBA normal equations are a sum over observations — the textbook
data-parallel reduction.  Observations (cam_idx, pt_idx, uv, ur, sigma2,
valid) are sharded along the mesh's ``obs`` axis; poses/points are
replicated.  Under ``jit`` with these shardings, GSPMD turns the segment-sum
scatters into per-shard partial sums followed by ``psum`` over ICI, and the
dense reduced camera solve runs replicated — no code changes to the LM core.

This is the multi-chip path exercised by ``__graft_entry__.dryrun_multichip``
and by oversized GBA (maps too big for one chip's HBM to hold all
observation intermediates).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyslam_tpu.ops import optim
from pyslam_tpu.parallel.mesh import make_mesh
from pyslam_tpu.utils.padding import bucket_size


def shard_problem(problem: optim.BAProblem, mesh: Mesh) -> optim.BAProblem:
    """Place observation arrays sharded over the mesh, the rest replicated.

    Observation count must be divisible by the mesh size (caller pads)."""
    s_obs = NamedSharding(mesh, P("obs"))
    s_rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return optim.BAProblem(
        poses=put(problem.poses, s_rep),
        points=put(problem.points, s_rep),
        cam_idx=put(problem.cam_idx, s_obs),
        pt_idx=put(problem.pt_idx, s_obs),
        uv=put(problem.uv, s_obs),
        ur=put(problem.ur, s_obs),
        sigma2=put(problem.sigma2, s_obs),
        valid=put(problem.valid, s_obs),
        fixed=put(problem.fixed, s_rep),
        K=put(problem.K, s_rep),
        bf=put(problem.bf, s_rep),
    )


def pad_problem_for_mesh(problem: optim.BAProblem, n_devices: int) -> optim.BAProblem:
    """Pad the observation axis to a multiple of the mesh size."""
    import numpy as np

    O = problem.uv.shape[0]
    O_pad = -(-O // n_devices) * n_devices
    if O_pad == O:
        return problem
    pad = O_pad - O

    def padded(x, fill=0):
        x = np.asarray(x)
        shape = (pad,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)])

    return problem._replace(
        cam_idx=padded(problem.cam_idx),
        pt_idx=padded(problem.pt_idx),
        uv=padded(problem.uv),
        ur=padded(problem.ur, -1.0),
        sigma2=padded(problem.sigma2, 1.0),
        valid=padded(problem.valid, False),
    )


def bundle_adjust_sharded(
    problem: optim.BAProblem,
    iters: int = 10,
    mesh: Mesh | None = None,
    use_robust: bool = True,
):
    """Run the Schur-LM bundle adjuster with observations sharded over chips."""
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    problem = pad_problem_for_mesh(problem, n)
    problem = shard_problem(problem, mesh)
    return optim.bundle_adjust(problem, iters=iters, use_robust=use_robust)
