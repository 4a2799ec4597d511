import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.ops import optim
from pyslam_tpu.parallel.mesh import make_mesh
from pyslam_tpu.parallel.sharded_ba import bundle_adjust_sharded

from tests.test_optim import make_problem


def test_mesh_has_8_virtual_devices():
    assert jax.device_count() >= 8


def test_sharded_ba_matches_single_device(rng):
    problem, poses_gt, pts_gt = make_problem(rng)
    # single-device result
    p1, x1, c1 = optim.bundle_adjust(problem, iters=8)
    # 8-way sharded result
    mesh = make_mesh(8)
    p8, x8, c8 = bundle_adjust_sharded(problem, iters=8, mesh=mesh)
    # identical math modulo reduction order
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-4)


def test_sharded_ba_converges(rng):
    problem, poses_gt, _ = make_problem(rng, stereo=True)
    mesh = make_mesh(8)
    cost0, _, _ = optim.ba_cost_and_chi2(problem, use_robust=False)
    poses_o, pts_o, cost = bundle_adjust_sharded(problem, iters=15, mesh=mesh)
    costf, _, _ = optim.ba_cost_and_chi2(
        problem._replace(poses=jnp.asarray(np.asarray(poses_o)),
                         points=jnp.asarray(np.asarray(pts_o))),
        use_robust=False,
    )
    assert float(costf) < 0.2 * float(cost0)
