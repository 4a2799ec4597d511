"""Batched RANSAC Perspective-n-Point for relocalization.

TPU-native replacement for the reference's C++ ``pnpsolver`` module
(pySLAM ``cpp/solvers/PnPsolver.cpp``: RANSAC EPnP used by
``pyslam/slam/relocalizer.py:167-211``).  Design: draw K minimal samples of 6
2D-3D correspondences, solve each with the linear DLT (12-parameter projection
matrix, nullspace via eigh, orthogonality enforced by SVD projection), score
all hypotheses on all points at once, then polish the winner with a few
Gauss-Newton iterations on its inliers.  Fixed iteration counts, no host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import lie
from pyslam_tpu.ops.epipolar import _sample_minimal


def _dlt_pnp(pts3d: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Linear PnP on one minimal sample (6 points, normalized coords).

    Solves for P = [R|t] up to scale from x ~ P X, then projects onto SE(3).
    Returns a 4x4 world->camera transform.
    """
    n = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((n, 1), pts3d.dtype)], axis=-1)  # (n,4)
    zeros = jnp.zeros_like(X)
    x, y = xy[:, 0:1], xy[:, 1:2]
    # rows: [X 0 -x*X; 0 X -y*X]
    r0 = jnp.concatenate([X, zeros, -x * X], axis=-1)  # (n,12)
    r1 = jnp.concatenate([zeros, X, -y * X], axis=-1)
    A = jnp.concatenate([r0, r1], axis=0)  # (2n,12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]
    P = p.reshape(3, 4)
    M = P[:, :3]
    # scale/sign: det(M) > 0 and unit-ish rotation
    sign = jnp.where(jnp.linalg.det(M) < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    scale = jnp.cbrt(jnp.maximum(jnp.linalg.det(M), 1e-12))
    Mn = M / scale
    R = lie.project_to_SO3(Mn)
    t = P[:, 3] / scale
    return lie.rt_to_T(R, t)


def _reproj_err2(Tcw: jnp.ndarray, pts3d: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    pc = lie.transform_points(Tcw, pts3d)
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = pc[..., :2] / zs[..., None]
    e2 = jnp.sum((proj - xy) ** 2, axis=-1)
    # behind-camera points get an infinite error
    return jnp.where(z > 0, e2, 1e12)


def _gauss_newton_pose(Tcw, pts3d, xy, weights, iters=8):
    """Weighted GN refinement of a pose on normalized-coords reprojection."""

    def body(_, T):
        pc = lie.transform_points(T, pts3d)
        z = jnp.maximum(pc[..., 2], 1e-6)
        proj = pc[..., :2] / z[..., None]
        r = (proj - xy) * weights[..., None]  # (N,2)
        x, y = pc[..., 0], pc[..., 1]
        iz = 1.0 / z
        iz2 = iz * iz
        # d(proj)/d(xi), xi=[rho, w] left-multiplied increment (standard SLAM jacobian)
        J = jnp.stack(
            [
                jnp.stack([iz, jnp.zeros_like(iz), -x * iz2,
                           -x * y * iz2, 1.0 + x * x * iz2, -y * iz], -1),
                jnp.stack([jnp.zeros_like(iz), iz, -y * iz2,
                           -(1.0 + y * y * iz2), x * y * iz2, x * iz], -1),
            ],
            axis=-2,
        )  # (N,2,6)
        Jw = J * weights[..., None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + 1e-6 * jnp.eye(6, dtype=T.dtype)
        g = jnp.einsum("nij,ni->j", Jw, (proj - xy))
        dx = -jnp.linalg.solve(H, g)
        return lie.se3_exp(dx) @ T

    return jax.lax.fori_loop(0, iters, body, Tcw)


@functools.partial(jax.jit, static_argnames=("num_hyp",))
def solve_pnp_ransac(
    key,
    pts3d: jnp.ndarray,
    xy: jnp.ndarray,
    valid: jnp.ndarray,
    threshold2: float,
    num_hyp: int = 256,
):
    """RANSAC PnP.  pts3d: (N,3) world; xy: (N,2) normalized coords.

    threshold2: squared inlier threshold in normalized coords.
    Returns (Tcw (4,4), inlier_mask, num_inliers).
    """
    samples = _sample_minimal(key, valid, num_hyp, 6)
    Ts = jax.vmap(_dlt_pnp)(pts3d[samples], xy[samples])  # (K,4,4)
    errs = jax.vmap(lambda T: _reproj_err2(T, pts3d, xy))(Ts)  # (K,N)
    inl = (errs < threshold2) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    T_best = Ts[best]
    mask = inl[best]

    # polish on inliers and re-gate
    T_ref = _gauss_newton_pose(T_best, pts3d, xy, mask.astype(xy.dtype))
    errs_ref = _reproj_err2(T_ref, pts3d, xy)
    mask_ref = (errs_ref < threshold2) & valid
    use_ref = jnp.sum(mask_ref) >= jnp.sum(mask)
    T_out = jnp.where(use_ref, T_ref, T_best)
    mask_out = jnp.where(use_ref, mask_ref, mask)
    return T_out, mask_out, jnp.sum(mask_out)
