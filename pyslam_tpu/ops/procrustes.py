"""Closed-form similarity/rigid alignment (Umeyama/Horn) + RANSAC Sim(3).

TPU-native replacement for the reference's C++ ``sim3solver``
(pySLAM ``cpp/solvers/Sim3Solver.cpp``, used by the loop-closing geometry
check ``pyslam/loop_closing/loop_closing.py:195-470``) and for the
trajectory-alignment tools (``cpp/trajectory/``, ``pyslam/utilities/
geom_trajectory.py``).  The minimal solver is 3-point weighted Umeyama; RANSAC
follows the batched-hypothesis pattern (vmap over K samples, joint scoring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import lie
from pyslam_tpu.ops.epipolar import _sample_minimal


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
):
    """Weighted Umeyama alignment: find (s, R, t) minimizing
    sum_i w_i || dst_i - (s R src_i + t) ||^2.

    Returns (s, R, t).  With ``with_scale=False`` solves the rigid (SE3) case.
    """
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), src.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-12)
    w = weights / wsum
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc  # (3,3) = sum w d s^T
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.array([1.0, 1.0, 0.0], src.dtype) + jnp.array([0.0, 0.0, 1.0], src.dtype) * d
    R = (U * D[None, :]) @ Vt
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    if with_scale:
        s = jnp.sum(S * D) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones((), src.dtype)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def umeyama_S(src, dst, weights=None, with_scale=True) -> jnp.ndarray:
    """Umeyama returning a 4x4 Sim(3) matrix [sR t; 0 1] mapping src->dst."""
    s, R, t = umeyama(src, dst, weights, with_scale)
    return lie.srt_to_S(s, R, t)


@functools.partial(jax.jit, static_argnames=("num_hyp", "with_scale"))
def sim3_ransac(
    key,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold2: float,
    num_hyp: int = 256,
    with_scale: bool = True,
):
    """RANSAC Sim(3) (or SE(3)) between two 3D point sets in correspondence.

    Mirrors Sim3Solver: minimal samples of 3 pairs, alignment error is the
    squared 3D distance after mapping pts1 -> pts2 frame.  Returns
    (S_21 (4,4), inlier_mask, count).
    """
    samples = _sample_minimal(key, valid, num_hyp, 3)

    def solve(idx):
        return umeyama_S(pts1[idx], pts2[idx], with_scale=with_scale)

    Ss = jax.vmap(solve)(samples)  # (K,4,4)

    def err(S):
        mapped = lie.sim3_transform_points(S, pts1)
        return jnp.sum((mapped - pts2) ** 2, axis=-1)

    errs = jax.vmap(err)(Ss)
    inl = (errs < threshold2) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    mask = inl[best]

    # refine on all inliers
    S_ref = umeyama_S(pts1, pts2, weights=mask.astype(pts1.dtype), with_scale=with_scale)
    errs_ref = err(S_ref)
    mask_ref = (errs_ref < threshold2) & valid
    use_ref = jnp.sum(mask_ref) >= jnp.sum(mask)
    S_out = jnp.where(use_ref, S_ref, Ss[best])
    mask_out = jnp.where(use_ref, mask_ref, mask)
    return S_out, mask_out, jnp.sum(mask_out)


@functools.partial(jax.jit, static_argnames=("num_hyp", "with_scale"))
def sim3_ransac_reproj(
    key,
    pts1_c1: jnp.ndarray,   # (N,3) matched points in camera-1 frame
    pts2_c2: jnp.ndarray,   # (N,3) same points in camera-2 frame
    uv1: jnp.ndarray,       # (N,2) pixel observations in image 1
    uv2: jnp.ndarray,       # (N,2) pixel observations in image 2
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    K1: jnp.ndarray,
    K2: jnp.ndarray,
    chi2_th: float = 9.21,   # 2-dof 99% (ORB-SLAM Sim3Solver gate)
    num_hyp: int = 256,
    with_scale: bool = True,
    sample_weights: jnp.ndarray | None = None,
):
    """RANSAC Sim(3) scored by MUTUAL REPROJECTION, not 3D distance.

    This is the reference Sim3Solver's scoring (``cpp/solvers/Sim3Solver.cpp``):
    triangulated far points carry large depth noise (stereo depth error grows
    quadratically with distance), so 3D-3D alignment scoring rejects true
    loops; pixel reprojection in both images is depth-noise tolerant.

    ``sample_weights`` (optional, (N,)) bias MINIMAL-SET sampling toward
    reliable correspondences (Gumbel-max: sampling probability ∝ weight).
    The scorer still votes over ALL correspondences — this only raises the
    odds that the 3 points a hypothesis is SOLVED from have usable 3D
    accuracy, which 3D-3D Horn needs even when scoring is depth-tolerant
    (stereo far points can carry >30% depth error, so an unweighted triple
    almost never yields a competitive hypothesis).

    Returns (S12 mapping cam2 coords -> cam1 coords, inlier_mask, count).
    """
    samples = _sample_minimal(key, valid, num_hyp, 3,
                              weights=sample_weights)

    def solve(idx):
        return umeyama_S(pts2_c2[idx], pts1_c1[idx], with_scale=with_scale)

    Ss = jax.vmap(solve)(samples)  # (K,4,4): cam2 -> cam1

    def proj_err2(S):
        # project pts2 through S into image 1
        p1 = lie.sim3_transform_points(S, pts2_c2)
        z1 = jnp.maximum(p1[..., 2], 1e-6)
        u1 = K1[0, 0] * p1[..., 0] / z1 + K1[0, 2]
        v1 = K1[1, 1] * p1[..., 1] / z1 + K1[1, 2]
        e1 = ((u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2) / jnp.maximum(sigma2_1, 1e-9)
        # and pts1 through S^-1 into image 2
        Sinv = lie.sim3_inv(S)
        p2 = lie.sim3_transform_points(Sinv, pts1_c1)
        z2 = jnp.maximum(p2[..., 2], 1e-6)
        u2 = K2[0, 0] * p2[..., 0] / z2 + K2[0, 2]
        v2 = K2[1, 1] * p2[..., 1] / z2 + K2[1, 2]
        e2 = ((u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2) / jnp.maximum(sigma2_2, 1e-9)
        return jnp.maximum(e1, e2)

    errs = jax.vmap(proj_err2)(Ss)  # (K,N)
    inl = (errs < chi2_th) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    mask = inl[best]

    # refine: weighted Umeyama on inliers, re-gate
    S_ref = umeyama_S(pts2_c2, pts1_c1, weights=mask.astype(pts1_c1.dtype),
                      with_scale=with_scale)
    errs_ref = proj_err2(S_ref)
    mask_ref = (errs_ref < chi2_th) & valid
    use_ref = jnp.sum(mask_ref) >= jnp.sum(mask)
    S_out = jnp.where(use_ref, S_ref, Ss[best])
    mask_out = jnp.where(use_ref, mask_ref, mask)
    return S_out, mask_out, jnp.sum(mask_out)
