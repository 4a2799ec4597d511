"""Batched Levenberg-Marquardt bundle adjustment with Schur complement.

This single module is the TPU-native replacement for BOTH optimizer engines of
the reference (pySLAM ``pyslam/slam/optimizer_g2o.py`` — motion-only pose
optimization :401, LBA :614, GBA :332, Sim3 :1226, essential-graph PGO :1423 —
and the GTSAM twin ``optimizer_gtsam.py``), and for the vendored g2o/GTSAM C++
engines themselves.  Design:

- Observations are flat SoA arrays ``(cam_idx, pt_idx, uv, ur, sigma2, valid)``
  padded to static shapes; invalid slots carry zero weight.
- Jacobians are analytic (the classic SLAM 2x6 / 3x6 blocks), built for all
  observations at once on the VPU.
- Normal equations assembled with ``segment_sum`` scatters; landmarks are
  eliminated with a Schur complement whose cross-term is ONE dense matmul
  (a (6C, 3P)x(3P, 6C) contraction — MXU food), then a dense Cholesky solve
  of the reduced (6C, 6C) camera system.  This is exact, not approximate.
- LM damping with accept/reject steps runs inside ``lax.fori_loop``; robust
  Huber weights with per-octave information matrices match the reference's
  kernel choice (delta = sqrt(chi2 threshold)).

Everything is jit-compatible with static shapes: one compilation per padded
problem size (callers bucket sizes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import lie


class BAProblem(NamedTuple):
    """Padded bundle-adjustment problem in SoA layout.

    poses:    (C, 4, 4) world->camera
    points:   (P, 3)    world
    cam_idx:  (O,) int32 observation -> camera
    pt_idx:   (O,) int32 observation -> point
    uv:       (O, 2)    pixel measurements
    ur:       (O,)      right-image u for stereo obs; < 0 means mono
    sigma2:   (O,)      measurement variance in px^2 (per octave)
    valid:    (O,) bool padding/validity
    fixed:    (C,) bool cameras held constant
    K:        (3, 3)    intrinsics
    bf:       ()        stereo baseline * fx (0 for mono rigs)
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    ur: jnp.ndarray
    sigma2: jnp.ndarray
    valid: jnp.ndarray
    fixed: jnp.ndarray
    K: jnp.ndarray
    bf: jnp.ndarray


CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def _residual_jacobians(pose, point, uv, ur, K, bf):
    """Residual (3,) and Jacobians Jc (3,6), Jp (3,3) for one observation.

    Stereo rows are zeroed for mono observations (ur < 0).  Residual order:
    (u, v, u_r).
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pc = pose[:3, :3] @ point + pose[:3, 3]
    x, y, z = pc[0], pc[1], pc[2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    u_r = u - bf * iz

    is_stereo = ur >= 0.0
    r = jnp.stack([u - uv[0], v - uv[1], jnp.where(is_stereo, u_r - ur, 0.0)])

    # d(pc)/d(xi) = [I | -hat(pc)] for left-multiplied increment exp(xi) T
    dpc = jnp.concatenate([jnp.eye(3, dtype=pc.dtype), -lie.hat(pc)], axis=1)  # (3,6)
    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * x * iz2])
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * y * iz2])
    dur = du + jnp.stack([jnp.zeros_like(iz), jnp.zeros_like(iz), bf * iz2])
    dproj = jnp.stack([du, dv, jnp.where(is_stereo, dur, jnp.zeros_like(dur))])  # (3,3)

    Jc = dproj @ dpc                    # (3,6)
    Jp = dproj @ pose[:3, :3]           # (3,3)
    behind = z < 1e-6
    return r, Jc, Jp, behind, is_stereo


_res_jac_batch = jax.vmap(_residual_jacobians, in_axes=(0, 0, 0, 0, None, None))


def _robust_weights(r, sigma2, is_stereo, use_robust=True):
    """Huber weight, raw chi2, and robust loss per observation.

    information = 1/sigma2; the returned ``loss`` is the actual objective the
    IRLS step minimizes (Huber rho of chi2), which is what accept/reject
    decisions must compare — comparing raw chi2 would block steps that trade
    outlier error for inlier fit.
    """
    info = 1.0 / jnp.maximum(sigma2, 1e-12)
    chi2 = jnp.sum(r * r, axis=-1) * info
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    if use_robust:
        # Huber: w_rob = min(1, delta/|r|_W); rho = chi2 (inlier) else
        # 2*delta*sqrt(chi2) - delta^2
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-18))
        delta = jnp.sqrt(delta2)
        w_rob = jnp.minimum(1.0, delta / rn)
        loss = jnp.where(chi2 <= delta2, chi2, 2.0 * delta * rn - delta2)
    else:
        w_rob = jnp.ones_like(chi2)
        loss = chi2
    return info * w_rob, chi2, loss


def _gather_problem(problem: BAProblem):
    poses_o = problem.poses[problem.cam_idx]
    pts_o = problem.points[problem.pt_idx]
    return poses_o, pts_o


def ba_cost_and_chi2(problem: BAProblem, use_robust=True):
    poses_o, pts_o = _gather_problem(problem)
    r, _, _, behind, is_stereo = _res_jac_batch(
        poses_o, pts_o, problem.uv, problem.ur, problem.K, problem.bf
    )
    w, chi2, loss = _robust_weights(r, problem.sigma2, is_stereo, use_robust)
    active = problem.valid & ~behind
    cost = jnp.sum(jnp.where(active, loss, 0.0))
    return cost, chi2, active


# =====================================================================
# Motion-only pose optimization (frontend)
# =====================================================================

@functools.partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def pose_optimization(
    Tcw: jnp.ndarray,
    pts3d: jnp.ndarray,
    uv: jnp.ndarray,
    ur: jnp.ndarray,
    sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    bf: jnp.ndarray | float = 0.0,
    rounds: int = 4,
    iters_per_round: int = 10,
):
    """Motion-only BA: optimize one camera pose against fixed 3D points.

    Mirrors the reference's scheme (pySLAM ``optimizer_g2o.py:401``): ``rounds``
    rounds of ``iters_per_round`` LM iterations each; after every round each
    observation is re-classified inlier/outlier by its chi2 against the
    mono/stereo threshold, and the last round drops the robust kernel.

    Returns (Tcw_opt, inlier_mask, num_inliers).
    """
    bf = jnp.asarray(bf, dtype=Tcw.dtype)
    delta2 = jnp.where(ur >= 0.0, CHI2_STEREO, CHI2_MONO)
    n = pts3d.shape[0]

    # One flat lax loop of rounds*iters steps keeps the XLA graph small (the
    # unrolled-round variant quadrupled compile time of the fused frontend).
    # Inlier reclassification (non-robust chi2 gate) runs at round boundaries.

    def residuals(T, inliers, use_robust=True):
        r, Jc, _, behind, is_st = _res_jac_batch(
            jnp.broadcast_to(T, (n, 4, 4)), pts3d, uv, ur, K, bf
        )
        w, chi2, loss = _robust_weights(r, sigma2, is_st, use_robust)
        active = inliers & ~behind
        w = jnp.where(active, w, 0.0)
        return r, Jc, w, chi2, loss, active, behind

    def cost_of(T, inliers):
        _, _, _, _, loss, active, _ = residuals(T, inliers)
        return jnp.sum(jnp.where(active, loss, 0.0))

    def body(i, carry):
        # Deferred-acceptance LM: ONE residual/jacobian evaluation per
        # iteration.  The cost at the candidate pose both scores the previous
        # step (revert if worse) and builds the next step from whichever pose
        # won.  Halves the per-iteration work vs the textbook
        # propose-then-evaluate loop.
        T_cand, T_best, lam, best_cost, inliers = carry
        r, Jc, w, _, loss, active, _ = residuals(T_cand, inliers)
        cand_cost = jnp.sum(jnp.where(active, loss, 0.0))
        accept = cand_cost < best_cost
        T_base = jnp.where(accept, T_cand, T_best)
        best_cost = jnp.where(accept, cand_cost, best_cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        # On reject the jacobians are from the (nearby) rejected pose while
        # the step is applied to T_best with increased damping — standard
        # single-evaluation LM compromise; rejects are rare after warmup and
        # the growing lambda guarantees contraction toward T_best.
        Jw = Jc * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, Jc)
        g = jnp.einsum("nij,ni->j", Jw, r)
        D = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-6))
        dx = -jnp.linalg.solve(H + lam * D, g)
        T_next = lie.se3_exp(dx) @ T_base
        T_best = T_base

        # round boundary: reclassify all observations with the raw chi2 gate
        def reclassify(args):
            T_next, T_best, best_cost, inliers = args
            _, _, _, chi2, _, _, behind = residuals(T_best, valid, use_robust=False)
            inl = valid & ~behind & (chi2 <= delta2)
            return T_best, T_best, cost_of(T_best, inl), inl

        at_boundary = (i + 1) % iters_per_round == 0
        T_next, T_best, best_cost, inliers = jax.lax.cond(
            at_boundary, reclassify, lambda a: a,
            (T_next, T_best, best_cost, inliers),
        )
        return T_next, T_best, lam, best_cost, inliers

    big = jnp.asarray(1e30, Tcw.dtype)
    init = (Tcw, Tcw, jnp.asarray(1e-4, Tcw.dtype), big, valid)
    _, T, _, _, inliers = jax.lax.fori_loop(
        0, rounds * iters_per_round, body, init
    )
    return T, inliers, jnp.sum(inliers)


# =====================================================================
# Full bundle adjustment (LBA / GBA) with exact Schur elimination
# =====================================================================

def _assemble_blocks(problem: BAProblem, use_robust: bool):
    """Per-observation weighted residuals/Jacobians and per-entity blocks."""
    poses_o, pts_o = _gather_problem(problem)
    r, Jc, Jp, behind, is_st = _res_jac_batch(
        poses_o, pts_o, problem.uv, problem.ur, problem.K, problem.bf
    )
    w, chi2, loss = _robust_weights(r, problem.sigma2, is_st, use_robust)
    active = problem.valid & ~behind
    w = jnp.where(active, w, 0.0)
    # fixed cameras contribute to point blocks but have zero pose jacobian
    cam_free = ~problem.fixed[problem.cam_idx]
    Jc = jnp.where(cam_free[:, None, None], Jc, 0.0)
    cost = jnp.sum(jnp.where(active, loss, 0.0))
    return r, Jc, Jp, w, cost


def _normal_equations(problem: BAProblem, r, Jc, Jp, w):
    C = problem.poses.shape[0]
    P = problem.points.shape[0]
    Jcw = Jc * w[:, None, None]
    Jpw = Jp * w[:, None, None]
    Hcc = jnp.zeros((C, 6, 6), r.dtype).at[problem.cam_idx].add(
        jnp.einsum("nij,nik->njk", Jcw, Jc)
    )
    Hpp = jnp.zeros((P, 3, 3), r.dtype).at[problem.pt_idx].add(
        jnp.einsum("nij,nik->njk", Jpw, Jp)
    )
    bc = jnp.zeros((C, 6), r.dtype).at[problem.cam_idx].add(
        jnp.einsum("nij,ni->nj", Jcw, r)
    )
    bp = jnp.zeros((P, 3), r.dtype).at[problem.pt_idx].add(
        jnp.einsum("nij,ni->nj", Jpw, r)
    )
    Hcp = jnp.einsum("nij,nik->njk", Jcw, Jp)  # (O,6,3) per-obs blocks
    return Hcc, Hpp, bc, bp, Hcp


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate); M: (...,3,3)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
            jnp.stack([Cc, -(a * h - b * g), (a * e - b * d)], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


@functools.partial(
    jax.jit, static_argnames=("iters", "use_robust", "return_state")
)
def bundle_adjust(
    problem: BAProblem,
    iters: int = 10,
    use_robust: bool = True,
    lam0=None,
    return_state: bool = False,
):
    """Joint pose+point LM with exact Schur complement, dense reduced solve.

    Replaces the reference's LBA/GBA (g2o LM with marginalized landmarks,
    pySLAM ``optimizer_g2o.py:614`` / ``:332``).  The Schur cross term
    S -= sum_p A_p B_p^T is computed as a single (6C, 3P) x (3P, 6C) MXU
    contraction after scattering per-observation Y/Hcp blocks into per-point
    rows.  Suitable for C up to a few hundred cameras; larger problems use
    :func:`bundle_adjust_pcg`.

    Returns (poses, points, final_cost).
    """
    C = problem.poses.shape[0]
    P = problem.points.shape[0]

    def step(poses, points, lam):
        prob = problem._replace(poses=poses, points=points)
        r, Jc, Jp, w, cost = _assemble_blocks(prob, use_robust)
        Hcc, Hpp, bc, bp, Hcp = _normal_equations(prob, r, Jc, Jp, w)

        lamD_p = lam * jnp.maximum(
            jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6
        )
        Hpp_d = Hpp + jax.vmap(jnp.diag)(lamD_p)
        Hpp_inv = _inv3x3(Hpp_d)

        Y = jnp.einsum("oij,ojk->oik", Hcp, Hpp_inv[prob.pt_idx])  # (O,6,3)

        # Exact Schur cross term, built compile-friendly for XLA:TPU:
        # multi-index scatters into a 4-D (P, C, 6, 3) operand and the
        # "pcij,pdkj->cidk" einsum lower pathologically slowly on the TPU
        # backend (minutes-per-shape compiles), so per-obs blocks scatter
        # through ONE flat index (pt*C + cam) and the contraction is a plain
        # (C6, P3) x (P3, C6) matmul — MXU food either way, identical math.
        lin = prob.pt_idx * C + prob.cam_idx
        A = jnp.zeros((P * C, 18), r.dtype).at[lin].add(Y.reshape(-1, 18))
        B = jnp.zeros((P * C, 18), r.dtype).at[lin].add(Hcp.reshape(-1, 18))
        # (P, C, 6, 3) -> [(p,j), (c,i)] so S_cross[(ci),(dk)] = A2^T B2
        A2 = (
            A.reshape(P, C, 6, 3).transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
        )
        B2 = (
            B.reshape(P, C, 6, 3).transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
        )
        S_cross = A2.T @ B2                                  # (C6, C6)

        lamD_c = lam * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
        Hcc_d = Hcc + jax.vmap(jnp.diag)(lamD_c)
        # block-diagonal embed via einsum with the identity (no 2-index
        # scatter): S[(c i),(d j)] = delta_cd * Hcc_d[c,i,j] - S_cross
        eye_c = jnp.eye(C, dtype=r.dtype)
        S = jnp.einsum("cd,cij->cidj", eye_c, Hcc_d).reshape(C * 6, C * 6)
        S = S - S_cross

        b_schur = (
            bc.reshape(-1)
            - (A2.T @ bp.reshape(-1))
        ).reshape(C, 6)
        # fixed cameras: identity rows (their dx forced to 0)
        fixed6 = jnp.repeat(problem.fixed, 6)
        S = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, S)
        S = S + jnp.diag(jnp.where(fixed6, 1.0, 1e-9))
        rhs = jnp.where(fixed6, 0.0, -b_schur.reshape(-1))

        # Jacobi equilibration: the reduced camera system mixes rotation
        # (unitless) and translation (meters) blocks whose scales differ by
        # orders of magnitude — in f32 (the TPU path) the raw solve loses
        # several digits; symmetric diagonal scaling restores them
        dscale = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
        S_eq = S * dscale[:, None] * dscale[None, :]
        dc = (jnp.linalg.solve(S_eq, rhs * dscale) * dscale).reshape(C, 6)

        # back-substitute points: dp = Hpp^-1 (-bp - Hcp^T dc)
        t_obs = jnp.einsum("oij,oi->oj", Hcp, dc[prob.cam_idx])  # (O,3)
        tp = jnp.zeros((P, 3), r.dtype).at[prob.pt_idx].add(t_obs)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, -bp - tp)

        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dc, poses)
        new_poses = jnp.where(problem.fixed[:, None, None], poses, new_poses)
        new_points = points + dp
        new_cost, _, _ = ba_cost_and_chi2(
            problem._replace(poses=new_poses, points=new_points), use_robust
        )
        return new_poses, new_points, cost, new_cost

    def body(_, carry):
        poses, points, lam, cost = carry
        new_poses, new_points, cur_cost, new_cost = step(poses, points, lam)
        accept = new_cost < cur_cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 5.0, 1e8))
        cost = jnp.where(accept, new_cost, cost)
        return poses, points, lam, cost

    cost0, _, _ = ba_cost_and_chi2(problem, use_robust)
    lam_init = (
        jnp.asarray(1e-4, problem.poses.dtype)
        if lam0 is None
        else jnp.asarray(lam0, problem.poses.dtype)
    )
    poses, points, lam, cost = jax.lax.fori_loop(
        0, iters, body, (problem.poses, problem.points, lam_init, cost0)
    )
    if return_state:
        # (poses, points, cost, lam, inliers): feeding lam back as lam0
        # makes a chunked run (N then M iters) bit-identical to one
        # N+M-iter run — the async LBA relies on this to split iterations
        # across polls.  The post-BA chi2 inlier mask rides in the SAME
        # result (one extra residual pass, trivial next to the LM
        # iterations): reading it at apply time costs nothing, where a
        # separate ba_outlier_mask dispatch+readback behind a full device
        # queue blocked the frame loop ~300 ms per LBA apply.
        _, chi2, active = ba_cost_and_chi2(
            problem._replace(poses=poses, points=points), use_robust=False
        )
        delta2 = jnp.where(problem.ur >= 0.0, CHI2_STEREO, CHI2_MONO)
        inl = active & (chi2 <= delta2)
        return poses, points, cost, lam, inl
    return poses, points, cost


def ba_outlier_mask(problem: BAProblem) -> jnp.ndarray:
    """Post-BA chi2 classification (used to cull observations like the
    reference's post-LBA edge removal)."""
    _, chi2, active = ba_cost_and_chi2(problem, use_robust=False)
    delta2 = jnp.where(problem.ur >= 0.0, CHI2_STEREO, CHI2_MONO)
    return active & (chi2 <= delta2)



# =====================================================================
# Sim(3) optimization between two keyframes (loop geometry check)
# =====================================================================

@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(
    S12: jnp.ndarray,
    pts1_c1: jnp.ndarray,
    pts2_c2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    K1: jnp.ndarray,
    K2: jnp.ndarray,
    chi2_th: float = 10.0,
    iters: int = 40,
    fix_scale: bool = False,
    inliers_init: jnp.ndarray | None = None,
):
    """Refine a relative Sim(3) S12 (cam2 -> cam1) from mutual reprojections.

    Mirrors the reference's ``optimize_sim3`` (pySLAM ``optimizer_g2o.py:1226``):
    matched map points, expressed in each camera frame, are projected into the
    *other* image through S12 / S12^-1; LM minimizes both pixel residual sets
    with Huber weights; observations failing the chi2 gate are re-gated each
    iteration.  ``inliers_init`` (e.g. the Sim3-RANSAC consensus set) seeds the
    active set — starting from ALL tentative matches lets gross outliers drag
    the estimate away from the RANSAC solution before the first re-gate.
    Returns (S12_opt, inlier_mask, num_inliers).
    """
    if inliers_init is None:
        inliers_init = valid

    def residuals(xi):
        dS = lie.sim3_exp(xi) if not fix_scale else lie.sim3_exp(xi.at[6].set(0.0))
        S = dS @ S12
        Sinv = lie.sim3_inv(S)

        def proj(K, p):
            z = jnp.maximum(p[..., 2], 1e-6)
            u = K[0, 0] * p[..., 0] / z + K[0, 2]
            v = K[1, 1] * p[..., 1] / z + K[1, 2]
            return jnp.stack([u, v], -1)

        p1 = lie.sim3_transform_points(S, pts2_c2)       # cam2 pts into cam1
        p2 = lie.sim3_transform_points(Sinv, pts1_c1)    # cam1 pts into cam2
        e1 = proj(K1, p1) - uv1
        e2 = proj(K2, p2) - uv2
        return e1, e2

    def chi2_of(xi):
        e1, e2 = residuals(xi)
        c1 = jnp.sum(e1 * e1, -1) / jnp.maximum(sigma2_1, 1e-12)
        c2 = jnp.sum(e2 * e2, -1) / jnp.maximum(sigma2_2, 1e-12)
        return c1, c2

    def body(_, carry):
        S, lam, cost, inl = carry
        xi0 = jnp.zeros((7,), S.dtype)

        def flat_res(xi):
            # recompute around current S (closure rebinds through S12 global);
            # residual relative to *current* S via left increment
            dS = lie.sim3_exp(xi) if not fix_scale else lie.sim3_exp(xi.at[6].set(0.0))
            Scur = dS @ S
            Sinv = lie.sim3_inv(Scur)

            def proj(K, p):
                z = jnp.maximum(p[..., 2], 1e-6)
                u = K[0, 0] * p[..., 0] / z + K[0, 2]
                v = K[1, 1] * p[..., 1] / z + K[1, 2]
                return jnp.stack([u, v], -1)

            p1 = lie.sim3_transform_points(Scur, pts2_c2)
            p2 = lie.sim3_transform_points(Sinv, pts1_c1)
            e1 = (proj(K1, p1) - uv1) / jnp.sqrt(jnp.maximum(sigma2_1[:, None], 1e-12))
            e2 = (proj(K2, p2) - uv2) / jnp.sqrt(jnp.maximum(sigma2_2[:, None], 1e-12))
            # Huber IRLS: the robust weight must be FROZEN during
            # differentiation (stop_gradient).  Differentiating through it
            # minimizes ||w(e)*e||^2 which is CONSTANT (= delta^2) in the
            # saturated region -> zero gradient, optimizer stalls.
            delta = jnp.sqrt(chi2_th)

            def hub(e):
                n = jnp.linalg.norm(e, axis=-1, keepdims=True)
                w_irls = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(n, 1e-9)))
                return e * jax.lax.stop_gradient(w_irls)

            w = inl.astype(S.dtype)[:, None]
            return jnp.concatenate([(hub(e1) * w).ravel(), (hub(e2) * w).ravel()])

        r = flat_res(xi0)
        J = jax.jacfwd(flat_res)(xi0)  # (4N, 7)
        H = J.T @ J
        g = J.T @ r
        # keep H invertible: base Tikhonov everywhere, and when the scale is
        # fixed its J column is zero -> without a strong diagonal entry the
        # solve is singular (NaN poses, zero inliers)
        H = H + 1e-6 * jnp.eye(7, dtype=H.dtype)
        if fix_scale:
            H = H.at[6, 6].add(1.0)
        D = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-6))
        dx = -jnp.linalg.solve(H + lam * D, g)
        if fix_scale:
            dx = dx.at[6].set(0.0)
        S_new = lie.sim3_exp(dx) @ S
        # evaluate
        def cost_at(Sx):
            Sinv = lie.sim3_inv(Sx)
            p1 = lie.sim3_transform_points(Sx, pts2_c2)
            p2 = lie.sim3_transform_points(Sinv, pts1_c1)

            def proj(K, p):
                z = jnp.maximum(p[..., 2], 1e-6)
                u = K[0, 0] * p[..., 0] / z + K[0, 2]
                v = K[1, 1] * p[..., 1] / z + K[1, 2]
                return jnp.stack([u, v], -1)

            c1 = jnp.sum((proj(K1, p1) - uv1) ** 2, -1) / jnp.maximum(sigma2_1, 1e-12)
            c2 = jnp.sum((proj(K2, p2) - uv2) ** 2, -1) / jnp.maximum(sigma2_2, 1e-12)

            # accept/reject must score the SAME Huber objective the IRLS step
            # minimizes; comparing raw chi2 blocks every robust step and the
            # LM stalls at the first damping blow-up
            def rho(c):
                rn = jnp.sqrt(jnp.maximum(c, 1e-18))
                d = jnp.sqrt(chi2_th)
                return jnp.where(c <= chi2_th, c, 2.0 * d * rn - chi2_th)

            w = inl.astype(Sx.dtype)
            return jnp.sum((rho(c1) + rho(c2)) * w)

        new_cost = cost_at(S_new)
        accept = new_cost < cost
        S = jnp.where(accept, S_new, S)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        cost = jnp.where(accept, new_cost, cost)
        # re-gate inliers: both-direction chi2 below threshold
        Sinv = lie.sim3_inv(S)
        p1 = lie.sim3_transform_points(S, pts2_c2)
        p2 = lie.sim3_transform_points(Sinv, pts1_c1)

        def proj(K, p):
            z = jnp.maximum(p[..., 2], 1e-6)
            u = K[0, 0] * p[..., 0] / z + K[0, 2]
            v = K[1, 1] * p[..., 1] / z + K[1, 2]
            return jnp.stack([u, v], -1)

        c1 = jnp.sum((proj(K1, p1) - uv1) ** 2, -1) / jnp.maximum(sigma2_1, 1e-12)
        c2 = jnp.sum((proj(K2, p2) - uv2) ** 2, -1) / jnp.maximum(sigma2_2, 1e-12)
        inl_new = valid & (c1 < chi2_th) & (c2 < chi2_th)
        # never let the re-gate collapse the active set before convergence:
        # a not-yet-converged iterate can push every chi2 over the threshold,
        # zeroing all weights and freezing the optimization permanently
        keep = jnp.sum(inl_new) >= jnp.minimum(jnp.sum(inl), 10)
        inl = jnp.where(keep, inl_new, inl)
        return S, lam, cost, inl

    init = (
        S12,
        jnp.asarray(1e-4, S12.dtype),
        jnp.asarray(jnp.inf, S12.dtype),
        valid & inliers_init,
    )
    S, _, _, inl = jax.lax.fori_loop(0, iters, body, init)
    return S, inl, jnp.sum(inl)


# =====================================================================
# Essential-graph pose-graph optimization over Sim(3)
# =====================================================================

@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def pose_graph_optimize(
    S: jnp.ndarray,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    S_meas: jnp.ndarray,
    edge_valid: jnp.ndarray,
    fixed: jnp.ndarray,
    iters: int = 20,
    fix_scale: bool = False,
):
    """Sim(3) pose-graph (essential graph) optimization.

    Vertices S: (V,4,4) world->keyframe Sim3 ([sR t; 0 1]); edges carry the
    measured relative Sim3 S_meas = S_i S_j^-1 at correction time; residual
    e = log_sim3(S_meas S_j S_i^-1) — the reference's essential-graph PGO
    (pySLAM ``optimizer_g2o.py:1423``).  Gauss-Newton with dense (7V,7V)
    normal equations (V up to ~1000), per-edge Jacobians by forward autodiff.
    fix_scale=True constrains all scale increments (stereo/RGBD case).

    Returns S_opt (V,4,4).
    """
    V = S.shape[0]

    def edge_residual(eps_i, eps_j, Si, Sj, Sij):
        Si_new = lie.sim3_exp(eps_i) @ Si
        Sj_new = lie.sim3_exp(eps_j) @ Sj
        return lie.sim3_log(Sij @ Sj_new @ lie.sim3_inv(Si_new))

    res_fn = jax.vmap(
        lambda Si, Sj, Sij: edge_residual(jnp.zeros(7, S.dtype), jnp.zeros(7, S.dtype), Si, Sj, Sij)
    )
    jac_i_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(
            lambda e: edge_residual(e, jnp.zeros(7, S.dtype), Si, Sj, Sij)
        )(jnp.zeros(7, S.dtype))
    )
    jac_j_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(
            lambda e: edge_residual(jnp.zeros(7, S.dtype), e, Si, Sj, Sij)
        )(jnp.zeros(7, S.dtype))
    )

    def body(_, Scur):
        Si = Scur[edges_i]
        Sj = Scur[edges_j]
        r = res_fn(Si, Sj, S_meas)                 # (E,7)
        Ji = jac_i_fn(Si, Sj, S_meas)              # (E,7,7)
        Jj = jac_j_fn(Si, Sj, S_meas)
        w = edge_valid.astype(S.dtype)
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]

        # flat single-index scatters (multi-index scatters into a 4-D
        # operand lower pathologically slowly on XLA:TPU — see bundle_adjust)
        Hf49 = jnp.zeros((V * V, 49), S.dtype)
        Hf49 = Hf49.at[edges_i * V + edges_i].add(
            jnp.einsum("eij,eik->ejk", Jiw, Ji).reshape(-1, 49))
        Hf49 = Hf49.at[edges_j * V + edges_j].add(
            jnp.einsum("eij,eik->ejk", Jjw, Jj).reshape(-1, 49))
        Hf49 = Hf49.at[edges_i * V + edges_j].add(
            jnp.einsum("eij,eik->ejk", Jiw, Jj).reshape(-1, 49))
        Hf49 = Hf49.at[edges_j * V + edges_i].add(
            jnp.einsum("eij,eik->ejk", Jjw, Ji).reshape(-1, 49))
        H = Hf49.reshape(V, V, 7, 7).transpose(0, 2, 1, 3)
        g = jnp.zeros((V, 7), S.dtype)
        g = g.at[edges_i].add(jnp.einsum("eij,ei->ej", Jiw, r))
        g = g.at[edges_j].add(jnp.einsum("eij,ei->ej", Jjw, r))

        Hf = H.reshape(V * 7, V * 7)
        fixed7 = jnp.repeat(fixed, 7)
        if fix_scale:
            scale_rows = (jnp.arange(V * 7) % 7) == 6
            fixed7 = fixed7 | scale_rows
        Hf = jnp.where(fixed7[:, None] | fixed7[None, :], 0.0, Hf)
        Hf = Hf + jnp.diag(jnp.where(fixed7, 1.0, 1e-8))
        rhs = jnp.where(fixed7, 0.0, -g.reshape(-1))
        dx = jnp.linalg.solve(Hf, rhs).reshape(V, 7)
        S_new = jax.vmap(lambda d, Sv: lie.sim3_exp(d) @ Sv)(dx, Scur)
        return jnp.where(fixed[:, None, None], Scur, S_new)

    return jax.lax.fori_loop(0, iters, body, S)
