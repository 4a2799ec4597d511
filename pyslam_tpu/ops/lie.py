"""SO(3)/SE(3)/Sim(3) Lie-group operations in pure JAX.

TPU-native replacement for the reference's g2o/GTSAM/lietorch pose types
(pySLAM: ``pyslam/slam/camera_pose.py``, ``pyslam/slam/sim3_pose.py``,
``thirdparty/lietorch``).  Everything here is written for a *single* element
with static shapes and is `vmap`/`jit` friendly; batched variants are obtained
with ``jax.vmap``.  Poses are stored as (R: 3x3, t: 3) or 4x4 homogeneous
matrices; Sim(3) additionally carries a scalar scale s (g = [sR t; 0 1]).

All small-angle branches use Taylor expansions behind ``jnp.where`` with safe
denominators so gradients are finite everywhere (important: these ops sit
inside jitted LM optimizers and RANSAC loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: 3-vector -> 3x3 skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: 3x3 skew matrix -> 3-vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with Taylor fallback."""
    small = jnp.abs(x) < 1e-5
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle 3-vector -> rotation matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-10
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector (angle in [0, pi]).

    Goes through the branchless Shepperd quaternion conversion, which is
    uniformly accurate including near theta = pi (a direct trace-based log
    loses ~|pi - theta| digits there).
    """
    q = R_to_quat(R)  # (x, y, z, w)
    v, qw = q[..., :3], q[..., 3]
    # enforce qw >= 0 so the returned angle lies in [0, pi]
    sgn = jnp.where(qw < 0.0, -1.0, 1.0)
    v = v * sgn[..., None]
    qw = qw * sgn
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, qw)
    small = vn < 1e-9
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.where(small, 1.0, vn))
    return v * scale[..., None]


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(w): translation part of se(3) exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-10
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-10
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))) / jnp.where(small, 1.0, theta2),
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [rho(3), w(3)] -> 4x4 homogeneous transform.

    Convention: xi = [translation-part rho, rotation-part w] (g2o order).
    """
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _left_jacobian(w)
    t = (V @ rho[..., None])[..., 0]
    return rt_to_T(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous transform -> se(3) twist [rho, w]."""
    R, t = T_to_rt(T)
    w = so3_log(R)
    Vinv = _left_jacobian_inv(w)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def rt_to_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(3x3, 3) -> 4x4 homogeneous."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def T_to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T_to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to (..., N, 3) points."""
    R, t = T_to_rt(T)
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


# ----------------------------------------------------------------- Sim(3)

def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim(3) [rho(3), w(3), sigma(1)] -> 4x4 Sim(3) matrix [sR t; 0 1].

    Matches the reference's Sim3Pose matrix convention
    (pySLAM ``pyslam/slam/sim3_pose.py``); closed form after Strasdat'10.
    """
    rho, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    Wmat = _sim3_W(w, sigma, xi.dtype)
    t = (Wmat @ rho[..., None])[..., 0]
    return srt_to_S(s, R, t)


def srt_to_S(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(s, R, t) -> 4x4 Sim(3) matrix [sR t; 0 1]."""
    return rt_to_T(s[..., None, None] * R, t)


def S_to_srt(S: jnp.ndarray):
    """4x4 Sim(3) matrix -> (s, R, t)."""
    sR = S[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(sR))
    R = sR / s[..., None, None]
    return s, R, S[..., :3, 3]


def sim3_inv(S: jnp.ndarray) -> jnp.ndarray:
    s, R, t = S_to_srt(S)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return srt_to_S(s_inv, Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0])


def sim3_transform_points(S: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    return pts @ jnp.swapaxes(sR, -1, -2) + t[..., None, :]


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """4x4 Sim(3) -> [rho, w, sigma]: exact inverse of sim3_exp via 3x3 solve."""
    s, R, t = S_to_srt(S)
    sigma = jnp.log(s)
    w = so3_log(R)
    Wmat = _sim3_W(w, sigma, S.dtype)
    rho = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([rho, w, sigma[..., None]], axis=-1)


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray, dtype) -> jnp.ndarray:
    """Translation block of Sim(3) exp: W = A0*I + a*hat(w) + b*hat(w)^2.

    Closed form with Taylor limits for small theta and/or small sigma:
      A0 = (s-1)/sigma                      -> 1 + sigma/2
      a  = (s sinT sig + (1-s cosT)T)/(T d) -> (s*sig + 1 - s)/sig^2      -> 1/2
      b  = (A0 - ((s cosT-1)sig + s sinT T)/d)/T^2
                                            -> (A0 + s*sig/2 - s)/sig^2   -> 1/6
    with d = sigma^2 + theta^2.
    """
    s = jnp.exp(sigma)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta2 < 1e-10
    ssig = jnp.where(small_sigma, 1.0, sigma)  # safe denominator ONLY
    ssig2 = ssig * ssig
    A0 = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / ssig)
    denom = sigma * sigma + theta2  # only /sigma needs guarding; this doesn't
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a_big = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (theta * denom)
    b_big = (A0 - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / jnp.where(
        small_theta, 1.0, theta2
    )
    a_small = jnp.where(small_sigma, 0.5, (s * sigma + 1.0 - s) / ssig2)
    b_small = jnp.where(small_sigma, 1.0 / 6.0, (A0 + s * sigma / 2.0 - s) / ssig2)
    a = jnp.where(small_theta, a_small, a_big)
    b = jnp.where(small_theta, b_small, b_big)
    return (
        A0[..., None, None] * jnp.eye(3, dtype=dtype)
        + a[..., None, None] * W
        + b[..., None, None] * W2
    )


# ------------------------------------------------------------- quaternions

def quat_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix (TUM trajectory convention)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def R_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w); branchless Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Four candidate solutions; pick the numerically largest pivot.
    qw0 = safe_sqrt(1.0 + tr) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4 * qw0 * qw0], -1) / (4.0 * qw0[..., None])

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    q1 = jnp.stack([4 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1[..., None])

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    q2 = jnp.stack([(m01 + m10), 4 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2[..., None])

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3[..., None])

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q


def project_to_SO3(M: jnp.ndarray) -> jnp.ndarray:
    """Closest rotation matrix to M (SVD projection with det fix)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt
