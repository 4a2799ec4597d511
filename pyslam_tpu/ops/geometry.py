"""Projective geometry primitives: pinhole projection, distortion, triangulation.

TPU-native analog of the reference's geometry utilities (pySLAM
``pyslam/utilities/geom_triangulation.py``, ``geom_2views.py``, and the
projection helpers inside ``pyslam/slam/camera.py``): everything operates on
batched arrays with validity masks instead of per-point Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import lie


# ------------------------------------------------------------- projection

def project_points(Tcw: jnp.ndarray, pts_w: jnp.ndarray, K: jnp.ndarray):
    """World points -> pixel coords and depths.

    Tcw: (4,4) world->camera; pts_w: (N,3); K: (3,3).
    Returns (uv: (N,2), z: (N,)).  No masking here — callers gate on z > 0.
    """
    pc = lie.transform_points(Tcw, pts_w)
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = pc[..., 0] / zs
    y = pc[..., 1] / zs
    u = K[0, 0] * x + K[0, 2]
    v = K[1, 1] * y + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depths -> camera-frame 3D points. uv: (N,2), depth: (N,)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def pixel_to_normalized(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized image coords (z=1 plane)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def distort_radtan(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential (OpenCV k1,k2,p1,p2,k3) distortion to normalized
    coords."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(xy_d: jnp.ndarray, dist: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert rad-tan distortion by fixed-point iteration (OpenCV scheme).

    Fixed iteration count keeps the op jittable; 10 iterations gives ~1e-7
    normalized-coord accuracy (far below 0.01px) for SLAM-grade distortion.
    """
    def body(_, xy):
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xu = (xy_d[..., 0] - dx) / radial
        yu = (xy_d[..., 1] - dy) / radial
        return jnp.stack([xu, yu], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_d)


def undistort_pixels(uv: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> undistorted pixels (same K)."""
    xy = pixel_to_normalized(uv, K)
    xy_u = undistort_radtan(xy, dist)
    u = K[0, 0] * xy_u[..., 0] + K[0, 2]
    v = K[1, 1] * xy_u[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


# ----------------------------------------------------------- triangulation

def triangulate_dlt(
    T1w: jnp.ndarray, T2w: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray
) -> jnp.ndarray:
    """Two-view DLT triangulation in *normalized* coords, batched over N.

    T1w/T2w: (4,4) world->cam poses; xy1/xy2: (N,2) normalized image coords.
    Returns (N,3) world points.  Solved as the null vector of the 4x4 DLT
    system via eigendecomposition of A^T A (faster than SVD on TPU and
    batches cleanly).
    """
    P1 = T1w[:3, :]  # 3x4
    P2 = T2w[:3, :]

    def rows(P, xy):
        # x * P[2] - P[0]; y * P[2] - P[1]
        r0 = xy[..., 0:1] * P[2][None, :] - P[0][None, :]
        r1 = xy[..., 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, xy1)
    a2, a3 = rows(P2, xy2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (N,4,4)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    # smallest eigenvector of symmetric 4x4
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., 0]  # eigenvector of smallest eigenvalue
    w = h[..., 3]
    ws = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return h[..., :3] / ws[..., None]


def triangulate_dlt_np(T1w, T2w, xy1, xy2) -> "np.ndarray":
    """Float64 HOST twin of ``triangulate_dlt``.

    On the TPU backend a ``jnp.float64`` request silently truncates to f32,
    and the DLT eigensolve is precision-sensitive — f32 triangulation noise
    measurably inflates trajectory drift.  Map-point creation is a small
    batch on the local-mapping path, so the f64 eigensolve runs on host.
    """
    import numpy as np

    T1w = np.asarray(T1w, np.float64)
    T2w = np.asarray(T2w, np.float64)
    xy1 = np.asarray(xy1, np.float64)
    xy2 = np.asarray(xy2, np.float64)
    P1, P2 = T1w[:3, :], T2w[:3, :]

    def rows(P, xy):
        r0 = xy[..., 0:1] * P[2][None, :] - P[0][None, :]
        r1 = xy[..., 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, xy1)
    a2, a3 = rows(P2, xy2)
    A = np.stack([a0, a1, a2, a3], axis=-2)
    AtA = np.einsum("nij,nik->njk", A, A)
    _, vecs = np.linalg.eigh(AtA)
    h = vecs[..., 0]
    w = h[..., 3]
    ws = np.where(np.abs(w) < 1e-12, 1e-12, w)
    return h[..., :3] / ws[..., None]


def triangulation_checks(
    pts_w: jnp.ndarray,
    T1w: jnp.ndarray,
    T2w: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    chi2_th: float = 5.991,
    cos_max_parallax: float = 0.9998,
):
    """Acceptance mask for triangulated points (reference ``Map.add_points``
    checks, pySLAM ``pyslam/slam/map.py:447``): positive depth in both views,
    reprojection chi2 below threshold in both views (scaled by per-keypoint
    sigma2), and sufficient parallax.

    All inputs normalized coords; returns bool (N,).
    """
    pc1 = lie.transform_points(T1w, pts_w)
    pc2 = lie.transform_points(T2w, pts_w)
    z1, z2 = pc1[..., 2], pc2[..., 2]

    def reproj_err2(pc, xy):
        zs = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        proj = pc[..., :2] / zs[..., None]
        return jnp.sum((proj - xy) ** 2, axis=-1)

    e1 = reproj_err2(pc1, xy1)
    e2 = reproj_err2(pc2, xy2)

    # parallax between the two viewing rays
    c1 = -T1w[:3, :3].T @ T1w[:3, 3]
    c2 = -T2w[:3, :3].T @ T2w[:3, 3]
    r1 = pts_w - c1[None, :]
    r2 = pts_w - c2[None, :]
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    ok = (
        (z1 > 0.0)
        & (z2 > 0.0)
        & (e1 < chi2_th * sigma2_1)
        & (e2 < chi2_th * sigma2_2)
        & (cos_par < cos_max_parallax)
    )
    return ok


# ------------------------------------------------------------ fundamental

def skew_matmul_F(T_21: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix F_21 (x2^T F x1 = 0) from relative pose cam1->cam2."""
    R, t = lie.T_to_rt(T_21)
    E = lie.hat(t) @ R
    return jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)


def fundamental_np(T_21, K1, K2):
    """Host-numpy fundamental matrix F_21 (x2^T F x1 = 0) from cam1->cam2.

    3x3 outputs are cheaper to compute on host than to read back from the
    device (one RTT per covisible neighbor in the triangulation loop).
    """
    import numpy as np

    R, t = np.asarray(T_21)[:3, :3], np.asarray(T_21)[:3, 3]
    E = np.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    ) @ R
    return np.linalg.inv(np.asarray(K2)).T @ E @ np.linalg.inv(np.asarray(K1))


def triangulation_checks_np(
    pts_w, T1w, T2w, xy1, xy2, sigma2_1, sigma2_2,
    chi2_th: float = 5.991, cos_max_parallax: float = 0.9998,
):
    """Host-numpy twin of :func:`triangulation_checks` (same gates, f64):
    the triangulated points already live on host (f64 DLT), so checking them
    on host removes a device round trip per covisible neighbor."""
    import numpy as np

    pts_w = np.asarray(pts_w, np.float64)
    T1w = np.asarray(T1w, np.float64)
    T2w = np.asarray(T2w, np.float64)
    pc1 = pts_w @ T1w[:3, :3].T + T1w[:3, 3]
    pc2 = pts_w @ T2w[:3, :3].T + T2w[:3, 3]
    z1, z2 = pc1[..., 2], pc2[..., 2]

    def reproj_err2(pc, xy):
        zs = np.where(np.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        proj = pc[..., :2] / zs[..., None]
        return np.sum((proj - np.asarray(xy)) ** 2, axis=-1)

    e1 = reproj_err2(pc1, xy1)
    e2 = reproj_err2(pc2, xy2)
    c1 = -T1w[:3, :3].T @ T1w[:3, 3]
    c2 = -T2w[:3, :3].T @ T2w[:3, 3]
    r1 = pts_w - c1[None, :]
    r2 = pts_w - c2[None, :]
    cos_par = np.sum(r1 * r2, axis=-1) / np.maximum(
        np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
    )
    return (
        (z1 > 0.0)
        & (z2 > 0.0)
        & (e1 < chi2_th * np.asarray(sigma2_1))
        & (e2 < chi2_th * np.asarray(sigma2_2))
        & (cos_par < cos_max_parallax)
    )
