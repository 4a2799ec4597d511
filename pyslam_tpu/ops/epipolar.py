"""Batched-hypothesis RANSAC for two-view geometry: essential & homography.

TPU-native replacement for the reference's OpenCV calls
(pySLAM ``pyslam/slam/initializer.py:118`` `cv2.findEssentialMat` +
`cv2.recoverPose`, ``pyslam/slam/tracking_core.py`` homography-RANSAC
fallback).  Instead of adaptive-iteration RANSAC with early exit (hostile to
XLA), we draw a *fixed* batch of K minimal samples, solve every hypothesis
with ``vmap`` (8-point for E, 4-point DLT for H), score all hypotheses against
all correspondences as one (K, N) residual matrix, and pick the argmax inlier
count — the MXU/VPU-friendly formulation.  A final model is re-estimated on
the best hypothesis' inliers (least squares over all inliers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import lie, geometry


def _sample_minimal(key, n_valid_mask: jnp.ndarray, num_hyp: int,
                    sample_size: int, weights: jnp.ndarray | None = None):
    """Draw (num_hyp, sample_size) indices over valid correspondences.

    Sampling with replacement from the valid set: degenerate samples (repeated
    indices) simply produce bad hypotheses that lose the vote — cheaper than
    rejection sampling under jit.  Optional ``weights`` (N,) bias sampling
    probability ∝ weight via the Gumbel-max trick (log-weights added to the
    gumbel scores).
    """
    n = n_valid_mask.shape[0]
    # Gumbel-top-k style: random scores, invalid get -inf, take top sample_size
    # per hypothesis for sampling *without* replacement within a hypothesis.
    keys = jax.random.split(key, num_hyp)
    logw = (
        jnp.log(jnp.maximum(weights, 1e-20))
        if weights is not None
        else jnp.zeros((n,))
    )

    def one(k):
        g = jax.random.gumbel(k, (n,)) + logw
        g = jnp.where(n_valid_mask, g, -jnp.inf)
        _, idx = jax.lax.top_k(g, sample_size)
        return idx

    return jax.vmap(one)(keys)


# ------------------------------------------------------ essential matrix

def _eight_point(xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point algorithm on one minimal sample (8 correspondences,
    normalized camera coords).  Returns an essential matrix candidate."""
    x1, y1 = xy1[:, 0], xy1[:, 1]
    x2, y2 = xy2[:, 0], xy2[:, 1]
    ones = jnp.ones_like(x1)
    # x2^T E x1 = 0 rows
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (8,9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[:, 0]
    E = e.reshape(3, 3)
    # project onto essential manifold: singular values (1,1,0)
    U, _, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt
    return E


def _sampson_error(E: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance for all N correspondences."""
    ones = jnp.ones_like(xy1[..., :1])
    p1 = jnp.concatenate([xy1, ones], axis=-1)  # (N,3)
    p2 = jnp.concatenate([xy2, ones], axis=-1)
    Ex1 = p1 @ E.T  # (N,3) = E x1
    Etx2 = p2 @ E   # (N,3) = E^T x2
    x2Ex1 = jnp.sum(p2 * Ex1, axis=-1)
    denom = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return x2Ex1 * x2Ex1 / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit, static_argnames=("num_hyp",))
def find_essential(
    key,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    num_hyp: int = 512,
):
    """RANSAC essential matrix from normalized coords.

    Returns (E, inlier_mask, num_inliers).  threshold is a squared Sampson
    distance in normalized coords (callers convert a pixel threshold with
    (px / f)^2).
    """
    samples = _sample_minimal(key, valid, num_hyp, 8)  # (K,8)
    s1 = xy1[samples]  # (K,8,2)
    s2 = xy2[samples]
    Es = jax.vmap(_eight_point)(s1, s2)  # (K,3,3)
    errs = jax.vmap(lambda E: _sampson_error(E, xy1, xy2))(Es)  # (K,N)
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    E_best = Es[best]
    mask = inl[best]

    # refinement: re-estimate from all inliers (least squares 8-point)
    E_ref = _weighted_eight_point(xy1, xy2, mask.astype(xy1.dtype))
    errs_ref = _sampson_error(E_ref, xy1, xy2)
    mask_ref = (errs_ref < threshold) & valid
    use_ref = jnp.sum(mask_ref) >= jnp.sum(mask)
    E_out = jnp.where(use_ref, E_ref, E_best)
    mask_out = jnp.where(use_ref, mask_ref, mask)
    return E_out, mask_out, jnp.sum(mask_out)


def _weighted_eight_point(xy1, xy2, w):
    x1, y1 = xy1[:, 0], xy1[:, 1]
    x2, y2 = xy2[:, 0], xy2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    Aw = A * w[:, None]
    AtA = Aw.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    U, _, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


@jax.jit
def recover_pose(E: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray, valid: jnp.ndarray):
    """Cheirality-tested pose extraction from an essential matrix.

    Returns T_21 (4x4, cam1->cam2 with unit-norm translation) and the
    positive-depth inlier mask, equivalent to cv2.recoverPose.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(jnp.linalg.det(U) < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(jnp.linalg.det(Vt) < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    def count_front(R, t):
        T1 = jnp.eye(4, dtype=E.dtype)
        T2 = lie.rt_to_T(R, t)
        pts = geometry.triangulate_dlt(T1, T2, xy1, xy2)
        z1 = pts[:, 2]
        z2 = lie.transform_points(T2, pts)[:, 2]
        good = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(good), good

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([count_front(R, tt)[0] for R, tt in cands])
    masks = jnp.stack([count_front(R, tt)[1] for R, tt in cands])
    Ts = jnp.stack([lie.rt_to_T(R, tt) for R, tt in cands])
    best = jnp.argmax(counts)
    return Ts[best], masks[best]


# ---------------------------------------------------------- homography

def _four_point_h(xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from one 4-correspondence sample."""
    def rows(p1, p2):
        x, y = p1[0], p1[1]
        u, v = p2[0], p2[1]
        z = jnp.zeros(())
        o = jnp.ones(())
        r0 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u])
        r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v])
        return jnp.stack([r0, r1])

    A = jnp.concatenate([rows(xy1[i], xy2[i]) for i in range(4)], axis=0)  # (8,9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    H = vecs[:, 0].reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _h_transfer_error(H, xy1, xy2):
    ones = jnp.ones_like(xy1[..., :1])
    p1 = jnp.concatenate([xy1, ones], axis=-1)
    q = p1 @ H.T
    qz = jnp.where(jnp.abs(q[..., 2:3]) < 1e-12, 1e-12, q[..., 2:3])
    proj = q[..., :2] / qz
    return jnp.sum((proj - xy2) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_hyp",))
def find_homography(
    key,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    num_hyp: int = 256,
):
    """RANSAC homography (symmetric use: pass pixel or normalized coords with a
    matching squared-distance threshold).  Returns (H, inlier_mask, count)."""
    samples = _sample_minimal(key, valid, num_hyp, 4)
    Hs = jax.vmap(_four_point_h)(xy1[samples], xy2[samples])
    errs = jax.vmap(lambda H: _h_transfer_error(H, xy1, xy2))(Hs)
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    return Hs[best], inl[best], scores[best]
