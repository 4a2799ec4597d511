"""SLAM-specific matching kernels: projection search, epipolar search, fusion.

TPU-native replacement for the reference's geometry matchers (pySLAM
``pyslam/slam/geometry_matchers.py:58-1286``: ``search_frame_by_projection``,
``search_map_by_projection``, ``search_and_fuse``,
``search_frame_for_triangulation`` and their C++ twins).  Where the reference
walks kd-trees / per-point candidate lists in loops, here every search is ONE
masked dense problem: project all M candidate map points, build the (M, N)
descriptor-distance matrix on the MXU, AND-in the geometric gates (pixel
radius scaled per predicted octave, scale-consistency range, viewing angle,
octave agreement, epipolar distance), then do a masked one-to-one argmin.
Padded static shapes; -1 marks no-match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import hamming, lie, matching


@functools.partial(jax.jit, static_argnames=("check_orientation",))
def search_by_projection(
    # map-point side (M padded)
    pts_w: jnp.ndarray,          # (M,3) world positions
    pt_desc: jnp.ndarray,        # (M,256) int8 bits
    pt_normal: jnp.ndarray,      # (M,3)
    pt_min_dist: jnp.ndarray,    # (M,)
    pt_max_dist: jnp.ndarray,    # (M,)
    pt_valid: jnp.ndarray,       # (M,)
    # frame side (N fixed)
    kps: jnp.ndarray,            # (N,2) undistorted px
    kp_level: jnp.ndarray,       # (N,)
    kp_desc: jnp.ndarray,        # (N,256)
    kp_valid: jnp.ndarray,       # (N,)
    kp_ur: jnp.ndarray,          # (N,) right-u (for gating stereo radius) or -1
    # geometry
    Tcw: jnp.ndarray,            # (4,4)
    K: jnp.ndarray,
    image_bounds: jnp.ndarray,   # (4,) [u_min, u_max, v_min, v_max]
    scale_factors: jnp.ndarray,  # (L,)
    radius_px: float,
    max_descriptor_distance: float,
    view_cos_limit: float = 0.5,
    ratio: float = 0.9,
    check_orientation: bool = False,
):
    """Project map points into a frame and match to keypoints.

    Returns (pt_match_kp: (M,) int32 kp index or -1,
             kp_match_pt: (N,) int32 point row or -1,
             pred_level: (M,) predicted octave).
    Mirrors the gates of the reference's ``search_map_by_projection``
    (``geometry_matchers.py:415``): positive depth, in-image, distance within
    the point's scale-invariance range, viewing angle, octave within +-1 of
    the distance-predicted octave, pixel radius scaled by predicted octave.
    """
    L = scale_factors.shape[0]
    pc = lie.transform_points(Tcw, pts_w)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * pc[:, 1] / zs + K[1, 2]

    Ow = -Tcw[:3, :3].T @ Tcw[:3, 3]
    d = pts_w - Ow[None, :]
    dist = jnp.linalg.norm(d, axis=1)
    view_cos = jnp.sum(d * pt_normal, axis=1) / jnp.maximum(dist, 1e-9)

    in_img = (
        (u >= image_bounds[0]) & (u < image_bounds[1])
        & (v >= image_bounds[2]) & (v < image_bounds[3])
    )
    in_range = (dist >= pt_min_dist * 0.8) & (dist <= pt_max_dist * 1.2)
    pt_ok = pt_valid & (z > 0) & in_img & in_range & (view_cos > view_cos_limit)

    # predicted octave from distance (reference predict_detection_level)
    log_scale = jnp.log(scale_factors[1] / scale_factors[0])
    ratio_d = jnp.maximum(pt_max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio_d) / log_scale).astype(jnp.int32), 0, L - 1
    )
    radius = radius_px * scale_factors[pred_level]          # (M,)

    # pair gates
    du = jnp.abs(kps[None, :, 0] - u[:, None])              # (M,N)
    dv = jnp.abs(kps[None, :, 1] - v[:, None])
    in_window = (du < radius[:, None]) & (dv < radius[:, None])
    level_ok = (kp_level[None, :] >= pred_level[:, None] - 1) & (
        kp_level[None, :] <= pred_level[:, None] + 1
    )
    pair_ok = in_window & level_ok & pt_ok[:, None] & kp_valid[None, :]

    dmat = hamming.descriptor_distance_matrix(pt_desc, kp_desc)
    idx, dists = matching.match_ratio_test(
        dmat,
        max_descriptor_distance,
        ratio=ratio,
        valid_a=pt_ok,
        valid_b=kp_valid,
        cross_check=True,
        extra_mask=pair_ok,
    )
    # invert: per-kp matched point row
    M = pts_w.shape[0]
    N = kps.shape[0]
    kp_match = jnp.full((N,), -1, jnp.int32)
    rows = jnp.arange(M, dtype=jnp.int32)
    kp_match = kp_match.at[jnp.where(idx >= 0, idx, N)].set(
        jnp.where(idx >= 0, rows, -1), mode="drop"
    )
    return idx, kp_match, pred_level


@jax.jit
def epipolar_triangulation_match(
    kps1: jnp.ndarray,       # (N1,2) undistorted px
    level1: jnp.ndarray,
    desc1: jnp.ndarray,
    free1: jnp.ndarray,      # (N1,) valid & no map point
    kps2: jnp.ndarray,
    level2: jnp.ndarray,
    desc2: jnp.ndarray,
    free2: jnp.ndarray,
    F12: jnp.ndarray,        # fundamental matrix: x2^T F12 x1 = 0 (pixels)
    epipole2: jnp.ndarray,   # (2,) epipole of cam1 center in image 2
    sigma2_levels: jnp.ndarray,  # (L,) per-level variance
    max_descriptor_distance: float,
    ratio: float = 0.8,
):
    """Descriptor matching restricted to the epipolar constraint, for new
    map-point triangulation (reference ``search_frame_for_triangulation``,
    ``geometry_matchers.py:1112``): pairs must satisfy the point-to-epipolar-
    line distance chi2 gate in image 2 and keep away from the epipole.

    Returns (idx2 per kp1 or -1, distances).
    """
    ones = jnp.ones_like(kps1[:, :1])
    p1 = jnp.concatenate([kps1, ones], axis=1)            # (N1,3)
    lines2 = p1 @ F12.T                                    # (N1,3) epilines in img2
    a, b, c = lines2[:, 0:1], lines2[:, 1:2], lines2[:, 2:3]
    num = a * kps2[None, :, 0] + b * kps2[None, :, 1] + c  # (N1,N2)
    den = a * a + b * b
    dsq = num * num / jnp.maximum(den, 1e-12)              # squared px distance
    # chi2 gate at 95% for 1 dof scaled by level-2 sigma2 (3.84 * sigma2)
    gate = 3.84 * sigma2_levels[level2][None, :]
    epi_ok = dsq < gate

    # epipole proximity gate in image 2 (reference uses 100*scale^2 px^2)
    de = jnp.sum((kps2 - epipole2[None, :]) ** 2, axis=1)
    scale22 = sigma2_levels[level2]
    far_from_epipole = de > 100.0 * scale22
    pair_ok = epi_ok & free1[:, None] & (free2 & far_from_epipole)[None, :]

    dmat = hamming.descriptor_distance_matrix(desc1, desc2)
    idx2, dists = matching.match_ratio_test(
        dmat,
        max_descriptor_distance,
        ratio=ratio,
        valid_a=free1,
        valid_b=free2,
        cross_check=True,
        extra_mask=pair_ok,
    )
    return idx2, dists


@jax.jit
def fuse_candidates(
    pts_w: jnp.ndarray,
    pt_desc: jnp.ndarray,
    pt_normal: jnp.ndarray,
    pt_min_dist: jnp.ndarray,
    pt_max_dist: jnp.ndarray,
    pt_valid: jnp.ndarray,
    kps: jnp.ndarray,
    kp_level: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_ur: jnp.ndarray,
    Tcw: jnp.ndarray,
    K: jnp.ndarray,
    bf: jnp.ndarray,
    image_bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    sigma2_levels: jnp.ndarray,
    max_descriptor_distance: float,
):
    """search_and_fuse device part (reference ``geometry_matchers.py:662``):
    for each candidate map point find the best in-window keypoint whose
    reprojection chi2 passes; host then merges/adds observations.

    Returns (best_kp: (M,) int32 or -1, best_dist: (M,)).
    """
    L = scale_factors.shape[0]
    pc = lie.transform_points(Tcw, pts_w)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
    ur = u - bf / zs

    Ow = -Tcw[:3, :3].T @ Tcw[:3, 3]
    d = pts_w - Ow[None, :]
    dist = jnp.linalg.norm(d, axis=1)
    view_cos = jnp.sum(d * pt_normal, axis=1) / jnp.maximum(dist, 1e-9)
    in_img = (
        (u >= image_bounds[0]) & (u < image_bounds[1])
        & (v >= image_bounds[2]) & (v < image_bounds[3])
    )
    in_range = (dist >= pt_min_dist * 0.8) & (dist <= pt_max_dist * 1.2)
    pt_ok = pt_valid & (z > 0) & in_img & in_range & (view_cos > 0.5)

    log_scale = jnp.log(scale_factors[1] / scale_factors[0])
    ratio_d = jnp.maximum(pt_max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio_d) / log_scale).astype(jnp.int32), 0, L - 1
    )
    radius = 3.0 * scale_factors[pred_level]

    du = kps[None, :, 0] - u[:, None]
    dv = kps[None, :, 1] - v[:, None]
    in_window = (jnp.abs(du) < radius[:, None]) & (jnp.abs(dv) < radius[:, None])
    level_ok = (kp_level[None, :] >= pred_level[:, None] - 1) & (
        kp_level[None, :] <= pred_level[:, None] + 1
    )
    # reprojection chi2 gate (mono 5.99, stereo 7.8 with ur residual)
    e2_mono = (du * du + dv * dv) / sigma2_levels[kp_level][None, :]
    dur = kp_ur[None, :] - ur[:, None]
    e2_stereo = (du * du + dv * dv + dur * dur) / sigma2_levels[kp_level][None, :]
    is_stereo = (kp_ur >= 0)[None, :]
    chi_ok = jnp.where(is_stereo, e2_stereo <= 7.815, e2_mono <= 5.991)

    pair_ok = in_window & level_ok & chi_ok & pt_ok[:, None] & kp_valid[None, :]
    dmat = hamming.descriptor_distance_matrix(pt_desc, kp_desc)
    dmat = jnp.where(pair_ok, dmat, matching.INF)
    best_kp = jnp.argmin(dmat, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(dmat, best_kp[:, None].astype(jnp.int64), axis=1)[:, 0]
    ok = best_dist <= max_descriptor_distance
    return jnp.where(ok, best_kp, -1), best_dist


# ----------------------------------------------------- neighbor-batched ops
#
# Local mapping visits ~10-20 covisible neighbor keyframes per new keyframe
# (reference local_mapping.py:560 triangulation loop, geometry_matchers.py:662
# search_and_fuse).  A device dispatch + synchronous readback per neighbor
# costs one full host<->device round trip each — the dominant cost of the
# back-end on a remote-attached TPU (~30 ms RTT measured through the tunnel).
# These vmapped variants run ALL neighbors as one XLA program with ONE packed
# readback; callers pad the neighbor axis to a power-of-two bucket so the
# compiled graph is reused across keyframes.

epipolar_triangulation_match_batch = jax.jit(
    jax.vmap(
        epipolar_triangulation_match,
        in_axes=(None, None, None, None, 0, 0, 0, 0, 0, 0, None, None),
    )
)
"""(B,)-stacked kf2 arrays + per-neighbor F/epipole -> idx2 (B, N1)."""


fuse_candidates_batch = jax.jit(
    jax.vmap(
        fuse_candidates,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                 None, None, None, None, None, None),
    )
)
"""(B,)-stacked candidate-point sets fused into (B,)-stacked target KFs."""


@jax.jit
def fuse_candidates_store_batch(
    # device-resident point store (Map.device_store())
    store_pos: jnp.ndarray,      # (S,3)
    store_desc: jnp.ndarray,     # (S,256)
    store_normal: jnp.ndarray,   # (S,3)
    store_min: jnp.ndarray,      # (S,)
    store_max: jnp.ndarray,      # (S,)
    store_valid: jnp.ndarray,    # (S,)
    # ONE shared candidate row set + per-target activity masks
    cand_idx: jnp.ndarray,       # (M,) int32 store rows (pad: -1)
    cand_valid: jnp.ndarray,     # (B,M) per-target candidate mask
    # (B,)-stacked targets
    kps: jnp.ndarray, kp_level: jnp.ndarray, kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray, kp_ur: jnp.ndarray, Tcw: jnp.ndarray,
    # shared geometry
    K: jnp.ndarray, bf: jnp.ndarray, image_bounds: jnp.ndarray,
    scale_factors: jnp.ndarray, sigma2_levels: jnp.ndarray,
    max_descriptor_distance,
):
    """``fuse_candidates`` fanned over B targets with the candidate payload
    GATHERED ON DEVICE from the resident point store — the host sends only
    (M,) indices + (B,M) masks instead of B stacked copies of
    position/descriptor/normal rows.  On a remote-attached TPU the re-upload
    of those rows (≈ B·M·0.3 kB per keyframe) dominated the fuse stage; the
    in-graph row gather costs a fraction of one tunnel RTT."""
    S = store_pos.shape[0]
    idx = jnp.clip(cand_idx, 0, S - 1)
    pts = store_pos[idx]
    pdesc = store_desc[idx]
    pnorm = store_normal[idx]
    pmin = store_min[idx]
    pmax = store_max[idx]
    pvalid = store_valid[idx] & (cand_idx >= 0)

    def one(cval, kps1, lvl1, des1, kval1, ur1, T1):
        return fuse_candidates(
            pts, pdesc, pnorm, pmin, pmax, pvalid & cval,
            kps1, lvl1, des1, kval1, ur1, T1, K, bf,
            image_bounds, scale_factors, sigma2_levels,
            max_descriptor_distance,
        )

    return jax.vmap(one)(cand_valid, kps, kp_level, kp_desc, kp_valid,
                         kp_ur, Tcw)


# NOTE (negative result, kept for the record): a "packed" variant of the
# two batch matchers that took per-keyframe device handles as jit TUPLE
# args and stacked them in-graph (to save ~8 jnp.stack dispatches per
# keyframe) measured ~5x SLOWER end-to-end through the axon remote backend
# — its per-ARGUMENT marshalling cost (50+ leaves) dwarfs the per-dispatch
# RTT the stacks cost.  Callers deliberately stack with jnp.stack instead.
#
# The *_kfstore variants below supersede both: neighbor payloads live in ONE
# device-resident stacked store (slam/kf_device_store.py) written once per
# keyframe, and each dispatch gathers its rows in-graph — no per-call stacks,
# no re-uploads, few small arguments.


@jax.jit
def epipolar_triangulation_match_kfstore(
    # kf1 (the new keyframe) — its own device handles
    kps1: jnp.ndarray, level1: jnp.ndarray, desc1: jnp.ndarray,
    free1: jnp.ndarray,
    # stacked KF device store (B, N, ...) + per-dispatch row selection
    s_kps: jnp.ndarray, s_lvl: jnp.ndarray, s_des: jnp.ndarray,
    rows: jnp.ndarray,          # (Bp,) int32 store rows (pad rows repeat)
    free2: jnp.ndarray,         # (Bp, N) host mask (False rows match nothing)
    F12: jnp.ndarray,           # (Bp, 3, 3)
    epipole2: jnp.ndarray,      # (Bp, 2)
    sigma2_levels: jnp.ndarray,
    max_descriptor_distance,
):
    """``epipolar_triangulation_match_batch`` with neighbor payloads gathered
    in-graph from the device-resident keyframe store."""
    kps2 = s_kps[rows]
    lvl2 = s_lvl[rows]
    des2 = s_des[rows]

    def one(k2, l2, d2, f2, F, ep):
        return epipolar_triangulation_match(
            kps1, level1, desc1, free1, k2, l2, d2, f2, F, ep,
            sigma2_levels, max_descriptor_distance,
        )[0]

    return jax.vmap(one)(kps2, lvl2, des2, free2, F12, epipole2)


@jax.jit
def fuse_candidates_kfstore(
    # device-resident point store (Map.device_store())
    store_pos, store_desc, store_normal, store_min, store_max, store_valid,
    # ONE shared candidate row set + per-target activity masks
    cand_idx, cand_valid,
    # stacked KF device store + per-dispatch target rows
    s_kps, s_lvl, s_des, s_val, s_ur,
    rows: jnp.ndarray,           # (Bp,) int32
    Tcw: jnp.ndarray,            # (Bp,4,4)
    # shared geometry
    K, bf, image_bounds, scale_factors, sigma2_levels,
    max_descriptor_distance,
):
    """``fuse_candidates_store_batch`` with the TARGET keyframes also
    gathered in-graph (point store rows + keyframe store rows): a fuse
    dispatch sends only indices, masks and poses across the tunnel."""
    S = store_pos.shape[0]
    idx = jnp.clip(cand_idx, 0, S - 1)
    pts = store_pos[idx]
    pdesc = store_desc[idx]
    pnorm = store_normal[idx]
    pmin = store_min[idx]
    pmax = store_max[idx]
    pvalid = store_valid[idx] & (cand_idx >= 0)

    def one(cval, row, T1):
        return fuse_candidates(
            pts, pdesc, pnorm, pmin, pmax, pvalid & cval,
            s_kps[row], s_lvl[row], s_des[row], s_val[row], s_ur[row],
            T1, K, bf, image_bounds, scale_factors, sigma2_levels,
            max_descriptor_distance,
        )

    return jax.vmap(one)(cand_valid, rows, Tcw)
