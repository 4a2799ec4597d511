"""Masked descriptor matching on dense distance matrices.

TPU-native replacement for the reference's BF/FLANN matchers and the C++
``pyslam_utils`` match-filter helpers (pySLAM ``pyslam/local_features/
feature_matcher.py:209`` ``goodMatchesOneToOne``, ``:260`` row matching, and
``cpp/utils/``).  Instead of kd-trees/FLANN we compute full (padded) distance
matrices (see :mod:`pyslam_tpu.ops.hamming`) and express ratio tests, mutual
consistency, and one-to-one resolution as masked argmin/top-2 reductions —
fixed shapes, no host sync.

Conventions: invalid rows/cols are masked with +INF distance; match index -1
means "no match"; all functions are jit-compatible with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)


def mask_distance_matrix(
    dmat: jnp.ndarray,
    valid_a: jnp.ndarray | None,
    valid_b: jnp.ndarray | None,
    extra_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Set distances of invalid rows/cols (and optionally masked pairs) to INF."""
    d = dmat.astype(jnp.float32)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, INF)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, INF)
    if extra_mask is not None:
        d = jnp.where(extra_mask, d, INF)
    return d


def top2_along_rows(d: jnp.ndarray):
    """Best and second-best per row: (d1, i1, d2)."""
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    d_masked = d.at[jnp.arange(d.shape[0]), i1].set(INF)
    d2 = jnp.min(d_masked, axis=1)
    return d1, i1, d2


@functools.partial(jax.jit, static_argnames=("cross_check",))
def match_ratio_test(
    dmat: jnp.ndarray,
    max_distance: float,
    ratio: float = 0.75,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    cross_check: bool = True,
    extra_mask: jnp.ndarray | None = None,
):
    """KNN-2 matching with Lowe ratio test and optional mutual cross-check.

    Returns (idx_b: (N,) int32 with -1 for unmatched, dist: (N,) float32).
    Mirrors the reference's ``goodMatchesOneToOne`` semantics: each A-feature
    takes its best B-feature if d1 < ratio*d2 and d1 <= max_distance; the
    cross-check then enforces one-to-one by keeping, for every B, only the A
    with minimal distance (the reference resolves duplicates the same way).
    """
    d = mask_distance_matrix(dmat, valid_a, valid_b, extra_mask)
    d1, i1, d2 = top2_along_rows(d)
    ok = (d1 <= max_distance) & (d1 < ratio * d2)

    if cross_check:
        # one-to-one: B column j accepts only the row with minimal distance
        n, m = d.shape
        cand_d = jnp.where(ok, d1, INF)
        # scatter-min: per column, minimal candidate distance
        col_min = jnp.full((m,), INF).at[i1].min(cand_d)
        winner = cand_d <= col_min[i1] + 1e-6
        # tie-break deterministically by row index: keep the smallest row id
        row_ids = jnp.arange(n, dtype=jnp.int32)
        col_best_row = (
            jnp.full((m,), jnp.int32(n))
            .at[i1]
            .min(jnp.where(winner & ok, row_ids, jnp.int32(n)))
        )
        ok = ok & winner & (col_best_row[i1] == row_ids)

    idx = jnp.where(ok, i1, -1).astype(jnp.int32)
    return idx, jnp.where(ok, d1, INF)


@jax.jit
def match_nn(
    dmat: jnp.ndarray,
    max_distance: float,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    extra_mask: jnp.ndarray | None = None,
):
    """Plain nearest-neighbor matching with a distance gate (no ratio test)."""
    d = mask_distance_matrix(dmat, valid_a, valid_b, extra_mask)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    ok = d1 <= max_distance
    return jnp.where(ok, i1, -1).astype(jnp.int32), jnp.where(ok, d1, INF)


@functools.partial(jax.jit, static_argnames=("num_bins", "keep_top"))
def rotation_histogram_filter(
    angles_a: jnp.ndarray,
    angles_b_matched: jnp.ndarray,
    match_ok: jnp.ndarray,
    num_bins: int = 30,
    keep_top: int = 3,
) -> jnp.ndarray:
    """Orientation-consistency filter (reference ``rotation_histogram.py``).

    Bins the angle difference of each tentative match into ``num_bins`` over
    360 deg, keeps only matches falling into the ``keep_top`` most-populated
    bins.  Angles are in degrees.  Returns the filtered boolean mask.
    """
    rot = angles_a - angles_b_matched
    rot = jnp.where(rot < 0.0, rot + 360.0, rot)
    factor = num_bins / 360.0
    b = jnp.round(rot * factor).astype(jnp.int32)
    b = jnp.where(b == num_bins, 0, b)
    b = jnp.clip(b, 0, num_bins - 1)
    counts = jnp.zeros((num_bins,), jnp.int32).at[b].add(match_ok.astype(jnp.int32))
    _, top_bins = jax.lax.top_k(counts, keep_top)
    in_top = jnp.any(b[:, None] == top_bins[None, :], axis=1)
    return match_ok & in_top


@functools.partial(jax.jit, static_argnames=())
def row_stereo_match(
    dmat: jnp.ndarray,
    rows_a: jnp.ndarray,
    rows_b: jnp.ndarray,
    disp_a_minus_b: jnp.ndarray,
    max_distance: float,
    row_tol: float,
    min_disp: float,
    max_disp: float,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    ratio: float = 0.9,
):
    """Rectified-stereo row-constrained matching (reference
    ``feature_matcher.py:260`` row matching + ``frame.py:1122``
    ``compute_stereo_matches``): only pairs on (almost) the same scanline with
    positive disparity inside [min_disp, max_disp] are candidates.

    disp_a_minus_b: (N, M) precomputed xL - xR disparity for each pair.
    """
    pair_ok = (
        (jnp.abs(rows_a[:, None] - rows_b[None, :]) <= row_tol)
        & (disp_a_minus_b >= min_disp)
        & (disp_a_minus_b <= max_disp)
    )
    return match_ratio_test(
        dmat,
        max_distance,
        ratio=ratio,
        valid_a=valid_a,
        valid_b=valid_b,
        cross_check=True,
        extra_mask=pair_ok,
    )
