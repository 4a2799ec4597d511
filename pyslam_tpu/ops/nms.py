"""Fixed-shape keypoint selection from score maps: grid top-k NMS.

TPU-native replacement for the reference's keypoint-distribution machinery
(octree NMS in ``thirdparty/orbslam2_features/ORBextractor.cpp`` and the
SAT/KDT/SSC NMS variants in pySLAM ``pyslam/utilities/features.py:219-372``).
A per-cell top-k over a regular grid gives the same spatial-uniformity effect
as the octree split with fully static shapes: every image yields exactly
``max_out`` keypoint slots (invalid slots flagged, score -inf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -jnp.inf


@functools.partial(jax.jit, static_argnames=("cell", "per_cell", "max_out"))
def grid_topk_keypoints(
    score: jnp.ndarray, cell: int = 16, per_cell: int = 4, max_out: int = 1000
):
    """Select up to ``max_out`` keypoints, spatially distributed.

    1. tile the score map into (cell x cell) blocks,
    2. keep the ``per_cell`` best responses per block (octree-like uniformity),
    3. global top-``max_out`` among survivors.

    Returns (xy: (max_out, 2) float32 [x, y], scores: (max_out,), valid mask).
    """
    h, w = score.shape
    gh = -(-h // cell)
    gw = -(-w // cell)
    pad_h = gh * cell - h
    pad_w = gw * cell - w
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)), constant_values=0.0)
    s = jnp.where(s <= 0.0, NEG, s)  # non-corners never selected

    blocks = s.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    vals, idx = jax.lax.top_k(blocks, per_cell)  # (G, per_cell)

    # recover absolute coords
    cy = idx // cell
    cx = idx % cell
    gy = (jnp.arange(gh * gw) // gw)[:, None]
    gx = (jnp.arange(gh * gw) % gw)[:, None]
    ys = gy * cell + cy
    xs = gx * cell + cx

    flat_vals = vals.reshape(-1)
    flat_ys = ys.reshape(-1)
    flat_xs = xs.reshape(-1)

    # small score maps can have fewer candidates than max_out: clamp k and
    # pad the fixed-shape output with invalid slots
    k = min(max_out, flat_vals.shape[0])
    top_vals, top_i = jax.lax.top_k(flat_vals, k)
    sel_y = flat_ys[top_i]
    sel_x = flat_xs[top_i]
    valid = jnp.isfinite(top_vals)
    xy = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.float32)
    scores = jnp.where(valid, top_vals, 0.0)
    if k < max_out:
        pad = max_out - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), jnp.float32)])
        scores = jnp.concatenate([scores, jnp.zeros((pad,), scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return xy, scores, valid
