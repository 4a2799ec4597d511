"""FAST-9 corner detection + score as whole-image vectorized ops.

TPU-native replacement for the FAST stage of the reference's default ORB2
extractor (pySLAM wraps the ORB-SLAM2 C++ ``ORBextractor``,
``thirdparty/orbslam2_features/ORBextractor.cpp``).  Instead of per-pixel
branchy C code we evaluate the segment test for *all* pixels at once: 16
shifted copies of the image (the Bresenham circle), bright/dark masks, and a
run-of-9 test done with binary-doubling ANDs — pure VPU work, no loops over
pixels.  The returned score map is the exact FAST corner measure
max-over-segments of min |p_i - c| (the "maximum t for which it remains a
corner" definition), used downstream for NMS ranking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (standard FAST-16 offsets, clockwise from top):
# (dy, dx) pairs.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _shifted_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W): circle-neighbor intensity for each pixel (edge-rolled;
    borders are masked out by the caller)."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE], axis=0
    )


def _run9_all(mask: jnp.ndarray) -> jnp.ndarray:
    """mask: (16, H, W) bool -> (16, H, W): run of 9 consecutive True starting
    at each circle index (circular), via binary doubling on axis 0."""
    m = mask
    r2 = m & jnp.roll(m, -1, axis=0)
    r4 = r2 & jnp.roll(r2, -2, axis=0)
    r8 = r4 & jnp.roll(r4, -4, axis=0)
    return r8 & jnp.roll(m, -8, axis=0)


def _run9_min(diff: jnp.ndarray) -> jnp.ndarray:
    """diff: (16, H, W) -> per-start min over the 9-length circular window."""
    m = diff
    r2 = jnp.minimum(m, jnp.roll(m, -1, axis=0))
    r4 = jnp.minimum(r2, jnp.roll(r2, -2, axis=0))
    r8 = jnp.minimum(r4, jnp.roll(r4, -4, axis=0))
    return jnp.minimum(r8, jnp.roll(m, -8, axis=0))


@functools.partial(jax.jit, static_argnames=("border",))
def fast_score_map(img: jnp.ndarray, threshold: float, border: int = 16) -> jnp.ndarray:
    """FAST-9 corner score for every pixel (0 where not a corner).

    score = max over circular 9-windows of (min over the window of the
    intensity difference) — evaluated separately for the brighter and darker
    segment tests, maximum of the two.  Border pixels are zeroed.
    """
    nb = _shifted_stack(img)              # (16,H,W)
    d_bright = nb - img[None]             # > t for bright neighbors
    d_dark = img[None] - nb

    sb = jnp.max(_run9_min(d_bright), axis=0)
    sd = jnp.max(_run9_min(d_dark), axis=0)
    score = jnp.maximum(sb, sd)
    score = jnp.where(score > threshold, score, 0.0)

    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    return jnp.where(inside, score, 0.0)


@jax.jit
def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Zero out pixels that are not the strict local max of their 3x3 window."""
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    neigh = jnp.stack(
        [
            p[dy : dy + score.shape[0], dx : dx + score.shape[1]]
            for dy in range(3)
            for dx in range(3)
            if not (dy == 1 and dx == 1)
        ],
        axis=0,
    )
    is_max = score > jnp.max(neigh, axis=0)
    return jnp.where(is_max, score, 0.0)


def harris_score_map(img: jnp.ndarray, k: float = 0.04, block: int = 7) -> jnp.ndarray:
    """Harris response for ranking (ORB ranks FAST corners by Harris)."""
    from pyslam_tpu.ops.image import sobel_gradients

    gx, gy = sobel_gradients(img)
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    ker = jnp.ones((block, block), img.dtype) / (block * block)

    def box(x):
        p = jnp.pad(x, block // 2, mode="edge")[None, None]
        return jax.lax.conv_general_dilated(p, ker[None, None], (1, 1), "VALID")[0, 0]

    sxx, syy, sxy = box(ixx), box(iyy), box(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr
