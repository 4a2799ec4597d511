"""Oriented BRIEF (rBRIEF) descriptors + intensity-centroid orientation.

TPU-native replacement for the descriptor stage of the reference's default
ORB2 extractor (``thirdparty/orbslam2_features/ORBextractor.cpp``).  Design:

- Orientation: the intensity-centroid moments m10/m01 over the radius-15
  circular patch are computed for the WHOLE image as two convolutions with
  fixed (x*mask)/(y*mask) kernels, then sampled at keypoint locations — no
  per-keypoint patch gathers.
- Descriptors: a fixed 256-pair sampling pattern (generated once from a seeded
  Gaussian, BRIEF G-II scheme — deliberately NOT a copy of OpenCV's learned
  table; cross-implementation descriptor equality is not required, only
  self-consistency) is rotated by each keypoint's angle and sampled with
  nearest-neighbor gathers from the blurred image.  512 gathers x N keypoints
  as one vectorized take.

Descriptors are returned as unpacked 0/1 bit-planes (N, 256) int8 — the
native layout for the MXU Hamming matcher (see ops/hamming.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15           # descriptor support
MOMENT_RADIUS = 7           # orientation patch: SMALLER than the descriptor —
                            # wide moment patches pick up parallax-unstable
                            # neighbor structure (measured p90 angle error 56deg
                            # at r=15 vs 17deg at r=7 across a 4-frame gap)
PATTERN_RADIUS = 10         # max offset: rotated by any angle stays within
                            # the 32x32 patch (10*sqrt(2) = 14.1 <= 15) — a
                            # larger radius gets edge-clipped after rotation,
                            # which silently distorts descriptors per bin
NUM_BITS = 256


def _make_pattern(seed: int = 20240618) -> np.ndarray:
    """(256, 4) int8 pattern rows (x1, y1, x2, y2), Gaussian G-II sampling."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_RADIUS * 2 / 5.0
    pts = rng.normal(0.0, sigma, size=(NUM_BITS, 4))
    pts = np.clip(np.round(pts), -PATTERN_RADIUS, PATTERN_RADIUS)
    return pts.astype(np.int8)


PATTERN = jnp.asarray(_make_pattern())  # (256,4)


def _circle_offsets():
    """In-circle (dy, dx) offsets and their (dx, dy) weights for the moments.

    Per-keypoint gathers beat a 31x31 whole-image convolution on TPU: a
    1-in/1-out-channel conv cannot use the MXU and measured ~200ms/frame,
    while a (N_kp, n_offsets) gather is sub-millisecond.
    """
    r = MOMENT_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    dy = ys[mask].astype(np.int32)
    dx = xs[mask].astype(np.int32)
    return jnp.asarray(dy), jnp.asarray(dx)


_CIRC_DY, _CIRC_DX = _circle_offsets()


ANGLE_BINS = 30  # rBRIEF quantization: 2*pi/30 = 12 deg


def _moment_kernels():
    """(32,32) static x/y moment weight maps (circle of MOMENT_RADIUS around
    the patch center)."""
    r = MOMENT_RADIUS
    ys, xs = np.mgrid[0:32, 0:32]
    dx = xs - 16
    dy = ys - 16
    mask = (dx * dx + dy * dy) <= r * r
    return (
        jnp.asarray((dx * mask).astype(np.float32)),
        jnp.asarray((dy * mask).astype(np.float32)),
    )


_MOM_KX, _MOM_KY = _moment_kernels()


@jax.jit
def angles_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle from (N,32,32) patches, quantized to
    12-degree bins (original rBRIEF scheme — quantization keeps small moment
    jitter within a bin; a small MOMENT_RADIUS avoids parallax-unstable
    neighbor structure, see module docstring history)."""
    m10 = jnp.sum(patches * _MOM_KX[None], axis=(1, 2))
    m01 = jnp.sum(patches * _MOM_KY[None], axis=(1, 2))
    angle = jnp.arctan2(m01, m10)
    step = 2.0 * jnp.pi / ANGLE_BINS
    return jnp.round(angle / step) * step


@jax.jit
def keypoint_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle (radians) at (N,2) pixel coords (via the
    shared patch extraction; prefer angles_from_patches when patches exist)."""
    return angles_from_patches(extract_patches(img, xy))


@jax.jit
def brief_descriptors(
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF: (N, 256) int8 bits from rotated pattern comparisons.

    Patch-based formulation (12x faster than element gathers on TPU, measured
    8.6ms -> 0.7ms at 2000 keypoints): extract a dense 32x32 patch per
    keypoint with vmapped ``dynamic_slice`` (row-structured memory access XLA
    lowers well), then — because angles are already quantized to ANGLE_BINS —
    compare at STATIC precomputed per-bin offsets for all bins at once and
    select each keypoint's bin.  Static indices avoid the TPU's slow
    arbitrary-gather path entirely.
    """
    patches = extract_patches(img_blurred, xy)              # (N,32,32)
    bins = angle_bins(angles)                               # (N,)
    return brief_from_patches(patches, bins)


PATCH_SIZE = 32
PATCH_HALF = 16


@jax.jit
def extract_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """(N, 32, 32) patches centered (at [16,16]) on rounded keypoint coords."""
    h, w = img.shape
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - PATCH_HALF, 0, w - PATCH_SIZE)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - PATCH_HALF, 0, h - PATCH_SIZE)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (PATCH_SIZE, PATCH_SIZE))

    return jax.vmap(one)(y0, x0)


def angle_bins(angles: jnp.ndarray) -> jnp.ndarray:
    """Quantized-angle bin ids in [0, ANGLE_BINS)."""
    step = 2.0 * jnp.pi / ANGLE_BINS
    return jnp.mod(jnp.round(angles / step).astype(jnp.int32), ANGLE_BINS)


def _binned_pattern_indices():
    """(ANGLE_BINS, 256) flat patch indices for each rotated pattern point."""
    p = np.asarray(PATTERN, np.float32)
    out1 = np.zeros((ANGLE_BINS, NUM_BITS), np.int32)
    out2 = np.zeros((ANGLE_BINS, NUM_BITS), np.int32)
    for b in range(ANGLE_BINS):
        th = 2.0 * np.pi * b / ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        for which, out in ((0, out1), (2, out2)):
            px, py = p[:, which], p[:, which + 1]
            rx = np.clip(np.round(c * px - s * py), -(PATCH_HALF - 1), PATCH_HALF - 1)
            ry = np.clip(np.round(s * px + c * py), -(PATCH_HALF - 1), PATCH_HALF - 1)
            out[b] = ((ry + PATCH_HALF) * PATCH_SIZE + (rx + PATCH_HALF)).astype(np.int32)
    return jnp.asarray(out1), jnp.asarray(out2)


_BIN_IDX1, _BIN_IDX2 = _binned_pattern_indices()


def _bin_diff_matrices() -> jnp.ndarray:
    """(ANGLE_BINS, 1024, 256) selection-difference matrices D_b with
    D_b[idx2[k], k] = +1 and D_b[idx1[k], k] = -1.

    The comparison  patch[idx1] < patch[idx2]  becomes  (flat @ D_b) > 0 —
    ONE MXU matmul per bin instead of gathers.  Arbitrary-index gathers on
    TPU measured ~9ms for the descriptor sampling at N=2000; the matmul
    formulation is ~60 GFLOP over all bins, microseconds on the MXU.  Each
    column holds exactly one +1 and one -1 (or all zero when the pair
    degenerates to the same cell), so f32 results are exact differences and
    the strict '<' semantics carry over ((flat@D) > 0).
    """
    i1 = np.asarray(_BIN_IDX1)
    i2 = np.asarray(_BIN_IDX2)
    D = np.zeros((ANGLE_BINS, PATCH_SIZE * PATCH_SIZE, NUM_BITS), np.float32)
    for b in range(ANGLE_BINS):
        for k in range(NUM_BITS):
            D[b, i2[b, k], k] += 1.0
            D[b, i1[b, k], k] -= 1.0
    return jnp.asarray(D)


_BIN_DIFF = _bin_diff_matrices()


@jax.jit
def brief_from_patches(patches: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """(N,32,32) patches + (N,) bin ids -> (N,256) int8 descriptor bits."""
    n = patches.shape[0]
    flat = patches.reshape(n, PATCH_SIZE * PATCH_SIZE)

    def body(b, acc):
        proj = jax.lax.dot_general(
            flat, _BIN_DIFF[b],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 256)
        return jnp.where((bins == b)[:, None], proj, acc)

    acc = jax.lax.fori_loop(
        0, ANGLE_BINS, body, jnp.zeros((n, NUM_BITS), jnp.float32)
    )
    return (acc > 0).astype(jnp.int8)
