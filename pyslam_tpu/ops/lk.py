"""Pyramidal Lucas-Kanade optical flow in pure JAX.

TPU-native replacement for the reference's LK feature tracker
(pySLAM ``pyslam/local_features/feature_tracker.py:202`` ``LkFeatureTracker``
over cv2.calcOpticalFlowPyrLK).  All keypoints advance in parallel: per level
(coarse to fine), a fixed number of Gauss-Newton iterations solve the 2x2
flow system from bilinear-sampled patch gradients — batched gathers + small
einsums, fully jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import image as image_ops


def _patch_offsets(radius: int):
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return jnp.asarray(xs.reshape(-1), jnp.float32), jnp.asarray(
        ys.reshape(-1), jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("radius", "iters"))
def lk_flow_level(img0, img1, pts0, guess, radius=7, iters=8):
    """One-level LK: track pts0 (N,2) from img0 to img1 starting at guess."""
    ox, oy = _patch_offsets(radius)
    gx0, gy0 = image_ops.sobel_gradients(img0)

    def sample(img, xy):
        # (N,P) patch samples via bilinear interp
        px = xy[:, 0:1] + ox[None, :]
        py = xy[:, 1:2] + oy[None, :]
        return image_ops.bilinear_sample(img, jnp.stack([px, py], -1))

    t0 = sample(img0, pts0)                       # template (N,P)
    Ix = sample(gx0, pts0) / 8.0                  # sobel scale
    Iy = sample(gy0, pts0) / 8.0
    # 2x2 structure tensor per point
    A11 = jnp.sum(Ix * Ix, axis=1)
    A12 = jnp.sum(Ix * Iy, axis=1)
    A22 = jnp.sum(Iy * Iy, axis=1)
    det = A11 * A22 - A12 * A12
    good = det > 1e-4
    det_s = jnp.where(good, det, 1.0)

    def body(_, cur):
        t1 = sample(img1, cur)
        e = t1 - t0                                # (N,P)
        b1 = jnp.sum(Ix * e, axis=1)
        b2 = jnp.sum(Iy * e, axis=1)
        du = -(A22 * b1 - A12 * b2) / det_s
        dv = -(-A12 * b1 + A11 * b2) / det_s
        step = jnp.stack([du, dv], axis=1)
        step = jnp.clip(step, -radius, radius)
        return cur + jnp.where(good[:, None], step, 0.0)

    out = jax.lax.fori_loop(0, iters, body, guess)
    # tracking quality: residual after convergence
    res = jnp.mean(jnp.abs(sample(img1, out) - t0), axis=1)
    h, w = img0.shape
    inside = (
        (out[:, 0] > radius) & (out[:, 0] < w - radius)
        & (out[:, 1] > radius) & (out[:, 1] < h - radius)
    )
    return out, good & inside, res


@functools.partial(jax.jit, static_argnames=("num_levels", "radius", "iters"))
def lk_track_pyramidal(img0, img1, pts0, num_levels=3, radius=7, iters=8):
    """Coarse-to-fine LK. Returns (pts1, ok_mask, residuals)."""
    pyr0 = image_ops.build_pyramid(img0, num_levels, 2.0)
    pyr1 = image_ops.build_pyramid(img1, num_levels, 2.0)
    scale = 2.0 ** (num_levels - 1)
    guess = pts0 / scale
    ok = jnp.ones((pts0.shape[0],), bool)
    res = jnp.zeros((pts0.shape[0],))
    for lv in range(num_levels - 1, -1, -1):
        s = 2.0 ** lv
        out, ok_lv, res = lk_flow_level(
            pyr0[lv], pyr1[lv], pts0 / s, guess, radius, iters
        )
        ok = ok & ok_lv
        guess = out * 2.0 if lv > 0 else out
    return guess, ok, res
