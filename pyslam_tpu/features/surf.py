"""TPU-native SURF (box-filter Hessian detector + Haar descriptor).

Reference capability: pySLAM's SURF preset wraps cv2.xfeatures2d.SURF
(``feature_tracker_configs.py``), absent from this image's cv2 build.
The SURF algorithm is reimplemented natively — and it maps well to the
TPU: every box filter is 4-8 taps into ONE integral image, evaluated
densely for the whole scale stack as a batched gather.

  * detector: det(H) = Dxx*Dyy - (0.9*Dxy)^2 from 9/15/21/27-px box
    approximations of the Gaussian second derivatives; spatially-uniform
    grid top-k over the max-across-scales response;
  * orientation: dominant direction of Haar-wavelet responses in a
    circular neighbourhood (vector sum — the sliding-window variant's
    smooth analog);
  * descriptor: 4x4 subregions of a 20s x 20s oriented grid, each
    contributing (sum dx, sum |dx|, sum dy, sum |dy|) of Haar responses
    -> 64-d, L2-normalized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops

_LOBES = (9, 15, 21, 27)     # box filter sizes (first octave, SURF paper)


def _integral(img):
    return jnp.pad(jnp.cumsum(jnp.cumsum(img, 0), 1), ((1, 0), (1, 0)))


def _box(ii, y1, x1, y2, x2):
    """Sum over [y1, y2) x [x1, x2) with clamped int corners."""
    H = ii.shape[0] - 1
    W = ii.shape[1] - 1
    y1 = jnp.clip(y1, 0, H)
    y2 = jnp.clip(y2, 0, H)
    x1 = jnp.clip(x1, 0, W)
    x2 = jnp.clip(x2, 0, W)
    return ii[y2, x2] - ii[y1, x2] - ii[y2, x1] + ii[y1, x1]


def _hessian_det(ii, L, ys, xs):
    """det(H) response of the L-px box filter at integer grid (ys, xs)."""
    l3 = L // 3
    h3 = l3 // 2
    half = L // 2
    norm = 1.0 / (L * L)
    w = 2 * l3 - 1
    # Dyy: whole-window sum minus 3x the middle l3-tall band (weights
    # 1, -2, 1 over the three stacked boxes); Dxx transposed; Dxy = four
    # diagonal quadrant boxes
    dyy = (_box(ii, ys - half, xs - w // 2, ys + half + 1, xs + w // 2 + 1)
           - 3.0 * _box(ii, ys - h3, xs - w // 2, ys + h3 + 1,
                        xs + w // 2 + 1))
    dxx = (_box(ii, ys - w // 2, xs - half, ys + w // 2 + 1, xs + half + 1)
           - 3.0 * _box(ii, ys - w // 2, xs - h3, ys + w // 2 + 1,
                        xs + h3 + 1))
    dxy = (_box(ii, ys - l3, xs + 1, ys, xs + l3 + 1)
           + _box(ii, ys + 1, xs - l3, ys + l3 + 1, xs)
           - _box(ii, ys - l3, xs - l3, ys, xs)
           - _box(ii, ys + 1, xs + 1, ys + l3 + 1, xs + l3 + 1))
    dxx = dxx * norm
    dyy = dyy * norm
    dxy = dxy * norm
    return dxx * dyy - (0.9 * dxy) ** 2


def _haar(ii, ys, xs, s):
    """Haar dx, dy responses (box size 2s) at float coords (rounded)."""
    yi = ys.astype(jnp.int32)
    xi = xs.astype(jnp.int32)
    si = jnp.maximum(s.astype(jnp.int32), 1)
    dx = (_box(ii, yi - si, xi, yi + si, xi + si)
          - _box(ii, yi - si, xi - si, yi + si, xi))
    dy = (_box(ii, yi, xi - si, yi + si, xi + si)
          - _box(ii, yi - si, xi - si, yi, xi + si))
    return dx, dy


class SurfExtractor:
    """SURF keypoints + 64-d descriptors with the FeatureData contract."""

    def __init__(self, num_features: int = 1000, nms_cell: int = 8):
        self.num_features = num_features
        self.nms_cell = nms_cell
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(img, n):
            H, W = img.shape
            ii = _integral(img / 255.0)
            ys, xs = jnp.mgrid[0:H, 0:W]
            responses = jnp.stack(
                [_hessian_det(ii, L, ys, xs) for L in _LOBES])  # (S, H, W)
            best = responses.max(0)
            lobe = responses.argmax(0)
            xy, resp, valid = nms_ops.grid_topk_keypoints(
                best, cell=self.nms_cell, per_cell=4, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
            scale = 1.2 * jnp.asarray(_LOBES)[lobe[yi, xi]] / 9.0  # s

            # orientation: vector sum of Haar responses on a radius-6s ring
            def orient(x, y, s):
                ang = jnp.arange(12) * (2 * np.pi / 12)
                rx = x + 4.0 * s * jnp.cos(ang)
                ry = y + 4.0 * s * jnp.sin(ang)
                dx, dy = _haar(ii, ry, rx, 2.0 * s)
                return jnp.arctan2(dy.sum(), dx.sum())

            angs = jax.vmap(orient)(xy[:, 0], xy[:, 1], scale)

            # descriptor: 4x4 cells x 5x5 samples of oriented Haar grid
            gi = (jnp.arange(20) - 9.5) / 20.0            # in [-0.5, 0.5)

            def describe(x, y, s, a):
                cos, sin = jnp.cos(a), jnp.sin(a)
                u, v = jnp.meshgrid(gi, gi, indexing="xy")   # (20, 20)
                px = x + (cos * u - sin * v).ravel() * 20.0 * s
                py = y + (sin * u + cos * v).ravel() * 20.0 * s
                dx, dy = _haar(ii, py, px, s)
                # rotate responses into the keypoint frame
                rdx = cos * dx + sin * dy
                rdy = -sin * dx + cos * dy
                cell = (jnp.arange(400) // 100) * 0  # recomputed below
                iy = (jnp.arange(400) // 20) // 5
                ix = (jnp.arange(400) % 20) // 5
                cell = iy * 4 + ix                    # (400,) in [0, 16)
                seg = lambda val: jax.ops.segment_sum(val, cell, 16)
                feats = jnp.stack(
                    [seg(rdx), seg(jnp.abs(rdx)),
                     seg(rdy), seg(jnp.abs(rdy))], axis=1).reshape(-1)
                return feats / jnp.maximum(jnp.linalg.norm(feats), 1e-9)

            desc = jax.vmap(describe)(xy[:, 0], xy[:, 1], scale, angs)
            return (xy, resp, valid, desc, 2.0 * scale * 9.0,
                    jnp.degrees(angs) % 360.0)

        self._run = _run

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        xy, resp, valid, desc, sizes, angles = self._run(
            jnp.asarray(img), self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=angles, size=sizes, response=resp, desc=desc, valid=valid)
