"""TPU-native (A)KAZE: nonlinear-diffusion scale space, Hessian
keypoints, M-LDB (AKAZE) / SURF-like 64-float (KAZE) descriptors.

Reference capability: pySLAM's KAZE / AKAZE presets wrap cv2.KAZE /
cv2.AKAZE (``feature_tracker_configs.py``); absent from this image's cv2
build, and in any case the algorithm is a natural TPU program: the
nonlinear scale space is a fixed number of explicit diffusion steps
(stencil convolutions — pure fused elementwise + shifts), detection is a
dense Hessian over the whole stack, and both descriptors are static
gather patterns.

  * SCALE SPACE: L_{t+1} = L_t + tau * div(g(|grad L|) grad L) with the
    PM g2 conductivity 1/(1 + |grad|^2 / k^2); ``sublevels`` diffusion
    targets with a stability-bounded step (tau <= 0.24);
  * DETECTOR: sigma-normalized det(Hessian) per sublevel, max across
    sublevels, spatially-uniform grid top-k;
  * AKAZE M-LDB: rotated grids of 2x2 / 3x3 / 4x4 cells; per cell mean
    intensity + mean dx + mean dy; all cell-pair comparisons per channel
    -> 486 bits (int8 bit-planes, MXU Hamming layout);
  * KAZE: SURF-style 4x4 x (sum dx, sum |dx|, sum dy, sum |dy|) over the
    DIFFUSED image gradients -> 64-d float, L2-normalized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import nms as nms_ops
from pyslam_tpu.ops.patches import _bilinear_gather


def _shift(x, dy, dx):
    return jnp.roll(x, (dy, dx), (0, 1))


def _grad(x):
    dx = 0.5 * (_shift(x, 0, -1) - _shift(x, 0, 1))
    dy = 0.5 * (_shift(x, -1, 0) - _shift(x, 1, 0))
    return dx, dy


def nonlinear_scale_space(img, sublevels: int = 4, steps_per: int = 6,
                          k: float = 0.03, tau: float = 0.24):
    """(H, W) [0,1] -> (S, H, W) diffused stack + per-sublevel sigmas."""
    L = img
    outs = []
    for s in range(sublevels):
        for _ in range(steps_per):
            dx, dy = _grad(L)
            g = 1.0 / (1.0 + (dx * dx + dy * dy) / (k * k))
            # divergence of g * grad via half-point fluxes
            fe = 0.5 * (g + _shift(g, 0, -1)) * (_shift(L, 0, -1) - L)
            fw = 0.5 * (g + _shift(g, 0, 1)) * (_shift(L, 0, 1) - L)
            fs = 0.5 * (g + _shift(g, -1, 0)) * (_shift(L, -1, 0) - L)
            fn = 0.5 * (g + _shift(g, 1, 0)) * (_shift(L, 1, 0) - L)
            L = L + tau * (fe + fw + fs + fn)
        outs.append(L)
    sigmas = np.sqrt(2.0 * tau * steps_per * np.arange(1, sublevels + 1))
    return jnp.stack(outs), sigmas


def _hessian_response(L, sigma):
    dx, dy = _grad(L)
    dxx, dxy = _grad(dx)
    _, dyy = _grad(dy)
    return (sigma ** 4) * (dxx * dyy - dxy * dxy)


def _mldb_pairs(cells: int):
    iu, ju = np.triu_indices(cells, 1)
    return iu.astype(np.int32), ju.astype(np.int32)


class AkazeExtractor:
    """(A)KAZE keypoints + descriptors with the FeatureData contract.

    descriptor='MLDB' (AKAZE, 486-bit int8 planes) or 'KAZE' (64-float).
    """

    def __init__(self, num_features: int = 1000, descriptor: str = "MLDB",
                 sublevels: int = 4, nms_cell: int = 8):
        assert descriptor in ("MLDB", "KAZE")
        self.num_features = num_features
        self.descriptor = descriptor
        self.sublevels = sublevels
        self.nms_cell = nms_cell
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2
        self._grids = [( _mldb_pairs(g * g), g) for g in (2, 3, 4)]

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(img, n):
            H, W = img.shape
            stack, sigmas = nonlinear_scale_space(img / 255.0,
                                                  self.sublevels)
            resp = jnp.stack([
                _hessian_response(stack[s], float(sigmas[s]))
                for s in range(self.sublevels)])
            best = resp.max(0)
            lvl = resp.argmax(0)
            xy, score, valid = nms_ops.grid_topk_keypoints(
                best, cell=self.nms_cell, per_cell=4, max_out=n)
            xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
            klvl = lvl[yi, xi]
            ksig = jnp.asarray(sigmas)[klvl]

            # orientation: gradient vector sum in a 6-sigma disc on the
            # keypoint's diffusion level
            dxs, dys = [], []
            for s in range(self.sublevels):
                dx, dy = _grad(stack[s])
                dxs.append(dx)
                dys.append(dy)
            dx_stack = jnp.stack(dxs)
            dy_stack = jnp.stack(dys)

            ring = jnp.arange(16) * (2 * np.pi / 16)

            def orient(x, y, s, li):
                rx = x + 3.0 * s * 8.0 * jnp.cos(ring)
                ry = y + 3.0 * s * 8.0 * jnp.sin(ring)
                gx = _bilinear_gather(dx_stack[li], rx, ry)
                gy = _bilinear_gather(dy_stack[li], rx, ry)
                return jnp.arctan2(gy.sum(), gx.sum())

            angs = jax.vmap(orient)(xy[:, 0], xy[:, 1], ksig, klvl)

            if self.descriptor == "MLDB":
                def describe(x, y, s, li, a):
                    cos, sin = jnp.cos(a), jnp.sin(a)
                    r = 5.0 * s * 8.0 + 6.0
                    bits = []
                    for (iu, ju), g in self._grids:
                        c = (jnp.arange(g) + 0.5) / g - 0.5
                        u, v = jnp.meshgrid(c, c, indexing="xy")
                        px = x + (cos * u - sin * v).ravel() * 2 * r
                        py = y + (sin * u + cos * v).ravel() * 2 * r
                        mi = _bilinear_gather(stack[li], px, py)
                        gx = _bilinear_gather(dx_stack[li], px, py)
                        gy = _bilinear_gather(dy_stack[li], px, py)
                        rgx = cos * gx + sin * gy
                        rgy = -sin * gx + cos * gy
                        for ch in (mi, rgx, rgy):
                            bits.append((ch[iu] < ch[ju]).astype(jnp.int8))
                    return jnp.concatenate(bits)

                desc = jax.vmap(describe)(xy[:, 0], xy[:, 1], ksig, klvl,
                                          angs)
            else:
                gi = (jnp.arange(20) - 9.5) / 20.0

                def describe(x, y, s, li, a):
                    cos, sin = jnp.cos(a), jnp.sin(a)
                    r = 10.0 * s * 8.0 + 12.0
                    u, v = jnp.meshgrid(gi, gi, indexing="xy")
                    px = x + (cos * u - sin * v).ravel() * 2 * r
                    py = y + (sin * u + cos * v).ravel() * 2 * r
                    gx = _bilinear_gather(dx_stack[li], px, py)
                    gy = _bilinear_gather(dy_stack[li], px, py)
                    rdx = cos * gx + sin * gy
                    rdy = -sin * gx + cos * gy
                    iy = (jnp.arange(400) // 20) // 5
                    ix = (jnp.arange(400) % 20) // 5
                    cell = iy * 4 + ix
                    seg = lambda val: jax.ops.segment_sum(val, cell, 16)
                    f = jnp.stack([seg(rdx), seg(jnp.abs(rdx)),
                                   seg(rdy), seg(jnp.abs(rdy))],
                                  axis=1).reshape(-1)
                    return f / jnp.maximum(jnp.linalg.norm(f), 1e-9)

                desc = jax.vmap(describe)(xy[:, 0], xy[:, 1], ksig, klvl,
                                          angs)

            sizes = 16.0 * ksig * 8.0 + 4.0
            return (xy, score, valid, desc, sizes,
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
