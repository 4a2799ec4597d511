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
                          k: float | None = None, tau: float = 0.24):
    """(H, W) [0,1] -> (S, H, W) diffused stack + per-sublevel sigmas.

    ``k`` (PM contrast) defaults to the A-KAZE rule: the 70th percentile of
    gradient magnitudes on the (lightly smoothed) input — a fixed k either
    over- or under-diffuses depending on image contrast."""
    L = img
    if k is None:
        dx0, dy0 = _grad(L)
        mag = jnp.sqrt(dx0 * dx0 + dy0 * dy0)
        k = jnp.maximum(jnp.quantile(mag, 0.7), 1e-4)
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
                 sublevels: int = 4, nms_cell: int = 8, octaves: int = 4):
        assert descriptor in ("MLDB", "KAZE")
        self.num_features = num_features
        self.descriptor = descriptor
        self.sublevels = sublevels
        self.nms_cell = nms_cell
        self.octaves = octaves
        # 'level' in FeatureData = octave index; the SLAM core's sigma
        # weighting uses these per-level factors
        self.scale_factors = (2.0 ** np.arange(octaves)).astype(np.float32)
        self.sigma2 = self.scale_factors ** 2
        self.inv_sigma2 = 1.0 / self.sigma2
        self._grids = [( _mldb_pairs(g * g), g) for g in (2, 3, 4)]

        def _octave(img01, n):
            """Detect + describe on ONE octave's nonlinear scale space.
            Returns octave-local (xy, score, valid, desc, angs, ksig)."""
            H, W = img01.shape
            stack, sigmas = nonlinear_scale_space(img01, self.sublevels)
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

            dxs, dys = [], []
            for s in range(self.sublevels):
                dx, dy = _grad(stack[s])
                dxs.append(dx)
                dys.append(dy)
            dx_stack = jnp.stack(dxs)
            dy_stack = jnp.stack(dys)

            # orientation by intensity centroid over a 7-sigma disc (the
            # ORB moment method, rotation-equivariant and far more stable
            # than a sparse gradient ring sum, which self-cancels on edges
            # and returns noise — measured ±140 deg spread under a pure
            # 15-degree rotation of a real image)
            og = jnp.linspace(-1.0, 1.0, 13)
            ou, ov = jnp.meshgrid(og, og, indexing="xy")
            ou, ov = ou.ravel(), ov.ravel()
            odisc = ((ou * ou + ov * ov) <= 1.0).astype(jnp.float32)

            def orient(x, y, s, li):
                rad = 7.0 * s
                mi = _bilinear_gather(stack[li], x + ou * rad,
                                      y + ov * rad) * odisc
                return jnp.arctan2(jnp.sum(mi * ov), jnp.sum(mi * ou))

            angs = jax.vmap(orient)(xy[:, 0], xy[:, 1], ksig, klvl)

            if self.descriptor == "MLDB":
                def describe(x, y, s, li, a):
                    cos, sin = jnp.cos(a), jnp.sin(a)
                    # M-LDB samples a ~20-sigma square patch (half-width
                    # ~10 sigma): sampling much wider encodes global scene
                    # context and destroys repeatability on real images
                    r = 10.0 * s + 3.0
                    bits = []
                    for (iu, ju), g in self._grids:
                        c = (jnp.arange(g) + 0.5) / g - 0.5
                        u, v = jnp.meshgrid(c, c, indexing="xy")
                        u, v = u.ravel(), v.ravel()
                        # M-LDB compares cell MEANS; approximate each cell's
                        # mean with a 2x2 subsample average (single-point
                        # sampling aliases badly once cells span many pixels)
                        off = jnp.array([-0.25, 0.25]) / g
                        du, dv = jnp.meshgrid(off, off, indexing="xy")
                        uu = (u[:, None] + du.ravel()[None, :]).ravel()
                        vv = (v[:, None] + dv.ravel()[None, :]).ravel()
                        px = x + (cos * uu - sin * vv) * 2 * r
                        py = y + (sin * uu + cos * vv) * 2 * r
                        mi = _bilinear_gather(stack[li], px, py)
                        gx = _bilinear_gather(dx_stack[li], px, py)
                        gy = _bilinear_gather(dy_stack[li], px, py)
                        rgx = cos * gx + sin * gy
                        rgy = -sin * gx + cos * gy
                        for ch in (mi, rgx, rgy):
                            cm = ch.reshape(g * g, 4).mean(1)
                            bits.append((cm[iu] < cm[ju]).astype(jnp.int8))
                    return jnp.concatenate(bits)
            else:
                gi = (jnp.arange(20) - 9.5) / 20.0

                def describe(x, y, s, li, a):
                    cos, sin = jnp.cos(a), jnp.sin(a)
                    # SURF-style 20-sigma patch (half-width ~10 sigma)
                    r = 10.0 * s + 3.0
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

            desc = jax.vmap(describe)(xy[:, 0], xy[:, 1], ksig, klvl, angs)
            return xy, score, valid, desc, angs, ksig

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(img, n):
            # multi-octave nonlinear scale space (A-KAZE runs 4 downsampled
            # octaves; a single octave only covers a 2x sigma range and
            # cannot match across real zoom — churchill 1->2 is 2.3x):
            # detect/describe per octave, map to full-res coordinates, and
            # keep the global top-n by response
            img01 = img / 255.0
            parts = []
            for o in range(self.octaves):
                f = 2.0 ** o
                if min(img01.shape) >= 2 * self.nms_cell:
                    xy, score, valid, desc, angs, ksig = _octave(img01, n)
                    xy_g = xy * f + (f - 1.0) * 0.5
                    parts.append((xy_g, jnp.where(valid, score, -jnp.inf),
                                  valid, desc, angs, ksig * f,
                                  jnp.full(score.shape, o, jnp.int32)))
                # 2x2 average pool for the next octave (crop to even dims)
                He, We = (img01.shape[0] // 2) * 2, (img01.shape[1] // 2) * 2
                img01 = img01[:He, :We].reshape(
                    He // 2, 2, We // 2, 2).mean((1, 3))
            xy = jnp.concatenate([p[0] for p in parts])
            score = jnp.concatenate([p[1] for p in parts])
            valid = jnp.concatenate([p[2] for p in parts])
            desc = jnp.concatenate([p[3] for p in parts])
            angs = jnp.concatenate([p[4] for p in parts])
            ksig = jnp.concatenate([p[5] for p in parts])
            octv = jnp.concatenate([p[6] for p in parts])
            top_score, top_i = jax.lax.top_k(score, n)
            xy = xy[top_i]
            valid = valid[top_i] & jnp.isfinite(top_score)
            desc = desc[top_i]
            angs = angs[top_i]
            sizes = 20.0 * ksig[top_i] + 6.0
            return (xy, jnp.where(valid, top_score, 0.0), valid, desc, sizes,
                    jnp.degrees(angs) % 360.0, octv[top_i])

        self._run = _run

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        xy, resp, valid, desc, sizes, angles, octv = self._run(
            jnp.asarray(img), self.num_features)
        return FeatureData(
            xy=xy, level=octv,
            angle=angles, size=sizes, response=resp, desc=desc, valid=valid)
