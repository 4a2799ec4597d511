"""Incremental Gaussian-splatting dense mapping (TPU-native MonoGS analog).

Mirrors the reference's GAUSSIAN_SPLATTING volumetric integrator
(pySLAM ``pyslam/dense/volumetric_integrator_gaussian_splatting.py:59-77``
over the CUDA MonoGS backend) with the pure-JAX tile rasterizer from
``ops/gaussian_splatting.py``:

- fixed-capacity gaussian store (static shapes; reseeding fills free slots
  host-side, so the jitted optimize step never recompiles),
- per keyframe: seed new gaussians from backprojected depth where the render
  is under-covered, then a few Adam steps against a window of recent
  keyframe views (color L1 + depth L1),
- rebuild() re-optimizes from loop-corrected poses,
- same queue/save/load/point-cloud surface as the TSDF integrator.
"""

from __future__ import annotations

from collections import deque

import numpy as np

import jax.numpy as jnp

from pyslam_tpu.ops import gaussian_splatting as gs
from pyslam_tpu.utils.logging import Printer


class GaussianSplattingVolume:
    """Gaussian store + optimizer with the TSDFVolume duck-type surface."""

    def __init__(self, capacity: int = 60_000, render_hw=None, tile_k: int = 48,
                 steps_per_kf: int = 30, window: int = 3, seed_stride: int = 4,
                 depth_trunc: float = 20.0, channels: int = 1):
        self.capacity = capacity
        self.tile_k = tile_k
        self.steps_per_kf = steps_per_kf
        self.window = window
        self.seed_stride = seed_stride
        self.depth_trunc = depth_trunc
        self.channels = channels
        self.render_hw = render_hw
        self._views: deque = deque(maxlen=window)
        self.reset()

    # ------------------------------------------------------------- storage
    def reset(self):
        c = self.capacity
        self.g = gs.Gaussians(
            means=jnp.zeros((c, 3), jnp.float32),
            log_scales=jnp.full((c, 3), -10.0, jnp.float32),
            quats=jnp.tile(jnp.asarray([1, 0, 0, 0], jnp.float32), (c, 1)),
            opacity_logit=jnp.full((c,), -10.0, jnp.float32),
            colors=jnp.zeros((c, self.channels), jnp.float32),
            valid=jnp.zeros((c,), bool),
        )
        self.num_used = 0
        self.opt_state = None
        self._views.clear()

    def _insert(self, seeds: dict):
        n = len(seeds["means"])
        free = self.capacity - self.num_used
        if n > free:
            # thin the incoming seeds to the free budget
            sel = np.linspace(0, n - 1, free).astype(int) if free > 0 else []
            seeds = {k: v[sel] for k, v in seeds.items()}
            n = len(seeds["means"])
        if n == 0:
            return 0
        s, e = self.num_used, self.num_used + n
        g = self.g
        self.g = gs.Gaussians(
            means=g.means.at[s:e].set(seeds["means"]),
            log_scales=g.log_scales.at[s:e].set(seeds["log_scales"]),
            quats=g.quats.at[s:e].set(seeds["quats"]),
            opacity_logit=g.opacity_logit.at[s:e].set(seeds["opacity_logit"]),
            colors=g.colors.at[s:e].set(seeds["colors"]),
            valid=g.valid.at[s:e].set(True),
        )
        self.num_used = e
        # Adam state is keyed to parameter pytrees of fixed shape; moments for
        # overwritten free slots were zero (params never moved), safe to keep
        return n

    # ----------------------------------------------------------- integrate
    def _prep(self, img, depth, K):
        h, w = img.shape[:2]
        if self.render_hw is None:
            # crop to tile multiples once, first keyframe fixes the raster size
            self.render_hw = ((h // gs.TILE) * gs.TILE, (w // gs.TILE) * gs.TILE)
        rh, rw = self.render_hw
        img_c = np.asarray(img, np.float32)[:rh, :rw]
        if img_c.ndim == 2:
            img_c = img_c[..., None]
        dep_c = np.asarray(depth, np.float32)[:rh, :rw]
        return img_c / 255.0, dep_c

    def integrate(self, depth, intensity, Twc, K):
        img_t, dep_t = self._prep(intensity, depth, K)
        rh, rw = self.render_hw
        Tcw = np.linalg.inv(Twc)

        # coverage-gated seeding: render, then only seed pixels the current
        # model does not explain
        if self.num_used > 0:
            _, acc, _ = gs.rasterize(
                self.g, jnp.asarray(Tcw, jnp.float32), jnp.asarray(K, jnp.float32),
                rh, rw, self.tile_k,
            )
            need = np.asarray(acc) < 0.5
        else:
            need = np.ones((rh, rw), bool)
        dep_seed = np.where(need, dep_t, 0.0)
        seeds = gs.seed_from_depth(
            dep_seed, img_t[..., 0] * 255.0, np.asarray(Twc), np.asarray(K),
            stride=self.seed_stride, max_depth=self.depth_trunc,
        )
        self._insert(seeds)

        self._views.append(
            (np.asarray(Tcw, np.float32), img_t.astype(np.float32),
             np.where(dep_t < self.depth_trunc, dep_t, 0.0).astype(np.float32))
        )
        self._optimize(K)

    def _optimize(self, K):
        rh, rw = self.render_hw
        B = len(self._views)
        Tcws = jnp.asarray(np.stack([v[0] for v in self._views]))
        targets = jnp.asarray(np.stack([v[1] for v in self._views]))
        depths = jnp.asarray(np.stack([v[2] for v in self._views]))
        self.g, self.opt_state, losses = gs.optimize_gaussians(
            self.g, self.opt_state, Tcws, jnp.asarray(K, jnp.float32),
            targets, depths, rh, rw, self.tile_k, self.steps_per_kf,
        )
        return float(np.asarray(losses)[-1])

    def render(self, Tcw, K):
        rh, rw = self.render_hw
        color, acc, depth = gs.rasterize(
            self.g, jnp.asarray(Tcw, jnp.float32), jnp.asarray(K, jnp.float32),
            rh, rw, self.tile_k,
        )
        return np.asarray(color), np.asarray(acc), np.asarray(depth)

    # -------------------------------------------------------------- output
    def extract_point_cloud(self):
        n = self.num_used
        pts = np.asarray(self.g.means[:n])
        cols = np.asarray(self.g.colors[:n])
        op = np.asarray(jnp.asarray(self.g.opacity_logit[:n]))
        keep = op > -2.0  # prune transparent
        return pts[keep], np.repeat(cols[keep], 3, axis=1)[:, :3] * 255.0

    def save(self, path: str):
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            means=np.asarray(self.g.means[: self.num_used]),
            log_scales=np.asarray(self.g.log_scales[: self.num_used]),
            quats=np.asarray(self.g.quats[: self.num_used]),
            opacity_logit=np.asarray(self.g.opacity_logit[: self.num_used]),
            colors=np.asarray(self.g.colors[: self.num_used]),
            render_hw=np.asarray(self.render_hw if self.render_hw else (0, 0)),
        )

    def load(self, path: str):
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        self.reset()
        hw = tuple(int(x) for x in z["render_hw"])
        self.render_hw = hw if hw != (0, 0) else None
        self._insert({k: z[k] for k in
                      ("means", "log_scales", "quats", "opacity_logit", "colors")})
