"""Semantic TSDF volume: per-voxel class fusion on top of the hash table.

Reference: pySLAM ``pyslam/dense/volumetric_integrator_voxel_semantic_grid.py``
(semantic voxel grids with counting vs Bayesian-probabilistic fusion,
documented in ``cpp/volumetric/README.md:40-80``).  Labels ride along the
same voxel updates as TSDF; fusion modes:
- COUNTING: per-voxel class-vote histogram, label = argmax
- BAYESIAN: per-voxel accumulated log-probabilities
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.dense.tsdf import TSDFVolume, depth_to_voxel_updates
from pyslam_tpu.ops import voxel_hash


class SemanticFusionMethod(enum.Enum):
    COUNTING = "counting"
    BAYESIAN = "bayesian"
    AVERAGING = "averaging"


class SemanticTSDFVolume(TSDFVolume):
    def __init__(self, num_classes: int = 21,
                 fusion: SemanticFusionMethod = SemanticFusionMethod.COUNTING,
                 **kw):
        super().__init__(**kw)
        self.num_classes = num_classes
        self.fusion = fusion
        self.class_scores = jnp.zeros((self.capacity, num_classes), jnp.float32)

    def reset(self):
        super().reset()
        self.class_scores = jnp.zeros(
            (self.capacity, self.num_classes), jnp.float32
        )

    def integrate_semantic(self, depth, intensity, labels, Twc, K,
                           label_probs=None):
        """Integrate depth + per-pixel class labels (H,W) int; optionally
        (H,W,num_classes) probabilities for Bayesian fusion."""
        if self.stride is None:
            fx = float(np.asarray(K)[0, 0])
            self.stride = int(
                np.clip(self.voxel_size * fx / max(self.depth_trunc, 1e-6),
                        1, 4)
            )
        coords, sdf, w, col, valid = depth_to_voxel_updates(
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(intensity, jnp.float32),
            jnp.asarray(Twc, jnp.float32),
            jnp.asarray(K, jnp.float32),
            self.voxel_size, self.sdf_trunc, self.depth_trunc,
            self.stride, self.band_steps,
        )
        self.table = voxel_hash.insert_and_accumulate(
            self.table, coords, sdf, w, col, valid
        )
        # second pass: scatter class votes into the (now existing) slots
        H, W = np.asarray(depth).shape
        lab = jnp.asarray(labels, jnp.int32)
        ys = jnp.arange(0, H, self.stride)
        xs = jnp.arange(0, W, self.stride)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        px_lab = lab[gy.reshape(-1), gx.reshape(-1)]            # (P,)
        B = 2 * self.band_steps + 1
        upd_lab = jnp.repeat(px_lab, B)                          # align w/ updates
        slots = voxel_hash.lookup(self.table, coords)
        ok = (slots >= 0) & valid & (upd_lab >= 0) & (upd_lab < self.num_classes)
        C = self.capacity
        idx_slot = jnp.where(ok, slots, C)
        if label_probs is not None and self.fusion == SemanticFusionMethod.BAYESIAN:
            probs = jnp.asarray(label_probs, jnp.float32)
            px_probs = probs[gy.reshape(-1), gx.reshape(-1)]      # (P,K)
            upd = jnp.repeat(px_probs, B, axis=0)
            logp = jnp.log(jnp.clip(upd, 1e-6, 1.0))
            self.class_scores = self.class_scores.at[idx_slot].add(
                logp, mode="drop"
            )
        else:
            onehot = jax.nn.one_hot(
                jnp.clip(upd_lab, 0, self.num_classes - 1), self.num_classes
            ) * w[:, None]
            self.class_scores = self.class_scores.at[idx_slot].add(
                onehot, mode="drop"
            )

    def extract_semantic_point_cloud(self, tsdf_band=0.5, min_weight=1.0):
        occ = np.asarray(self.table.occupied)
        tsdf = np.asarray(self.table.tsdf)
        wt = np.asarray(self.table.weight)
        sel = occ & (np.abs(tsdf) < tsdf_band) & (wt >= min_weight)
        keys = np.asarray(self.table.keys)[sel]
        pts = (keys.astype(np.float64) + 0.5) * self.voxel_size
        labels = np.asarray(jnp.argmax(self.class_scores, axis=1))[sel]
        return pts, labels
