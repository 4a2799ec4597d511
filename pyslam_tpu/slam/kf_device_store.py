"""Device-resident stacked KeyFrame store for the back-end batch matchers.

Problem (VERDICT r4 ask #4): the triangulation / fuse dispatches fed their
~10 covisible neighbor keyframes through per-call ``jnp.stack`` of per-frame
device handles (``Frame.dev``).  Two costs made this the dominant host stage
(~70-270 ms per keyframe on the remote-attached TPU):

- keyframes whose per-frame cache was trimmed (``_trim_device_caches``)
  re-uploaded their ~0.5 MB descriptor block through the tunnel, and
- the stacks themselves are per-call device dispatches with per-argument
  marshalling cost on the axon backend.

Fix: ONE set of stacked device arrays ``(B, N, ...)`` holding the extraction
payload of the ~B most recently used keyframes, written ONCE per keyframe by
a single donated row-scatter (device-to-device — the frame's arrays are
already on device after extraction).  The batch matchers gather rows
IN-GRAPH from this store (`ops.slam_matching.*_kfstore`), so a back-end
dispatch sends only row indices + small masks across the tunnel.

The stored arrays (kps/levels/des/valid/kps_ur) are immutable post-
extraction, so rows never need refreshing; mutable state (points, outliers,
poses) stays host-side and rides in the per-dispatch masks.

Reference contrast: pySLAM's matchers walk per-keyframe object arrays in
C++ with zero transfer cost (``geometry_matchers.cpp``); on a TPU the
equivalent locality is device residency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _set_row(s_kps, s_lvl, s_des, s_val, s_ur, row, kps, lvl, des, val, ur):
    return (
        s_kps.at[row].set(kps),
        s_lvl.at[row].set(lvl),
        s_des.at[row].set(des),
        s_val.at[row].set(val),
        s_ur.at[row].set(ur),
    )


class KFDeviceStore:
    """LRU ring of per-keyframe extraction payloads, resident on device."""

    def __init__(self, num_rows: int, num_kps: int, desc_dim: int,
                 desc_dtype=jnp.int8):
        self.B = int(num_rows)
        self.N = int(num_kps)
        self.D = int(desc_dim)
        self.kps = jnp.zeros((self.B, self.N, 2), jnp.float32)
        self.levels = jnp.zeros((self.B, self.N), jnp.int32)
        self.des = jnp.zeros((self.B, self.N, self.D), desc_dtype)
        self.valid = jnp.zeros((self.B, self.N), bool)
        self.kps_ur = jnp.full((self.B, self.N), -1.0, jnp.float32)
        self._row_of: dict[int, int] = {}   # kid -> row (insertion = LRU)
        self.uploads = 0                    # rows written (observability)

    def arrays(self):
        return (self.kps, self.levels, self.des, self.valid, self.kps_ur)

    def invalidate(self, kid: int):
        self._row_of.pop(kid, None)

    def _write(self, kf, row: int):
        (self.kps, self.levels, self.des, self.valid, self.kps_ur) = _set_row(
            self.kps, self.levels, self.des, self.valid, self.kps_ur,
            jnp.asarray(row, jnp.int32),
            kf.dev("kps"), kf.dev("levels"), kf.dev("des"),
            kf.dev("valid"), kf.dev("kps_ur"),
        )
        self.uploads += 1

    def rows_for(self, kfs) -> np.ndarray:
        """Ensure every keyframe is resident; returns their row indices.

        LRU eviction: a miss takes the least-recently-used row not needed by
        THIS call.  len(kfs) must be <= B."""
        need = []
        for kf in kfs:
            if kf.kid in self._row_of:
                # refresh LRU position
                self._row_of[kf.kid] = self._row_of.pop(kf.kid)
            else:
                need.append(kf)
        if need:
            wanted = {kf.kid for kf in kfs}
            used = set(self._row_of.values())
            free = [r for r in range(self.B) if r not in used]
            for kf in need:
                if free:
                    row = free.pop()
                else:
                    victim = next(
                        k for k in self._row_of if k not in wanted
                    )
                    row = self._row_of.pop(victim)
                self._write(kf, row)
                self._row_of[kf.kid] = row
        return np.asarray([self._row_of[kf.kid] for kf in kfs], np.int32)
