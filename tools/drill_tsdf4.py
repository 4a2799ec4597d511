"""Drill 4: verify amortized insert timing (fresh jit vs decorated, scaling n)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import voxel_hash
from pyslam_tpu.dense.tsdf import TSDFVolume, depth_to_voxel_updates

H, W = 376, 1241
rng = np.random.default_rng(0)
depth = rng.uniform(2, 35, (H, W)).astype(np.float32)
inten = rng.uniform(0, 255, (H, W)).astype(np.float32)
Twc = np.eye(4, dtype=np.float32)
K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
vol = TSDFVolume(voxel_size=0.2, sdf_trunc=0.6, depth_trunc=40.0,
                 capacity=4 * 1024 * 1024, stride=3)
dj, ij, Tj, Kj = map(jnp.asarray, (depth, inten, Twc, K))
upd = depth_to_voxel_updates(dj, ij, Tj, Kj, vol.voxel_size, vol.sdf_trunc,
                             vol.depth_trunc, vol.stride, vol.band_steps)
coords, sdf, w, col, valid = jax.block_until_ready(upd)

fn = voxel_hash.insert_and_accumulate

for n in (5, 20, 50):
    tb = vol.table
    tb = jax.block_until_ready(fn(tb, coords, sdf, w, col, valid))
    t0 = time.perf_counter()
    for _ in range(n):
        tb = fn(tb, coords, sdf, w, col, valid)
    jax.block_until_ready(tb)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"decorated insert chained n={n}: {dt:.2f} ms/call")

fresh = jax.jit(fn.__wrapped__)
for n in (5, 20):
    tb = vol.table
    tb = jax.block_until_ready(fresh(tb, coords, sdf, w, col, valid))
    t0 = time.perf_counter()
    for _ in range(n):
        tb = fresh(tb, coords, sdf, w, col, valid)
    jax.block_until_ready(tb)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"fresh-jit insert chained n={n}: {dt:.2f} ms/call")

# does the result actually change? (sanity: weight sum grows per insert)
tb = vol.table
for i in range(3):
    tb = fn(tb, coords, sdf, w, col, valid)
    print("weight sum:", float(jnp.sum(tb.weight)))
