"""Minimal SGM verification: readback-forced timing, two distinct inputs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.depth_estimation.sgm import sgm_disparity

H, W = 188, 620   # KITTI at downscale 2
rng = np.random.default_rng(0)
a = rng.integers(0, 255, (H, W)).astype(np.float32)
b = np.roll(a, 7, axis=1)
c = rng.integers(0, 255, (H, W)).astype(np.float32)
d = np.roll(c, 9, axis=1)
aj, bj, cj, dj = map(jnp.asarray, (a, b, c, d))
jax.block_until_ready((aj, bj, cj, dj))

t0 = time.perf_counter()
o = np.asarray(sgm_disparity(aj, bj, max_disp=32))
print(f"compile+run+readback: {time.perf_counter()-t0:.1f}s mean={o[o>0].mean():.2f}")

for i, (x, y) in enumerate(((aj, bj), (cj, dj), (aj, bj))):
    t0 = time.perf_counter()
    o = np.asarray(sgm_disparity(x, y, max_disp=32))
    print(f"run {i}: {(time.perf_counter()-t0)*1e3:.1f} ms mean={o[o>0].mean():.2f}")
