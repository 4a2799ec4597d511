"""Attribution drill for the three big back-end graphs (run on TPU).

Times sub-stages of SGM, TSDF insert, and the triangulation batch so
optimization targets the measured component, not the guessed one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 376, 1241
rng = np.random.default_rng(0)


def t(fn, *args, reps=6, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def sec(name, ms):
    print(f"{name}: {ms:.2f} ms", flush=True)


# ---------------------------------------------------------------- SGM stages
from pyslam_tpu.depth_estimation import sgm

img_l = rng.integers(0, 255, (H, W)).astype(np.float32)
img_r = np.roll(img_l, 7, axis=1)
for scale in (1, 2):
    hs, ws = H // scale, W // scale
    il = jnp.asarray(img_l[:hs, :ws])
    ir = jnp.asarray(img_r[:hs, :ws])
    D = 64 // scale

    cen = jax.jit(lambda a, b: (sgm.census_transform(a), sgm.census_transform(b)))
    cl, cr = cen(il, ir)
    sec(f"sgm[s{scale}] census", t(cen, il, ir))

    cv = jax.jit(lambda a, b: sgm.cost_volume(a, b, D))
    vol = cv(cl, cr)
    sec(f"sgm[s{scale}] cost_volume", t(cv, cl, cr))

    ag = jax.jit(lambda v: sgm._aggregate_4dir(v, 8.0, 64.0, 32, 16))
    agg = ag(vol)
    sec(f"sgm[s{scale}] aggregate", t(ag, vol))

    full = jax.jit(lambda a, b: sgm.sgm_disparity(a, b, max_disp=D))
    sec(f"sgm[s{scale}] FULL", t(full, il, ir))

# --------------------------------------------------------------- TSDF stages
from pyslam_tpu.dense.tsdf import TSDFVolume, depth_to_voxel_updates
from pyslam_tpu.ops import voxel_hash

depth = rng.uniform(4, 40, (H, W)).astype(np.float32)
inten = rng.uniform(0, 255, (H, W)).astype(np.float32)
Twc = np.eye(4, dtype=np.float32)
K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
vol = TSDFVolume(voxel_size=0.2, sdf_trunc=0.6, depth_trunc=40.0, stride=3)
dj, ij, Tj, Kj = map(jnp.asarray, (depth, inten, Twc, K))

upd_fn = lambda: depth_to_voxel_updates(
    dj, ij, Tj, Kj, vol.voxel_size, vol.sdf_trunc, vol.depth_trunc,
    vol.stride, vol.band_steps)
sec("tsdf updates-graph", t(upd_fn))
coords, sdf, w, col, valid = jax.block_until_ready(upd_fn())
print(f"  n_updates={coords.shape[0]}")

tb = vol.table
ins = lambda: voxel_hash.insert_and_accumulate(tb, coords, sdf, w, col, valid)
tb = jax.block_until_ready(ins())
sec("tsdf insert(table warm)", t(ins))

# lookup-only path for comparison
lk = jax.jit(voxel_hash.lookup)
sec("tsdf lookup-only", t(lk, tb, coords))

# --------------------------------------------------- triangulation sub-costs
from pyslam_tpu.ops import slam_matching, hamming, matching

N, B = 2048, 10
kps1 = rng.uniform(0, 300, (N, 2)).astype(np.float32)
lv1 = rng.integers(0, 8, (N,)).astype(np.int32)
d1 = rng.integers(0, 2, (N, 256)).astype(np.int8)
free1 = np.ones((N,), bool)
kps2 = rng.uniform(0, 300, (B, N, 2)).astype(np.float32)
lv2 = rng.integers(0, 8, (B, N)).astype(np.int32)
d2 = rng.integers(0, 2, (B, N, 256)).astype(np.int8)
free2 = np.ones((B, N), bool)
F = rng.normal(size=(B, 3, 3)).astype(np.float32)
ep = rng.uniform(0, 300, (B, 2)).astype(np.float32)
s2l = (1.2 ** (2 * np.arange(8))).astype(np.float32)
args = [jnp.asarray(x) for x in
        (kps1, lv1, d1, free1, kps2, lv2, d2, free2, F, ep, s2l)]

# full batch
full_tri = lambda: slam_matching.epipolar_triangulation_match_batch(
    *args, 50.0)[0]
sec("tri FULL B=10", t(full_tri))

# hamming matmul alone, batched
hm = jax.jit(jax.vmap(hamming.hamming_distance_matrix, in_axes=(None, 0)))
sec("tri hamming-only", t(hm, args[2], args[6]))

# ratio-test alone on a random dmat
dmat = jnp.asarray(rng.uniform(0, 256, (B, N, N)).astype(np.float32))
rt = jax.jit(jax.vmap(lambda d: matching.match_ratio_test(d, 50.0)[0]))
sec("tri ratio-test-only", t(rt, dmat))

# epipolar-gates alone: reimplement the mask part
@jax.jit
@jax.vmap
def gates(kps2b, lv2b, Fb, epb):
    ones = jnp.ones_like(jnp.asarray(kps1)[:, :1])
    p1 = jnp.concatenate([jnp.asarray(kps1), ones], axis=1)
    lines2 = p1 @ Fb.T
    a, b, c = lines2[:, 0:1], lines2[:, 1:2], lines2[:, 2:3]
    num = a * kps2b[None, :, 0] + b * kps2b[None, :, 1] + c
    den = a * a + b * b
    dsq = num * num / jnp.maximum(den, 1e-12)
    gate = 3.84 * jnp.asarray(s2l)[lv2b][None, :]
    de = jnp.sum((kps2b - epb[None, :]) ** 2, axis=1)
    far = de > 100.0 * jnp.asarray(s2l)[lv2b]
    return dsq < gate, far


sec("tri epipolar-gates-only", t(gates, args[4], args[5], args[8], args[9]))

# ---------------------------------------------------------------- fuse parts
M = 8192
pts = rng.uniform(-5, 5, (M, 3)).astype(np.float32)
pdesc = rng.integers(0, 2, (M, 256)).astype(np.int8)
sec("fuse hamming 8192x2048",
    t(jax.jit(hamming.hamming_distance_matrix), jnp.asarray(pdesc),
      jnp.asarray(d1)))
