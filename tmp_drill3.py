"""TPU timing: voxel-hash insert (fingerprint redesign) + store-indexed fuse."""
import time, numpy as np, jax, jax.numpy as jnp

def t(f, *a, reps=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) * 1e3 / reps

# --- TSDF integrate, KITTI frame, same shape as microprofile
from pyslam_tpu.dense.tsdf import TSDFVolume
rng = np.random.default_rng(0)
H, W = 376, 1241
K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
vol = TSDFVolume(voxel_size=0.2, sdf_trunc=0.6, depth_trunc=40.0)
depth = np.clip(rng.uniform(4, 60, (H, W)), 0, None).astype(np.float32)
inten = rng.uniform(0, 255, (H, W)).astype(np.float32)
Twc = np.eye(4)

def run_tsdf():
    vol.integrate(depth, inten, Twc, K)
    return vol.table.tsdf
print("tsdf integrate:", round(t(run_tsdf, reps=6), 2), "ms  (was 253)")
print("  voxels:", vol.num_voxels())

# --- store-indexed fuse: B=10 targets, shared 2048 candidates
from pyslam_tpu.ops import slam_matching
S, M, N, B = 16384, 2048, 2000, 10
store = (
    jnp.asarray(rng.uniform(-5, 5, (S, 3)).astype(np.float32)),
    jnp.asarray(rng.integers(0, 2, (S, 256)).astype(np.int8)),
    jnp.asarray(np.tile([0, 0, 1.0], (S, 1)).astype(np.float32)),
    jnp.asarray(np.full((S,), 0.1, np.float32)),
    jnp.asarray(np.full((S,), 50.0, np.float32)),
    jnp.asarray(np.ones((S,), bool)),
)
cand_idx = jnp.asarray((np.arange(M) % S).astype(np.int32))
cand_valid = jnp.asarray(np.ones((B, M), bool))
kps = jnp.asarray(rng.uniform(0, 300, (B, N, 2)).astype(np.float32))
lvl = jnp.asarray(rng.integers(0, 8, (B, N)).astype(np.int32))
des = jnp.asarray(rng.integers(0, 2, (B, N, 256)).astype(np.int8))
val = jnp.asarray(np.ones((B, N), bool))
ur = jnp.asarray(np.full((B, N), -1.0, np.float32))
Tcw = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
sh = (
    jnp.asarray(K), jnp.asarray(np.float32(388.0)),
    jnp.asarray(np.array([0, W, 0, H], np.float32)),
    jnp.asarray((1.2 ** np.arange(8)).astype(np.float32)),
    jnp.asarray((1.2 ** (2 * np.arange(8))).astype(np.float32)),
    jnp.float32(25.0),
)
def run_fuse():
    return slam_matching.fuse_candidates_store_batch(
        *store, cand_idx, cand_valid, kps, lvl, des, val, ur, Tcw, *sh)[0]
print("fuse store-batch B=10 (device-resident):", round(t(run_fuse), 2), "ms  (was ~48 single + uploads)")
