import time, numpy as np, jax, jax.numpy as jnp
from pyslam_tpu.ops import hamming, matching, slam_matching

rng = np.random.default_rng(0)
B, N = 10, 2000
kps1 = jnp.asarray(rng.uniform(0, 300, (N, 2)).astype(np.float32))
lv1 = jnp.asarray(rng.integers(0, 8, (N,)).astype(np.int32))
d1 = jnp.asarray(rng.integers(0, 2, (N, 256)).astype(np.int8))
free1 = jnp.asarray(np.ones((N,), bool))
kps2 = jnp.asarray(rng.uniform(0, 300, (B, N, 2)).astype(np.float32))
lv2 = jnp.asarray(rng.integers(0, 8, (B, N)).astype(np.int32))
d2 = jnp.asarray(rng.integers(0, 2, (B, N, 256)).astype(np.int8))
free2 = jnp.asarray(np.ones((B, N), bool))
F = jnp.asarray(rng.normal(size=(B, 3, 3)).astype(np.float32))
ep = jnp.asarray(rng.uniform(0, 300, (B, 2)).astype(np.float32))
s2l = jnp.asarray((1.2 ** (2 * np.arange(8))).astype(np.float32))

def t(f, *a, reps=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) * 1e3 / reps

full = lambda: slam_matching.epipolar_triangulation_match_batch(
    kps1, lv1, d1, free1, kps2, lv2, d2, free2, F, ep, s2l, 50.0)[0]
print("full batch:", round(t(full), 2), "ms")

# gates only
@jax.jit
def gates_only(kps1, lv1, free1, kps2, lv2, free2, F, ep, s2l):
    def one(kps2, lv2, free2, F12, epipole2):
        ones = jnp.ones_like(kps1[:, :1])
        p1 = jnp.concatenate([kps1, ones], axis=1)
        lines2 = p1 @ F12.T
        a, b, c = lines2[:, 0:1], lines2[:, 1:2], lines2[:, 2:3]
        num = a * kps2[None, :, 0] + b * kps2[None, :, 1] + c
        den = a * a + b * b
        dsq = num * num / jnp.maximum(den, 1e-12)
        gate = 3.84 * s2l[lv2][None, :]
        epi_ok = dsq < gate
        de = jnp.sum((kps2 - epipole2[None, :]) ** 2, axis=1)
        far = de > 100.0 * s2l[lv2]
        return epi_ok & free1[:, None] & (free2 & far)[None, :]
    return jax.vmap(one)(kps2, lv2, free2, F, ep).sum()
print("gates only:", round(t(gates_only, kps1, lv1, free1, kps2, lv2, free2, F, ep, s2l), 2), "ms")

# dmat + masked ratio test with random mask
mask = jnp.asarray(rng.random((B, N, N)) < 0.02)
@jax.jit
def match_only(d1, d2, mask):
    def one(d2k, mk, f2k):
        dm = hamming.descriptor_distance_matrix(d1, d2k)
        return matching.match_ratio_test(dm, 50.0, ratio=0.8, valid_a=free1,
                                         valid_b=f2k, cross_check=True,
                                         extra_mask=mk)[0]
    return jax.vmap(one)(d2, mask, free2)
print("dmat+ratio:", round(t(match_only, d1, d2, mask), 2), "ms")
