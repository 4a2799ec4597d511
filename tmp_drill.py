import time, numpy as np, jax, jax.numpy as jnp
from pyslam_tpu.ops import hamming, matching

rng = np.random.default_rng(0)
B, N = 10, 2000
d1 = jnp.asarray(rng.integers(0,2,(N,256)).astype(np.int8))
d2 = jnp.asarray(rng.integers(0,2,(B,N,256)).astype(np.int8))
free1 = jnp.asarray(np.ones((N,),bool)); free2 = jnp.asarray(np.ones((B,N),bool))
mask = jnp.asarray(rng.random((B,N,N)) < 0.02)

def t(f, *a, reps=5):
    o = f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o=f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)*1e3/reps

# (a) vmapped hamming only
ham = jax.jit(jax.vmap(hamming.descriptor_distance_matrix, in_axes=(None,0)))
print("hamming (10,2000,2000):", round(t(ham, d1, d2),2), "ms")

# (b) ratio test on precomputed dmat (with cross_check)
dm = ham(d1, d2)
mrt = jax.jit(jax.vmap(lambda dd, m: matching.match_ratio_test(dd, 50.0, ratio=0.8, valid_a=free1, valid_b=free2[0], cross_check=True, extra_mask=m)[0], in_axes=(0,0)))
print("ratio_test+crosscheck:", round(t(mrt, dm, mask),2), "ms")

# (c) ratio test without cross_check
mrt2 = jax.jit(jax.vmap(lambda dd, m: matching.match_ratio_test(dd, 50.0, ratio=0.8, valid_a=free1, valid_b=free2[0], cross_check=False, extra_mask=m)[0], in_axes=(0,0)))
print("ratio_test no-cc:", round(t(mrt2, dm, mask),2), "ms")

# (d) top2 alone
top2 = jax.jit(jax.vmap(matching.top2_along_rows))
print("top2_along_rows:", round(t(top2, dm.astype(jnp.float32)),2), "ms")

# (e) argmin-based top2 alternative: mask-free two-pass min
def top2_alt(d):
    d1v = jnp.min(d, axis=1)
    i1 = jnp.argmin(d, axis=1)
    d2v = jnp.min(jnp.where(jax.nn.one_hot(i1, d.shape[1], dtype=bool), jnp.inf, d), axis=1)
    return d1v, i1, d2v
t2a = jax.jit(jax.vmap(top2_alt))
print("top2 one_hot alt:", round(t(t2a, dm.astype(jnp.float32)),2), "ms")
