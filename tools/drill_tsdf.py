"""Drill: stage-by-stage timing of the TSDF integrate path on TPU.

Isolates (a) depth_to_voxel_updates, (b) the claim loop, (c) the dense
blend, to find where the 253 ms amortized per-KF cost of PROFILE_r03 lives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import voxel_hash
from pyslam_tpu.dense.tsdf import TSDFVolume, depth_to_voxel_updates


def bench(fn, n=10, warmup=2):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


H, W = 376, 1241
rng = np.random.default_rng(0)
depth = rng.uniform(2, 35, (H, W)).astype(np.float32)
inten = rng.uniform(0, 255, (H, W)).astype(np.float32)
Twc = np.eye(4, dtype=np.float32)
K = np.array([[718.0, 0, W / 2], [0, 718.0, 1, ], [0, 0, 1]], np.float32)
K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)

vol = TSDFVolume(voxel_size=0.2, sdf_trunc=0.6, depth_trunc=40.0,
                 capacity=4 * 1024 * 1024, stride=3)

dj = jnp.asarray(depth)
ij = jnp.asarray(inten)
Tj = jnp.asarray(Twc)
Kj = jnp.asarray(K)

upd = depth_to_voxel_updates(dj, ij, Tj, Kj, vol.voxel_size, vol.sdf_trunc,
                             vol.depth_trunc, vol.stride, vol.band_steps)
upd = jax.block_until_ready(upd)
coords, sdf, w, col, valid = upd
print("update batch:", coords.shape, "band_steps:", vol.band_steps,
      "valid:", int(np.asarray(valid).sum()))

t = bench(lambda: depth_to_voxel_updates(
    dj, ij, Tj, Kj, vol.voxel_size, vol.sdf_trunc, vol.depth_trunc,
    vol.stride, vol.band_steps))
print(f"depth_to_voxel_updates: {t:.2f} ms")

table = vol.table
t = bench(lambda: voxel_hash.insert_and_accumulate(
    table, coords, sdf, w, col, valid))
print(f"insert_and_accumulate (empty table): {t:.2f} ms")

# populated table
table2 = voxel_hash.insert_and_accumulate(table, coords, sdf, w, col, valid)
table2 = jax.block_until_ready(table2)
t = bench(lambda: voxel_hash.insert_and_accumulate(
    table2, coords, sdf, w, col, valid))
print(f"insert_and_accumulate (warm table): {t:.2f} ms")

# e2e integrate like the volumetric integrator does
def e2e():
    c, s, ww, cc, v = depth_to_voxel_updates(
        dj, ij, Tj, Kj, vol.voxel_size, vol.sdf_trunc, vol.depth_trunc,
        vol.stride, vol.band_steps)
    return voxel_hash.insert_and_accumulate(table2, c, s, ww, cc, v)

t = bench(e2e)
print(f"e2e updates+insert: {t:.2f} ms")

# components of insert: claim loop only vs blend only
C = table2.capacity


@jax.jit
def claim_only(table, coords, valid):
    n = coords.shape[0]
    h0 = voxel_hash._hash(coords, C)
    ids = jnp.arange(n, dtype=jnp.int32)
    fpt = voxel_hash._table_fingerprints(table)
    fps = voxel_hash._fingerprint(coords)

    def claim_round(r, state):
        slot_of, probe, won_any, fpt = state
        pending = (slot_of < 0) & valid
        slot = (h0 + probe) & (C - 1)
        fslot = fpt[slot]
        occ = fslot != 0
        key_eq = fslot == fps
        take = pending & key_eq
        slot_of = jnp.where(take, slot, slot_of)
        pending = pending & ~take
        want = pending & ~occ
        tickets = jnp.full((C,), n, jnp.int32).at[
            jnp.where(want, slot, C)
        ].min(ids, mode="drop")
        winner_id = tickets[slot]
        won = want & (winner_id == ids)
        fpt = fpt.at[jnp.where(won, slot, C)].set(fps, mode="drop")
        slot_of = jnp.where(won, slot, slot_of)
        won_any = won_any | won
        pending = pending & ~won
        same_as_winner = (
            pending & want & (winner_id < n)
            & (fps[jnp.clip(winner_id, 0, n - 1)] == fps)
        )
        slot_of = jnp.where(same_as_winner, slot, slot_of)
        pending = pending & ~same_as_winner
        probe = jnp.where(pending, probe + 1, probe)
        return slot_of, probe, won_any, fpt

    slot_of, _, won_any, fpt = jax.lax.fori_loop(
        0, voxel_hash.INSERT_ROUNDS, claim_round,
        (jnp.full((n,), -1, jnp.int32), jnp.zeros((n,), jnp.int32),
         jnp.zeros((n,), bool), fpt))
    return slot_of, won_any


t = bench(lambda: claim_only(table2, coords, valid))
print(f"claim loop only: {t:.2f} ms")

slot_of, won_any = jax.block_until_ready(claim_only(table2, coords, valid))


@jax.jit
def blend_only(table, slot_of, won_any, coords, sdf, w, col, valid):
    n = coords.shape[0]
    claim_tgt = jnp.where(won_any, slot_of, C)
    keys_new = table.keys.at[claim_tgt].set(coords, mode="drop")
    occ_new = table.occupied.at[claim_tgt].set(True, mode="drop")
    ok = (slot_of >= 0) & valid
    tgt = jnp.where(ok, slot_of, C)
    gray = col
    upd = jnp.stack([w, sdf * w, gray * w], axis=1).astype(jnp.float32)
    acc = jnp.zeros((C, 3), jnp.float32).at[tgt].add(upd, mode="drop")
    wsum, twsum, gsum = acc[:, 0], acc[:, 1], acc[:, 2]
    touched = wsum > 0
    w_old = table.weight
    denom = jnp.maximum(w_old + wsum, 1e-9)
    tsdf = jnp.where(touched, (table.tsdf * w_old + twsum) / denom, table.tsdf)
    weight = jnp.where(touched, jnp.minimum(w_old + wsum, 200.0), w_old)
    color_new = jnp.where(
        touched[:, None],
        (table.color * w_old[:, None] + gsum[:, None]) / denom[:, None],
        table.color,
    )
    return voxel_hash.VoxelHashTable(keys_new, occ_new, tsdf, weight, color_new)


t = bench(lambda: blend_only(table2, slot_of, won_any, coords, sdf, w,
                             np.asarray(col), valid))
print(f"blend only: {t:.2f} ms")
