"""Flat open-addressing voxel hash table in device arrays.

TPU-native replacement for the reference's C++ ``volumetric`` module
(pySLAM ``cpp/volumetric/``: sparse voxel hashing with TBB+SIMD integration,
``voxel_hashing.h``, ``voxel_grid.h``).  Everything lives in fixed-capacity
device arrays:

  keys (C,3) int32 voxel coords | occupied (C,) | tsdf (C,) | weight (C,) |
  color (C,3)

Insertion uses the classic parallel-hash-build pattern expressed in pure JAX:
updates are deduplicated with a lexicographic sort + segment reduction, then
race-free slot claiming runs as fixed "ticket" rounds — every pending key
scatters its index into the candidate slot with ``.at[].min`` (deterministic
winner), re-gathers to check ownership, and losers linear-probe onward.  No
atomics or host sync; int64 keys are avoided (TPU-friendly int32 coords with
3-column equality).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_PROBES = 16
INSERT_ROUNDS = 16


class VoxelHashTable(NamedTuple):
    keys: jnp.ndarray      # (C,3) int32
    occupied: jnp.ndarray  # (C,) bool
    tsdf: jnp.ndarray      # (C,) float32
    weight: jnp.ndarray    # (C,) float32
    color: jnp.ndarray     # (C,3) float32

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def make_table(capacity: int) -> VoxelHashTable:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelHashTable(
        keys=jnp.zeros((capacity, 3), jnp.int32),
        occupied=jnp.zeros((capacity,), bool),
        tsdf=jnp.zeros((capacity,), jnp.float32),
        weight=jnp.zeros((capacity,), jnp.float32),
        color=jnp.zeros((capacity, 3), jnp.float32),
    )


def _hash(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Teschner spatial hash -> slot index."""
    x = coords[..., 0].astype(jnp.uint32)
    y = coords[..., 1].astype(jnp.uint32)
    z = coords[..., 2].astype(jnp.uint32)
    h = (x * jnp.uint32(73856093)) ^ (y * jnp.uint32(19349669)) ^ (
        z * jnp.uint32(83492791)
    )
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def lookup(table: VoxelHashTable, coords: jnp.ndarray) -> jnp.ndarray:
    """(N,3) coords -> (N,) slot index or -1 (linear probing, fixed budget)."""
    C = table.capacity
    h0 = _hash(coords, C)

    def body(i, state):
        slot_found = state
        slot = (h0 + i) & (C - 1)
        key_eq = jnp.all(table.keys[slot] == coords, axis=-1) & table.occupied[slot]
        return jnp.where((slot_found < 0) & key_eq, slot, slot_found)

    return jax.lax.fori_loop(0, MAX_PROBES, body, jnp.full(h0.shape, -1, jnp.int32))


def _dedup(coords: jnp.ndarray, values: dict, valid: jnp.ndarray):
    """Sort + segment-reduce duplicate voxel updates within a batch.

    Returns (unique_coords, reduced values, unique_valid) with the same static
    length (duplicates flagged invalid).  values entries are weighted sums:
    caller passes {"wsum": w, "twsum": t*w, "csum": c*w}.
    """
    n = coords.shape[0]
    # lexicographic order over (valid desc, x, y, z)
    order = jnp.lexsort(
        (coords[:, 2], coords[:, 1], coords[:, 0], ~valid)
    )
    c_s = coords[order]
    v_s = {k: v[order] for k, v in values.items()}
    valid_s = valid[order]

    is_new = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            jnp.any(c_s[1:] != c_s[:-1], axis=-1),
        ]
    ) & valid_s
    seg = jnp.cumsum(is_new) - 1          # segment id per row
    seg = jnp.where(valid_s, seg, n - 1)  # dump invalid into the last bucket

    out_vals = {}
    for k, v in v_s.items():
        extra = v.shape[1:] if v.ndim > 1 else ()
        acc = jnp.zeros((n,) + extra, v.dtype).at[seg].add(
            jnp.where(valid_s.reshape((-1,) + (1,) * len(extra)), v, 0)
        )
        out_vals[k] = acc
    # init at -inf-ish so scatter-max preserves NEGATIVE voxel coordinates
    firsts = jnp.full((n, 3), -(2 ** 30), coords.dtype).at[seg].max(
        jnp.where(valid_s[:, None], c_s, -(2 ** 30))
    )
    n_unique = jnp.sum(is_new)
    uniq_valid = jnp.arange(n) < n_unique
    return firsts, out_vals, uniq_valid


@jax.jit
def insert_and_accumulate(
    table: VoxelHashTable,
    coords: jnp.ndarray,    # (N,3) int32 voxel coords
    sdf: jnp.ndarray,       # (N,) tsdf values of the updates
    w: jnp.ndarray,         # (N,) update weights
    color: jnp.ndarray,     # (N,3)
    valid: jnp.ndarray,     # (N,)
    max_weight: float = 200.0,
) -> VoxelHashTable:
    """Fuse a batch of voxel updates (running weighted average, like the
    reference's ``integrate``), inserting unseen voxels."""
    C = table.capacity
    n = coords.shape[0]

    coords_u, vals, valid_u = _dedup(
        coords,
        {"wsum": w, "twsum": sdf * w, "csum": color * w[:, None]},
        valid,
    )

    # ---- resolve slots: probe for existing or claim empty ----------------
    h0 = _hash(coords_u, C)
    ids = jnp.arange(n, dtype=jnp.int32)

    def claim_round(r, state):
        slot_of, probe, keys, occupied = state
        pending = (slot_of < 0) & valid_u
        slot = (h0 + probe) & (C - 1)
        # case 1: slot already holds our key
        key_eq = jnp.all(keys[slot] == coords_u, axis=-1) & occupied[slot]
        take = pending & key_eq
        slot_of = jnp.where(take, slot, slot_of)
        pending = pending & ~take
        # case 2: slot empty -> race via ticket min
        empty = ~occupied[slot]
        want = pending & empty
        tickets = jnp.full((C,), n, jnp.int32).at[
            jnp.where(want, slot, C)
        ].min(ids, mode="drop")
        won = want & (tickets[slot] == ids)
        # winners claim: write key + occupied (losers scatter out-of-bounds
        # and are dropped — never write a live slot with a stale value)
        keys = keys.at[jnp.where(won, slot, C)].set(coords_u, mode="drop")
        occupied = occupied.at[jnp.where(won, slot, C)].set(True, mode="drop")
        slot_of = jnp.where(won, slot, slot_of)
        pending = pending & ~won
        # losers / collisions advance their probe offset
        probe = jnp.where(pending, probe + 1, probe)
        return slot_of, probe, keys, occupied

    slot_of0 = jnp.full((n,), -1, jnp.int32)
    probe0 = jnp.zeros((n,), jnp.int32)
    slot_of, _, keys, occupied = jax.lax.fori_loop(
        0, INSERT_ROUNDS, claim_round, (slot_of0, probe0, table.keys, table.occupied)
    )

    ok = (slot_of >= 0) & valid_u
    slot_safe = jnp.where(ok, slot_of, 0)

    wsum = vals["wsum"]
    twsum = vals["twsum"]
    csum = vals["csum"]
    w_old = table.weight[slot_safe]
    t_old = table.tsdf[slot_safe]
    c_old = table.color[slot_safe]
    w_new = jnp.minimum(w_old + wsum, max_weight)
    denom = jnp.maximum(w_old + wsum, 1e-9)
    t_new = (t_old * w_old + twsum) / denom
    c_new = (c_old * w_old[:, None] + csum) / denom[:, None]

    oob = jnp.where(ok, slot_safe, C)  # out-of-bounds => dropped
    tsdf = table.tsdf.at[oob].set(t_new, mode="drop")
    weight = table.weight.at[oob].set(w_new, mode="drop")
    color = table.color.at[oob].set(c_new, mode="drop")
    return VoxelHashTable(keys=keys, occupied=occupied, tsdf=tsdf, weight=weight,
                          color=color)


def gather_values(table: VoxelHashTable, coords: jnp.ndarray):
    """(tsdf, weight) at coords (0 weight if absent)."""
    slots = lookup(table, coords)
    ok = slots >= 0
    s = jnp.where(ok, slots, 0)
    return (
        jnp.where(ok, table.tsdf[s], 0.0),
        jnp.where(ok, table.weight[s], 0.0),
    )
