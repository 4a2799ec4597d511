"""Flat open-addressing voxel hash table in device arrays.

TPU-native replacement for the reference's C++ ``volumetric`` module
(pySLAM ``cpp/volumetric/``: sparse voxel hashing with TBB+SIMD integration,
``voxel_hashing.h``, ``voxel_grid.h``).  Everything lives in fixed-capacity
device arrays:

  keys (C,3) int32 voxel coords | occupied (C,) | tsdf (C,) | weight (C,) |
  color (C,3)

Insertion is the classic parallel-hash-build pattern expressed in pure JAX:
race-free slot claiming runs as fixed "ticket" rounds — every pending key
scatters its index into the candidate slot with ``.at[].min`` (deterministic
winner), re-gathers to check ownership, and losers linear-probe onward.
Duplicate keys within a batch resolve to the winner's slot in the SAME round
(losers re-check the slot after the winners' writes instead of probing past
it), so accumulation is a plain segment-sum: scatter-add the weighted updates
into per-slot accumulators, then one elementwise blend over the table.

Performance model (measured on TPU v5e through the tunnel): XLA gather /
scatter costs ~11 ns PER ELEMENT regardless of sortedness or uniqueness —
the whole design is therefore shaped around MINIMIZING RANDOM-ACCESS PASSES:
key+occupancy are packed into one (C,4) array so each probe round is ONE
gather; all per-slot accumulators (weight / tsdf*w / color*w) are packed so
accumulation is ONE scatter-add of wide rows; probe rounds are capped low
(keep the table load factor <= 0.25 — capacity is cheap, 40 B/slot in HBM).
Sorts are avoided entirely (bitonic O(n log^2 n) on TPU: a lexicographic
dedup sort over ~1M rows costs seconds and dominated integration before this
design).  No atomics or host sync; int64 keys are avoided (TPU-friendly
int32 coords with 3-column equality).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_PROBES = 16
# probe rounds during insertion: each round costs ~2 random passes over the
# update batch, and at load factor <= 0.25 virtually every key resolves
# within 4 linear probes; unresolved leftovers are dropped for THIS batch
# only (they retry next integrate) — keep capacity sized well above the
# expected voxel count rather than raising this
INSERT_ROUNDS = 4


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
    reference's ``integrate``), inserting unseen voxels.

    Duplicate keys within the batch need no pre-dedup: they all resolve to
    one slot (see claim loop) and their weighted contributions are combined
    by the scatter-add accumulators below.
    """
    C = table.capacity
    n = coords.shape[0]

    # ---- resolve slots: probe for existing or claim empty ----------------
    # key+occupancy packed into ONE (C,4) array: each probe round pays a
    # single wide-row gather instead of two separate random passes
    h0 = _hash(coords, C)
    ids = jnp.arange(n, dtype=jnp.int32)
    keyocc = jnp.concatenate(
        [table.keys, table.occupied[:, None].astype(jnp.int32)], axis=1
    )

    def claim_round(r, state):
        slot_of, probe, keyocc = state
        pending = (slot_of < 0) & valid
        slot = (h0 + probe) & (C - 1)
        ko = keyocc[slot]                       # ONE gather per round
        occ = ko[:, 3] > 0
        key_eq = jnp.all(ko[:, :3] == coords, axis=-1) & occ
        # case 1: slot already holds our key
        take = pending & key_eq
        slot_of = jnp.where(take, slot, slot_of)
        pending = pending & ~take
        # case 2: slot empty -> race via ticket min
        want = pending & ~occ
        tickets = jnp.full((C,), n, jnp.int32).at[
            jnp.where(want, slot, C)
        ].min(ids, mode="drop")
        winner_id = tickets[slot]
        won = want & (winner_id == ids)
        # winners claim: ONE packed scatter writes key + occupied together
        # (losers scatter out-of-bounds and are dropped — never write a live
        # slot with a stale value)
        row = jnp.concatenate(
            [coords, jnp.ones((n, 1), jnp.int32)], axis=1
        )
        keyocc = keyocc.at[jnp.where(won, slot, C)].set(row, mode="drop")
        slot_of = jnp.where(won, slot, slot_of)
        pending = pending & ~won
        # duplicate keys: a loser whose slot was claimed THIS round by a
        # winner with the same key binds to it here instead of probing past
        # it (which would claim a second slot for the same voxel).  The
        # winner's key equals ours iff our coords match the winning row's —
        # check via the winner's id (cheap: reuse the ticket gather)
        winner_key = coords[jnp.clip(winner_id, 0, n - 1)]
        same_as_winner = (
            pending & want & (winner_id < n)
            & jnp.all(winner_key == coords, axis=-1)
        )
        slot_of = jnp.where(same_as_winner, slot, slot_of)
        pending = pending & ~same_as_winner
        # losers to FOREIGN keys advance their probe offset
        probe = jnp.where(pending, probe + 1, probe)
        return slot_of, probe, keyocc

    slot_of0 = jnp.full((n,), -1, jnp.int32)
    probe0 = jnp.zeros((n,), jnp.int32)
    slot_of, _, keyocc = jax.lax.fori_loop(
        0, INSERT_ROUNDS, claim_round, (slot_of0, probe0, keyocc)
    )

    # ---- accumulate: ONE packed scatter-add into per-slot accumulators ---
    ok = (slot_of >= 0) & valid
    tgt = jnp.where(ok, slot_of, C)   # out-of-bounds => dropped
    upd = jnp.concatenate(
        [
            w[:, None],
            (sdf * w)[:, None],
            color * w[:, None],
        ],
        axis=1,
    ).astype(jnp.float32)                               # (N,5)
    acc = jnp.zeros((C, 5), jnp.float32).at[tgt].add(upd, mode="drop")
    wsum, twsum, csum = acc[:, 0], acc[:, 1], acc[:, 2:5]

    touched = wsum > 0
    w_old = table.weight
    denom = jnp.maximum(w_old + wsum, 1e-9)
    tsdf = jnp.where(touched, (table.tsdf * w_old + twsum) / denom, table.tsdf)
    weight = jnp.where(touched, jnp.minimum(w_old + wsum, max_weight), w_old)
    color_new = jnp.where(
        touched[:, None],
        (table.color * w_old[:, None] + csum) / denom[:, None],
        table.color,
    )
    return VoxelHashTable(
        keys=keyocc[:, :3],
        occupied=keyocc[:, 3] > 0,
        tsdf=tsdf,
        weight=weight,
        color=color_new,
    )


def gather_values(table: VoxelHashTable, coords: jnp.ndarray):
    """(tsdf, weight) at coords (0 weight if absent)."""
    slots = lookup(table, coords)
    ok = slots >= 0
    s = jnp.where(ok, slots, 0)
    return (
        jnp.where(ok, table.tsdf[s], 0.0),
        jnp.where(ok, table.weight[s], 0.0),
    )
