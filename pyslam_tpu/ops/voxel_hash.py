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
the whole design is therefore shaped around MINIMIZING RANDOM-ACCESS PASSES.
All random access during probing runs over a single-int32 FINGERPRINT image
of the table (a second spatial hash of the key, 0 reserved for "empty"),
derived from keys+occupied with one dense pass per call: each probe round is
then ONE 1-element-per-lane gather + one scatter, instead of 4-wide key rows
(measured 2.5-3x on the insert path).  Full (C,3) keys are written ONCE after
the claim loop for the slots claimed this batch.  Fingerprint equality stands
in for key equality: two different voxels alias only if they land on the same
probe slot AND collide in the 32-bit fingerprint (~2^-32 per pair — orders of
magnitude below the TSDF noise floor; the blend then merges their updates,
it never corrupts unrelated slots).  All per-slot accumulators
(weight / tsdf*w / gray*w) are packed so accumulation is ONE scatter-add of
wide rows; probe rounds are capped low (keep the table load factor <= 0.25 —
capacity is cheap, 40 B/slot in HBM).  Sorts are avoided entirely (bitonic
O(n log^2 n) on TPU: a lexicographic dedup sort over ~1M rows costs seconds
and dominated integration before this design).  No atomics or host sync;
int64 keys are avoided (TPU-friendly int32 coords).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_PROBES = 16
# probe rounds during insertion: each round costs ~3 random passes over the
# update batch, and at load factor <= 0.25 virtually every key resolves
# within 4 linear probes.  6 rounds (not 4) because a loser racing on a
# just-claimed slot stalls one round before advancing (see claim_round), so
# worst-case probe REACH is rounds minus stalls — and because updates
# unresolved within the budget are dropped PERMANENTLY for that depth view
# (phased row-interleaved integration visits each view exactly once), the
# budget must cover the reach, not rely on a retry.  Keep capacity sized
# well above the expected voxel count rather than raising this further.
INSERT_ROUNDS = 6


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


def _fingerprint(coords: jnp.ndarray) -> jnp.ndarray:
    """Second, independent spatial hash -> nonzero int32 fingerprint.

    0 is reserved for "empty slot"; any key hashing to 0 is remapped to 1
    (costs one fingerprint value, keeps the empty test a plain != 0)."""
    x = coords[..., 0].astype(jnp.uint32)
    y = coords[..., 1].astype(jnp.uint32)
    z = coords[..., 2].astype(jnp.uint32)
    h = (x * jnp.uint32(2654435761)) ^ (y * jnp.uint32(805459861)) ^ (
        z * jnp.uint32(3674653429)
    )
    h = h ^ (h >> jnp.uint32(16))
    return jnp.where(h == 0, jnp.uint32(1), h).astype(jnp.int32)


def _table_fingerprints(table: VoxelHashTable) -> jnp.ndarray:
    """(C,) fingerprint image of the table (one DENSE pass — cheap)."""
    return jnp.where(table.occupied, _fingerprint(table.keys), 0)


def lookup(table: VoxelHashTable, coords: jnp.ndarray) -> jnp.ndarray:
    """(N,3) coords -> (N,) slot index or -1 (linear probing, fixed budget).

    Probes on the 1-int32 fingerprint image (see module docstring) so each
    round is a single-element gather per lane.

    PROBABILISTIC CONTRACT: key equality is tested via the 32-bit
    fingerprint only — an absent coord can resolve to a false-positive slot
    (and two voxels can alias) with probability ~2^-32 per colliding pair.
    Negligible for TSDF fusion; callers needing exact semantics must verify
    ``table.keys[slot] == coord`` themselves."""
    C = table.capacity
    h0 = _hash(coords, C)
    fpt = _table_fingerprints(table)
    fps = _fingerprint(coords)

    def body(i, state):
        slot_found = state
        slot = (h0 + i) & (C - 1)
        key_eq = fpt[slot] == fps
        return jnp.where((slot_found < 0) & key_eq, slot, slot_found)

    return jax.lax.fori_loop(0, MAX_PROBES, body, jnp.full(h0.shape, -1, jnp.int32))


@jax.jit
def insert_and_accumulate(
    table: VoxelHashTable,
    coords: jnp.ndarray,    # (N,3) int32 voxel coords
    sdf: jnp.ndarray,       # (N,) tsdf values of the updates
    w: jnp.ndarray,         # (N,) update weights
    color: jnp.ndarray,     # (N,) grayscale intensity (or (N,3): R used)
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
    # ALL random access runs over the (C,) int32 fingerprint image (ONE
    # dense pass to build) — each probe round is a 1-element gather +
    # 1-element winner scatter per lane, vs 4-wide key rows before (~2.5x)
    h0 = _hash(coords, C)
    ids = jnp.arange(n, dtype=jnp.int32)
    fpt = _table_fingerprints(table)
    fps = _fingerprint(coords)

    def claim_round(r, state):
        slot_of, probe, won_any, fpt = state
        pending = (slot_of < 0) & valid
        slot = (h0 + probe) & (C - 1)
        fslot = fpt[slot]                       # ONE 1-elem gather per round
        occ = fslot != 0
        key_eq = fslot == fps
        # case 1: slot already holds our key (fingerprint equality — see
        # module docstring for the collision analysis)
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
        # winners claim: write the fingerprint (losers scatter out-of-bounds
        # and are dropped — never write a live slot with a stale value)
        fpt = fpt.at[jnp.where(won, slot, C)].set(fps, mode="drop")
        slot_of = jnp.where(won, slot, slot_of)
        won_any = won_any | won
        pending = pending & ~won
        # losers whose slot was claimed THIS round (want & ~won) STAY at the
        # same probe offset: next round's fpt gather sees the winner's
        # fingerprint, so a duplicate-key loser binds via key_eq (case 1) and
        # a foreign-key loser advances then.  This replaces a per-round (N,)
        # winner-fingerprint gather with nothing (3 random passes per round
        # instead of 4, each ~11 ns/element); the only cost is one wasted
        # round for the rare foreign pair racing on the same empty slot.
        probe = jnp.where(pending & ~want, probe + 1, probe)
        return slot_of, probe, won_any, fpt

    slot_of0 = jnp.full((n,), -1, jnp.int32)
    probe0 = jnp.zeros((n,), jnp.int32)
    won0 = jnp.zeros((n,), bool)
    slot_of, _, won_any, fpt = jax.lax.fori_loop(
        0, INSERT_ROUNDS, claim_round, (slot_of0, probe0, won0, fpt)
    )

    # full (C,3) keys + occupancy: written ONCE for this batch's claims
    claim_tgt = jnp.where(won_any, slot_of, C)
    keys_new = table.keys.at[claim_tgt].set(coords, mode="drop")
    occ_new = table.occupied.at[claim_tgt].set(True, mode="drop")

    # ---- accumulate: ONE packed scatter-add into per-slot accumulators ---
    ok = (slot_of >= 0) & valid
    tgt = jnp.where(ok, slot_of, C)   # out-of-bounds => dropped
    # (N,3) color compatibility path: average to intensity (not channel R)
    # so a true-RGB producer degrades to correct grayscale
    gray = color if color.ndim == 1 else color.mean(axis=1)
    upd = jnp.stack([w, sdf * w, gray * w], axis=1).astype(jnp.float32)
    acc = jnp.zeros((C, 3), jnp.float32).at[tgt].add(upd, mode="drop")
    wsum, twsum, gsum = acc[:, 0], acc[:, 1], acc[:, 2]

    touched = wsum > 0
    w_old = table.weight
    denom = jnp.maximum(w_old + wsum, 1e-9)
    tsdf = jnp.where(touched, (table.tsdf * w_old + twsum) / denom, table.tsdf)
    weight = jnp.where(touched, jnp.minimum(w_old + wsum, max_weight), w_old)
    # grayscale updates broadcast over the RGB channels (the depth->update
    # kernel emits intensity; identical per-channel contribution)
    color_new = jnp.where(
        touched[:, None],
        (table.color * w_old[:, None] + gsum[:, None]) / denom[:, None],
        table.color,
    )
    return VoxelHashTable(
        keys=keys_new,
        occupied=occ_new,
        tsdf=tsdf,
        weight=weight,
        color=color_new,
    )


def gather_values(table: VoxelHashTable, coords: jnp.ndarray):
    """(tsdf, weight) at coords (0 weight if absent).

    Inherits ``lookup``'s probabilistic fingerprint-equality contract."""
    slots = lookup(table, coords)
    ok = slots >= 0
    s = jnp.where(ok, slots, 0)
    return (
        jnp.where(ok, table.tsdf[s], 0.0),
        jnp.where(ok, table.weight[s], 0.0),
    )
