"""Fully-fused per-frame tracking step: ONE device dispatch for the OK path.

Composes the stages of ``Tracking.track`` (reference call stack SURVEY §3.1:
search_frame_by_projection -> pose opt #1 -> search_map_by_projection ->
pose opt #2) into a single jitted graph.  Rationale: on a remote-TPU tunnel
each dispatch/readback costs ~3-12 ms of RPC latency; the legacy path makes
~8 device round trips per frame, this one makes 1 dispatch + 2 readbacks.

The widening-radius retry of the reference's ``track_previous_frame``
(tracking.py:351-476) is computed in-graph: both radii are searched and the
wide result is selected when the narrow one found too few matches (compute
is cheap, control flow on host would cost a round trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.ops import optim
from pyslam_tpu.ops.slam_matching import search_by_projection


@functools.partial(jax.jit, static_argnames=("min_prev_matches",))
def track_frame_fused(
    # frame side (N fixed)
    kps: jnp.ndarray,            # (N,2)
    kp_level: jnp.ndarray,       # (N,)
    kp_des: jnp.ndarray,         # (N,256)
    kp_valid: jnp.ndarray,       # (N,)
    kp_ur: jnp.ndarray,          # (N,)
    # previous frame's tracked points (Mp padded)
    prev_pos, prev_desc, prev_normal, prev_min_d, prev_max_d, prev_valid,
    # local-map points (Mm padded)
    map_pos, map_desc, map_normal, map_min_d, map_max_d, map_valid,
    # geometry / parameters (traced scalars: no recompiles when they change)
    Tcw_pred: jnp.ndarray,
    K: jnp.ndarray,
    image_bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    sigma2_table: jnp.ndarray,   # (L,) per-level variance
    bf: jnp.ndarray,
    radius_frame: jnp.ndarray,
    radius_frame_wide: jnp.ndarray,
    radius_map: jnp.ndarray,
    desc_th: jnp.ndarray,
    ratio_map: jnp.ndarray,
    min_prev_matches: int = 20,
):
    """Returns one packed f32 vector (2N+19,):
    [Tcw_opt (16) | n_prev, n_inl1, n_inl2 | match_code (N) | inlier (N)].

    match_code per keypoint: row into prev arrays, or Mp + row into map
    arrays, or -1.
    """
    N = kps.shape[0]
    Mp = prev_pos.shape[0]
    Mm = map_pos.shape[0]
    sigma2 = sigma2_table[jnp.clip(kp_level, 0, sigma2_table.shape[0] - 1)]

    def search_prev(radius):
        _, kp_match, _ = search_by_projection(
            prev_pos, prev_desc, prev_normal, prev_min_d, prev_max_d,
            prev_valid,
            kps, kp_level, kp_des, kp_valid, kp_ur,
            Tcw_pred, K, image_bounds, scale_factors,
            radius, desc_th, ratio=0.9,
        )
        return kp_match

    kp_m1 = search_prev(radius_frame)
    n1 = jnp.sum(kp_m1 >= 0)
    kp_m2 = search_prev(radius_frame_wide)
    kp_match_prev = jnp.where(n1 >= min_prev_matches, kp_m1, kp_m2)
    n_prev = jnp.sum(kp_match_prev >= 0)

    # pose optimization #1 against prev-frame points
    has1 = (kp_match_prev >= 0) & kp_valid
    pts1 = prev_pos[jnp.clip(kp_match_prev, 0, Mp - 1)]
    T1, inl1, n_inl1 = optim.pose_optimization(
        Tcw_pred, pts1, kps, kp_ur, sigma2, has1, K, bf=bf,
    )
    keep_prev = has1 & inl1

    # local-map search from the refined pose
    _, kp_match_map, _ = search_by_projection(
        map_pos, map_desc, map_normal, map_min_d, map_max_d, map_valid,
        kps, kp_level, kp_des, kp_valid, kp_ur,
        T1, K, image_bounds, scale_factors,
        radius_map, desc_th, ratio=ratio_map,
    )
    use_map = (kp_match_map >= 0) & ~keep_prev & kp_valid

    pts2 = jnp.where(
        keep_prev[:, None], pts1,
        map_pos[jnp.clip(kp_match_map, 0, Mm - 1)],
    )
    valid2 = keep_prev | use_map
    T2, inl2, n_inl2 = optim.pose_optimization(
        T1, pts2, kps, kp_ur, sigma2, valid2, K, bf=bf,
    )

    match_code = jnp.where(
        keep_prev, kp_match_prev,
        jnp.where(use_map, Mp + kp_match_map, -1),
    ).astype(jnp.int32)
    # per-kp matched descriptor distance (sum-abs over unpacked bits =
    # Hamming): feeds the host's adaptive descriptor gate every frame
    # without a
    # descriptor transfer (slam_dynamic_config.update_descriptor_stats)
    src_desc = jnp.where(
        keep_prev[:, None],
        prev_desc[jnp.clip(kp_match_prev, 0, Mp - 1)].astype(jnp.float32),
        map_desc[jnp.clip(kp_match_map, 0, Mm - 1)].astype(jnp.float32),
    )
    mdist = jnp.where(
        valid2,
        jnp.sum(jnp.abs(src_desc - kp_des.astype(jnp.float32)), axis=1),
        jnp.inf,
    )
    # pack EVERYTHING into one f32 buffer => a single device->host transfer
    # (pose 16 | counts 3 | match_code N | inlier N | match_dist N); match
    # codes < Mp+Mm << 2^24 are exact in f32
    out = jnp.concatenate([
        T2.reshape(-1).astype(jnp.float32),
        jnp.stack([n_prev, n_inl1, n_inl2]).astype(jnp.float32),
        match_code.astype(jnp.float32),
        inl2.astype(jnp.float32),
        mdist,
    ])
    return out


@functools.partial(jax.jit, static_argnames=("min_prev_matches",))
def track_frame_fused_indexed(
    # frame side (N fixed)
    kps, kp_level, kp_des, kp_valid, kp_ur,
    # FULL device-resident point store (C rows; cached across frames)
    store_pos, store_desc, store_normal, store_min_d, store_max_d,
    store_valid,
    # row indices into the store (bucketed, -1 = padding) — the ONLY
    # per-frame map-side upload (a few KB instead of ~1 MB of gathers)
    idx_prev, idx_map,
    Tcw_pred, K, image_bounds, scale_factors, sigma2_table, bf,
    radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
    min_prev_matches: int = 20,
):
    """track_frame_fused with the point-store gathers INSIDE the graph, and
    the match-code segment RESOLVED to absolute store rows (map-point ids)
    in-graph.

    The host keeps one device copy of the map arrays (invalidated by
    ``Map.store_version``); per frame only the index vectors cross the
    tunnel.  Resolving codes to store rows on device (a) spares the host the
    row bookkeeping and (b) lets the NEXT frame's graph consume this output
    directly as its previous-frame tracked set (``track_frame_fused_chained``
    — the 2-frames-in-flight pipeline), because store rows, unlike local
    match codes, are meaningful across frames."""

    def gather(idx):
        cl = jnp.clip(idx, 0)
        valid = (idx >= 0) & store_valid[cl]
        # sanitize padded rows: unset max_dist is +inf in the store
        pos = jnp.where(valid[:, None], store_pos[cl], 0.0)
        max_d = jnp.where(valid, store_max_d[cl], 1.0)
        min_d = jnp.where(valid, store_min_d[cl], 0.0)
        return (pos, store_desc[cl], store_normal[cl], min_d, max_d, valid)

    prev = gather(idx_prev)
    mp = gather(idx_map)
    packed = track_frame_fused(
        kps, kp_level, kp_des, kp_valid, kp_ur,
        *prev, *mp,
        Tcw_pred, K, image_bounds, scale_factors, sigma2_table, bf,
        radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
        min_prev_matches=min_prev_matches,
    )
    # resolve match codes -> store rows (exact in f32: rows < capacity << 2^24)
    N = kps.shape[0]
    Mp = idx_prev.shape[0]
    Mm = idx_map.shape[0]
    code = packed[19 : 19 + N].astype(jnp.int32)
    row = jnp.where(
        code >= 0,
        jnp.where(
            code < Mp,
            idx_prev[jnp.clip(code, 0, Mp - 1)],
            idx_map[jnp.clip(code - Mp, 0, Mm - 1)],
        ),
        -1,
    )
    return packed.at[19 : 19 + N].set(row.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("min_prev_matches",))
def track_frame_fused_meta(
    # packed per-kp meta straight from the stereo extraction graph
    # (x y level angle size resp valid ur depth — orb2 stereo layout) and
    # the device descriptor handle: the frame's device outputs feed the
    # tracking step WITHOUT ever visiting the host (pipelined frame loop)
    meta,                      # (N,9) f32, device handle
    kp_des,                    # (N,D), device handle
    store_pos, store_desc, store_normal, store_min_d, store_max_d,
    store_valid,
    idx_prev, idx_map,
    Tcw_pred, K, image_bounds, scale_factors, sigma2_table, bf,
    radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
    min_prev_matches: int = 20,
):
    """``track_frame_fused_indexed`` with frame inputs sliced from the
    extraction meta IN-GRAPH, and the meta appended to the packed output:
    [fused packed (3N+19) | meta (9N)] — extraction -> tracking chains as
    pure device dataflow and the host pays ONE readback per frame."""
    kps = meta[:, 0:2]
    kp_level = meta[:, 2].astype(jnp.int32)
    kp_valid = meta[:, 6] > 0.5
    kp_ur = meta[:, 7]
    packed = track_frame_fused_indexed(
        kps, kp_level, kp_des, kp_valid, kp_ur,
        store_pos, store_desc, store_normal, store_min_d, store_max_d,
        store_valid,
        idx_prev, idx_map,
        Tcw_pred, K, image_bounds, scale_factors, sigma2_table, bf,
        radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
        min_prev_matches=min_prev_matches,
    )
    return jnp.concatenate([packed, meta.reshape(-1)])


@functools.partial(
    jax.jit, static_argnames=("min_prev_matches", "cap_prev")
)
def track_frame_fused_chained(
    # frame N's extraction handles (device — never visited the host)
    meta,                      # (N,9) f32 packed per-kp meta
    kp_des,                    # (N,D) descriptors
    # frame N-1's PACKED OUTPUT buffer, still on device: pose at [:16],
    # resolved store rows at [19:19+N], inlier flags at [19+N:19+2N].
    # Accepts either layout (with or without the trailing meta block).
    prev_out,
    # device-resident point store (current version)
    store_pos, store_desc, store_normal, store_min_d, store_max_d,
    store_valid,
    # local-map store rows (host-computed; one frame STALE in the pipelined
    # loop — the covisibility neighborhood moves slowly, and KF-frame
    # resyncs bound the staleness to a single frame)
    idx_map,
    # motion-model velocity Tcw_delta (one-frame-stale host estimate): the
    # pose PREDICTION for frame N is computed in-graph as vel @ T_{N-1}
    # because T_{N-1} exists only on device at dispatch time
    vel,
    K, image_bounds, scale_factors, sigma2_table, bf,
    radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
    min_prev_matches: int = 20,
    cap_prev: int = 2048,
):
    """Two-frames-in-flight tracking step (VERDICT r4 ask #1).

    The reference's hot loop (pySLAM ``tracking.py:1082-1449``) pays zero
    accelerator round trips; on a remote-attached TPU each same-frame
    readback costs a full tunnel RTT (~27 ms) plus the device-queue share in
    front of it.  This graph removes the same-frame readback entirely: frame
    N's tracking consumes frame N-1's output WHILE IT IS STILL ON DEVICE —
    its optimized pose (for the in-graph motion prediction) and its resolved
    store rows + inlier flags (as the previous-frame tracked point set).
    The host reads back frame N-1's buffer a full frame later, when it has
    long since completed, so steady-state wall time per frame approaches
    max(host work, device work) instead of their sum plus the RTT.

    Staleness contract: the motion velocity and the local-map row set are
    one frame stale — exactly the tolerance the reference's own
    constant-velocity prediction and covisibility windows already assume.

    Returns the standard packed layout [16 pose | 3 counts | N store_row |
    N inlier | N mdist | 9N meta] so the output chains again.
    """
    N = meta.shape[0]
    T_prev = prev_out[:16].reshape(4, 4)
    prev_rows = prev_out[19 : 19 + N].astype(jnp.int32)
    prev_inl = prev_out[19 + N : 19 + 2 * N] > 0
    rows = jnp.where(prev_inl, prev_rows, -1)
    # fixed-width prev set: N <= cap_prev (the session keypoint cap)
    idx_prev = jnp.full((cap_prev,), -1, jnp.int32).at[:N].set(rows)
    Tcw_pred = (vel @ T_prev).astype(jnp.float32)
    return track_frame_fused_meta(
        meta, kp_des,
        store_pos, store_desc, store_normal, store_min_d, store_max_d,
        store_valid,
        idx_prev, idx_map,
        Tcw_pred, K, image_bounds, scale_factors, sigma2_table, bf,
        radius_frame, radius_frame_wide, radius_map, desc_th, ratio_map,
        min_prev_matches=min_prev_matches,
    )
