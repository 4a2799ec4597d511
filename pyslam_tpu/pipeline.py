"""Fused per-frame frontend step: the framework's flagship compiled graph.

One jitted XLA program per frame: ORB2 feature extraction (pyramid, FAST,
NMS, orientation, BRIEF) -> MXU Hamming matching against the local map ->
motion-only LM pose optimization.  This is the entire hot path of
``Tracking.track`` (reference call stack SURVEY.md section 3.1) as a single
device dispatch — the design goal that separates this framework from the
reference's per-stage Python/C++ hopping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyslam_tpu.features.orb2 import _extract_jit
from pyslam_tpu.ops import hamming, matching, optim


@functools.partial(
    jax.jit,
    static_argnames=("num_features", "num_levels", "scale", "fast_th", "use_pallas"),
)
def frontend_step(
    img: jnp.ndarray,        # (H, W) grayscale
    map_pos: jnp.ndarray,    # (M, 3) local-map point positions
    map_desc: jnp.ndarray,   # (M, 256) int8 bits
    map_valid: jnp.ndarray,  # (M,)
    Tcw_pred: jnp.ndarray,   # (4, 4) motion-model prediction
    K: jnp.ndarray,          # (3, 3)
    num_features: int = 2000,
    num_levels: int = 8,
    scale: float = 1.2,
    fast_th: float = 20.0,
    use_pallas: bool | None = None,
):
    """Extract + match + optimize in one compiled graph.

    Returns (feats, matched_pt_idx per kp, Tcw_opt, num_inliers).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    feats = _extract_jit(
        img, num_features, num_levels, scale, fast_th, 16, 6, use_pallas
    )

    dmat = hamming.hamming_distance_matrix(map_desc, feats.desc).astype(jnp.float32)
    idx, dist = matching.match_ratio_test(
        dmat, 100.0, ratio=0.9, valid_a=map_valid, valid_b=feats.valid,
    )
    # per-kp matched map row
    M = map_pos.shape[0]
    N = feats.xy.shape[0]
    kp_match = jnp.full((N,), -1, jnp.int32)
    rows = jnp.arange(M, dtype=jnp.int32)
    kp_match = kp_match.at[jnp.where(idx >= 0, idx, N)].set(
        jnp.where(idx >= 0, rows, -1), mode="drop"
    )
    has_match = kp_match >= 0
    pts3d = map_pos[jnp.clip(kp_match, 0, M - 1)]
    sigma2 = (scale ** feats.level.astype(jnp.float32)) ** 2

    Tcw_opt, inliers, n_inl = optim.pose_optimization(
        Tcw_pred,
        pts3d,
        feats.xy,
        jnp.full((N,), -1.0, jnp.float32),
        sigma2,
        has_match & feats.valid,
        K,
        bf=0.0,
    )
    return feats, kp_match, Tcw_opt, n_inl
