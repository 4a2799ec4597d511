"""Shape bucketing for jit-boundary arrays.

XLA compiles one executable per input shape; SLAM's per-frame counts (matches,
local-map points, BA observations) vary continuously.  Two regimes:

- CPU (the test suite): padded FLOPs are real cost and compiles are cheap, so
  pad every variable dimension up to a power-of-two bucket — log-many
  compilations, <=2x wasted compute.
- Accelerators (TPU): each compile of a large per-frame graph costs seconds
  (plus tunnel RTTs), while padded FLOPs on the MXU are nearly free.  Hot
  per-frame callsites use FIXED session caps (see ``fixed_shapes`` +
  ``pad_fixed``) so each graph compiles exactly once; the remaining
  occasional callsites (loop closing, relocalization) use a coarse 4x ladder
  via ``bucket_size`` — at most ~6 compiles per callsite per session.

This is the framework-wide convention: ANY host->device call with a
data-dependent length goes through ``bucket_size``/``pad_fixed`` first.
"""

from __future__ import annotations

import numpy as np

# coarse accelerator ladder: 4x growth bounds compiles per callsite at
# len(_LADDER); beyond the top entry fall back to power-of-two growth
_LADDER = (64, 256, 1024, 4096, 16384, 65536, 262144)

_fixed_override: bool | None = None   # tests force the policy on/off


def set_fixed_shape_policy(on: bool | None):
    """Force the fixed-shape/ladder policy on or off (None = auto: enabled
    on accelerators, disabled on CPU).  Used by tests to exercise the TPU
    shape policy on the CPU mesh."""
    global _fixed_override
    _fixed_override = on


def fixed_shapes() -> bool:
    """True when jit callsites should use fixed session caps / the coarse
    ladder (accelerator backends), False for fine CPU buckets."""
    if _fixed_override is not None:
        return _fixed_override
    import jax

    return jax.default_backend() != "cpu"


def pow2(n: int, minimum: int = 64) -> int:
    """Next power of two >= n (>= minimum) — for session-fixed caps."""
    if n <= minimum:
        return minimum
    return 1 << int(np.ceil(np.log2(n)))


def bucket_size(n: int, minimum: int = 64) -> int:
    """Next shape bucket >= n: power-of-two on CPU, coarse ladder on
    accelerators (compiles are the scarce resource there)."""
    if n <= minimum:
        return minimum
    if fixed_shapes():
        for c in _LADDER:
            if n <= c and c >= minimum:
                return c
    return 1 << int(np.ceil(np.log2(n)))


def bucket_size_linear(n: int, step: int = 8, minimum: int = 8) -> int:
    """Next multiple-of-step bucket (for small counts like BA cameras)."""
    if n <= minimum:
        return minimum
    return ((n + step - 1) // step) * step


def pad_rows(arr: np.ndarray, n_to: int, fill=0) -> np.ndarray:
    """Pad axis 0 of ``arr`` to length ``n_to`` with ``fill``."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if n == n_to:
        return arr
    pad_shape = (n_to - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)], axis=0)


def pad_bucket(arr: np.ndarray, fill=0, minimum: int = 64):
    """Pad axis 0 to its shape bucket; returns (padded, valid_mask)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    m = bucket_size(n, minimum)
    valid = np.zeros((m,), bool)
    valid[:n] = True
    return pad_rows(arr, m, fill), valid


def pad_fixed(arr: np.ndarray, cap: int, fill=0):
    """Pad axis 0 to the FIXED session cap (accelerator policy) or to its
    bucket (CPU).  Rows beyond ``cap`` are dropped — callers that must not
    lose rows subsample with ``cap_select`` first.  Returns
    (padded, valid_mask)."""
    arr = np.asarray(arr)
    if not fixed_shapes():
        return pad_bucket(arr, fill=fill, minimum=min(cap, 64))
    n = min(arr.shape[0], cap)
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return pad_rows(arr[:n], cap, fill), valid


def cap_select(ids: np.ndarray, cap: int, score: np.ndarray | None = None):
    """Deterministically keep at most ``cap`` rows of ``ids`` (highest
    ``score`` first when given, original order preserved)."""
    ids = np.asarray(ids)
    if len(ids) <= cap:
        return ids
    if score is None:
        # even subsample keeps spatial diversity of an ordered id list
        sel = np.linspace(0, len(ids) - 1, cap).astype(np.int64)
        return ids[sel]
    keep = np.argpartition(-np.asarray(score), cap - 1)[:cap]
    return ids[np.sort(keep)]
