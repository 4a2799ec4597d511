"""Shape bucketing for jit-boundary arrays.

XLA compiles one executable per input shape; SLAM's per-frame counts (matches,
local-map points, BA observations) vary continuously.  Padding every variable
dimension up to a geometric bucket keeps the number of distinct compilations
logarithmic while wasting at most ~2x compute on the padded tail (masked out
via ``valid`` flags).  This is the framework-wide convention: ANY host->device
call with a data-dependent length goes through ``bucket_size`` first.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket >= n (>= minimum)."""
    if n <= minimum:
        return minimum
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
    """Pad axis 0 to its power-of-two bucket; returns (padded, valid_mask)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    m = bucket_size(n, minimum)
    valid = np.zeros((m,), bool)
    valid[:n] = True
    return pad_rows(arr, m, fill), valid
