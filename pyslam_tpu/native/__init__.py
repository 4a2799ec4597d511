"""Native (C++) runtime components, built on demand with the host toolchain.

The compute path is JAX/XLA/Pallas; this package holds the host-bound native
pieces the reference implements in C++ — the observation-graph bookkeeping
(pySLAM's C++ core map/keyframe classes) and a SIMD Hamming fallback (pySLAM
``cpp/hamming``).  The shared library compiles lazily with g++ into the
package directory and loads through ctypes; every consumer has a pure-Python
fallback, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "obs_graph.cpp")
_LIB = os.path.join(_HERE, "libpyslam_native.so")

_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return r.stderr[:2000]
        return None
    except Exception as e:  # pragma: no cover
        return str(e)


def get_lib():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    _build_error = _build()
    if _build_error:
        return None
    lib = ctypes.CDLL(_LIB)
    lib.og_create.restype = ctypes.c_void_p
    lib.og_destroy.argtypes = [ctypes.c_void_p]
    lib.og_add_observation.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32
    ]
    lib.og_add_observation.restype = ctypes.c_int32
    lib.og_remove_observation.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
    ]
    lib.og_remove_observation.restype = ctypes.c_int32
    lib.og_remove_point.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.og_num_obs.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.og_num_obs.restype = ctypes.c_int32
    lib.og_point_obs.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.og_point_obs.restype = ctypes.c_int32
    lib.og_covisibility_counts.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.og_covisibility_counts.restype = ctypes.c_int32
    lib.og_points_seen_by.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.og_points_seen_by.restype = ctypes.c_int32
    lib.og_total_observations.argtypes = [ctypes.c_void_p]
    lib.og_total_observations.restype = ctypes.c_int64
    lib.og_collect_observations.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.og_collect_observations.restype = ctypes.c_int64
    lib.hamming_distance_matrix_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


class NativeObsGraph:
    """ctypes wrapper over the C++ observation graph."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.og_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.og_destroy(self._h)
            self._h = None

    def add_observation(self, pid: int, kid: int, kp_idx: int) -> bool:
        return bool(self._lib.og_add_observation(self._h, pid, kid, kp_idx))

    def remove_observation(self, pid: int, kid: int) -> int:
        return int(self._lib.og_remove_observation(self._h, pid, kid))

    def remove_point(self, pid: int):
        self._lib.og_remove_point(self._h, pid)

    def num_obs(self, pid: int) -> int:
        return int(self._lib.og_num_obs(self._h, pid))

    def point_obs(self, pid: int) -> dict:
        cap = 1024
        kids = np.zeros(cap, np.int32)
        idxs = np.zeros(cap, np.int32)
        n = self._lib.og_point_obs(
            self._h, pid,
            kids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        return {int(k): int(i) for k, i in zip(kids[:n], idxs[:n])}

    def covisibility_counts(self, pids, exclude_kid: int) -> dict:
        pids = np.ascontiguousarray(pids, np.int64)
        cap = 4096
        kids = np.zeros(cap, np.int32)
        counts = np.zeros(cap, np.int32)
        m = self._lib.og_covisibility_counts(
            self._h,
            pids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pids), exclude_kid,
            kids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        return {int(k): int(c) for k, c in zip(kids[:m], counts[:m])}

    def collect_observations(self, pids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Bulk (pt_row, kid, kp_idx) edge list over the given point ids —
        the BA problem assembly primitive (one C pass, no Python loop)."""
        pids = np.ascontiguousarray(pids, np.int64)
        cap = max(64, len(pids) * 32)
        pr = np.zeros(cap, np.int64)
        kd = np.zeros(cap, np.int32)
        kp = np.zeros(cap, np.int32)
        m = self._lib.og_collect_observations(
            self._h,
            pids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pids),
            pr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            kd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            kp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        return pr[:m].copy(), kd[:m].copy(), kp[:m].copy()

    def points_seen_by(self, kid: int, cap: int = 1 << 16) -> np.ndarray:
        out = np.zeros(cap, np.int64)
        n = self._lib.og_points_seen_by(
            self._h, kid, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap
        )
        return out[:n]

    def total_observations(self) -> int:
        return int(self._lib.og_total_observations(self._h))


def hamming_distance_matrix_cpu(a_packed: np.ndarray, b_packed: np.ndarray):
    """SIMD popcount Hamming on packed uint8 descriptors (native fallback
    twin of ops.hamming; used for CPU parity tests)."""
    lib = get_lib()
    a = np.ascontiguousarray(a_packed, np.uint8)
    b = np.ascontiguousarray(b_packed, np.uint8)
    n, nb = a.shape
    m, _ = b.shape
    out = np.zeros((n, m), np.int32)
    if lib is None:
        # pure numpy fallback
        for i in range(n):
            out[i] = np.unpackbits(np.bitwise_xor(a[i][None, :], b), axis=1).sum(1)
        return out
    lib.hamming_distance_matrix_u8(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, m, nb,
    )
    return out
