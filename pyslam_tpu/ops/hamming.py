"""Binary-descriptor Hamming distance on the MXU.

TPU-native replacement for the reference's SIMD ``hamming`` pybind module
(pySLAM ``cpp/hamming/hamming_module.cpp``: AVX2/SSE popcount over packed
uint8 descriptors).  On TPU we reformulate popcount(XOR) as a matmul:

    with a, b in {0,1}^D (unpacked bit-planes),
    hamming(a, b) = |a| + |b| - 2 a.b

so a full N x M distance matrix is one int8 MXU matmul plus rank-1 updates —
exactly the shape the systolic array wants.  Descriptors live natively in the
*unpacked* bit-plane layout (int8, D=256 for ORB); packing to uint8x32 exists
only at the serialization boundary (map.json compatibility).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, B) uint8 packed descriptors -> (N, 8B) int8 bit-planes (0/1).

    Bit order matches ``np.unpackbits`` (MSB first) so round-trips with
    :func:`pack_bits` and with OpenCV-style packed ORB descriptors.
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(jnp.int8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, D) 0/1 bits -> (N, D//8) uint8 packed (MSB first)."""
    d = bits.shape[-1]
    b = bits.reshape(*bits.shape[:-1], d // 8, 8).astype(jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def hamming_distance_matrix(
    bits_a: jnp.ndarray, bits_b: jnp.ndarray, out_dtype=jnp.int32
) -> jnp.ndarray:
    """All-pairs Hamming distances from unpacked bit-planes.

    bits_a: (N, D) int8 0/1; bits_b: (M, D) int8 0/1 -> (N, M) distances.
    One MXU matmul: d = popA + popB - 2 A B^T.
    """
    a = bits_a.astype(jnp.int8)
    b = bits_b.astype(jnp.int8)
    dot = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    pop_a = jnp.sum(a.astype(jnp.int32), axis=-1)
    pop_b = jnp.sum(b.astype(jnp.int32), axis=-1)
    return (pop_a[:, None] + pop_b[None, :] - 2 * dot).astype(out_dtype)


@jax.jit
def l2_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs L2 distances for float descriptors: (N, D) x (M, D) -> (N, M)."""
    dot = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    na = jnp.sum(a.astype(jnp.float32) ** 2, axis=-1)
    nb = jnp.sum(b.astype(jnp.float32) ** 2, axis=-1)
    d2 = jnp.maximum(na[:, None] + nb[None, :] - 2.0 * dot, 0.0)
    return jnp.sqrt(d2)


def hamming_distance_matrix_packed(packed_a, packed_b) -> jnp.ndarray:
    """Convenience: packed uint8 descriptors -> distance matrix."""
    return hamming_distance_matrix(unpack_bits(packed_a), unpack_bits(packed_b))


def np_pack(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1)


def np_unpack(packed: np.ndarray) -> np.ndarray:
    return np.unpackbits(packed, axis=-1).astype(np.int8)


def descriptor_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dtype-dispatching all-pairs descriptor distance (float32 output).

    Integer inputs are unpacked descriptor BITS -> Hamming (MXU popcount
    matmul); float inputs -> L2.  This mirrors the reference's per-descriptor
    norm dispatch (``FeatureInfo.norm_type``, feature_types.py:152+) without
    threading a static metric through every jitted matcher: jit re-traces on
    dtype, so the dispatch is resolved at compile time.
    """
    if jnp.issubdtype(a.dtype, jnp.floating):
        return l2_distance_matrix(a, b)
    return hamming_distance_matrix(a, b).astype(jnp.float32)
