import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import hamming


def test_pack_unpack_roundtrip(rng):
    packed = rng.integers(0, 256, size=(17, 32), dtype=np.uint8)
    bits = hamming.unpack_bits(jnp.asarray(packed))
    assert bits.shape == (17, 256)
    repacked = hamming.pack_bits(bits)
    np.testing.assert_array_equal(np.asarray(repacked), packed)
    # matches numpy convention
    np.testing.assert_array_equal(np.asarray(bits), hamming.np_unpack(packed))


def test_hamming_matches_numpy(rng):
    a = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    b = rng.integers(0, 256, size=(96, 32), dtype=np.uint8)
    d = np.asarray(hamming.hamming_distance_matrix_packed(jnp.asarray(a), jnp.asarray(b)))
    # reference: popcount of xor
    expected = np.zeros((64, 96), dtype=np.int32)
    for i in range(64):
        x = np.bitwise_xor(a[i][None, :], b)
        expected[i] = np.unpackbits(x, axis=1).sum(axis=1)
    np.testing.assert_array_equal(d, expected)


def test_hamming_identity(rng):
    a = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    d = np.asarray(hamming.hamming_distance_matrix_packed(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(np.diag(d) == 0)
    assert np.all(d >= 0) and np.all(d <= 256)


def test_l2_distance_matrix(rng):
    a = rng.normal(size=(32, 64)).astype(np.float32)
    b = rng.normal(size=(48, 64)).astype(np.float32)
    d = np.asarray(hamming.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    expected = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    # matmul formulation trades a little f32 precision for MXU throughput;
    # descriptor matching only needs ~1e-2 distance resolution
    np.testing.assert_allclose(d, expected, atol=2e-2)
