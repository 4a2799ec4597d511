import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.ops import lie


def random_se3(rng, n=None):
    shape = (n, 6) if n else (6,)
    xi = rng.normal(size=shape)
    # keep rotation angles strictly below pi so log returns the same twist
    w = xi[..., 3:]
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    xi[..., 3:] = w / np.maximum(norm, 1e-9) * np.minimum(norm, 3.0)
    return jnp.asarray(xi)


def test_so3_exp_log_roundtrip(rng):
    # keep |w| < pi so log returns the same representative
    w = rng.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(1e-3, 3.0, (64, 1))
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    # orthonormal, det 1
    RtR = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (64, 1, 1)), atol=1e-8)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-8)
    w2 = jax.vmap(lie.so3_log)(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-6)


def test_so3_small_angle(rng):
    w = rng.normal(size=(16, 3)) * 1e-8
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    w2 = jax.vmap(lie.so3_log)(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-12)


def test_so3_near_pi():
    axis = np.array([1.0, -2.0, 0.5])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-7]:
        w = axis * theta
        R = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(R))
        # log may return the antipodal representation; compare rotations
        R2 = lie.so3_exp(jnp.asarray(w2))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = random_se3(rng, 64)
    T = jax.vmap(lie.se3_exp)(xi)
    xi2 = jax.vmap(lie.se3_log)(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)


def test_se3_inv(rng):
    xi = random_se3(rng, 8)
    T = jax.vmap(lie.se3_exp)(xi)
    TT = jnp.einsum("nij,njk->nik", T, jax.vmap(lie.se3_inv)(T))
    np.testing.assert_allclose(TT, np.tile(np.eye(4), (8, 1, 1)), atol=1e-8)


def test_transform_points(rng):
    xi = random_se3(rng, 1)[0]
    T = lie.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(10, 3)))
    out = lie.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-8)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 7))
    xi[:, 3:6] *= 0.9
    xi[:, 6] *= 0.3
    S = jax.vmap(lie.sim3_exp)(jnp.asarray(xi))
    s, R, t = lie.S_to_srt(S)
    np.testing.assert_allclose(np.asarray(s), np.exp(xi[:, 6]), atol=1e-8)
    xi2 = jax.vmap(lie.sim3_log)(S)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-5)


def test_sim3_reduces_to_se3(rng):
    xi6 = random_se3(rng, 16)
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=1)
    S = jax.vmap(lie.sim3_exp)(xi7)
    T = jax.vmap(lie.se3_exp)(xi6)
    np.testing.assert_allclose(np.asarray(S), np.asarray(T), atol=1e-6)


def test_sim3_inv(rng):
    xi = rng.normal(size=(8, 7))
    xi[:, 3:6] *= 0.9
    S = jax.vmap(lie.sim3_exp)(jnp.asarray(xi))
    SS = jnp.einsum("nij,njk->nik", S, jax.vmap(lie.sim3_inv)(S))
    np.testing.assert_allclose(SS, np.tile(np.eye(4), (8, 1, 1)), atol=1e-7)


def test_quat_roundtrip(rng):
    w = rng.normal(size=(128, 3)) * 2.0
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    q = jax.vmap(lie.R_to_quat)(R)
    R2 = jax.vmap(lie.quat_to_R)(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-7)


def test_project_to_SO3(rng):
    w = rng.normal(size=(8, 3))
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    noisy = R + 1e-3 * jnp.asarray(rng.normal(size=(8, 3, 3)))
    P = jax.vmap(lie.project_to_SO3)(noisy)
    RtR = jnp.einsum("nij,nik->njk", P, P)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (8, 1, 1)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(P), np.asarray(R), atol=5e-3)
