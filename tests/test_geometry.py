import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import geometry, lie


def make_scene(rng, n=200):
    """Random 3D points in front of two cameras with a known relative pose."""
    pts = np.concatenate(
        [rng.uniform(-2, 2, (n, 2)), rng.uniform(4.0, 10.0, (n, 1))], axis=1
    )
    w = np.array([0.02, -0.03, 0.01])
    t = np.array([0.3, -0.1, 0.05])
    T21 = np.asarray(lie.rt_to_T(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t)))
    return jnp.asarray(pts), jnp.asarray(T21)


def test_project_backproject_roundtrip(rng):
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts, _ = make_scene(rng)
    T = jnp.eye(4)
    uv, z = geometry.project_points(T, pts, K)
    back = geometry.backproject(uv, z, K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-8)


def test_distort_undistort_roundtrip(rng):
    dist = jnp.asarray([-0.28, 0.07, 1e-4, -2e-4, 0.0])
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, (100, 2)))
    xyd = geometry.distort_radtan(xy, dist)
    xyu = geometry.undistort_radtan(xyd, dist)
    np.testing.assert_allclose(np.asarray(xyu), np.asarray(xy), atol=1e-6)


def test_triangulate_dlt(rng):
    pts, T21 = make_scene(rng)
    T1 = jnp.eye(4)
    xy1 = pts[:, :2] / pts[:, 2:3]
    pc2 = lie.transform_points(T21, pts)
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    tri = geometry.triangulate_dlt(T1, T21, xy1, xy2)
    np.testing.assert_allclose(np.asarray(tri), np.asarray(pts), atol=1e-6)


def test_triangulation_checks(rng):
    pts, T21 = make_scene(rng, 50)
    T1 = jnp.eye(4)
    xy1 = pts[:, :2] / pts[:, 2:3]
    pc2 = lie.transform_points(T21, pts)
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    sig = jnp.ones((50,)) * (1.0 / 500.0) ** 2  # ~1px at f=500
    ok = geometry.triangulation_checks(pts, T1, T21, xy1, xy2, sig, sig)
    assert np.asarray(ok).mean() > 0.9
    # a point behind the cameras must fail
    bad = pts.at[0, 2].set(-5.0)
    ok2 = geometry.triangulation_checks(bad, T1, T21, xy1, xy2, sig, sig)
    assert not bool(ok2[0])
