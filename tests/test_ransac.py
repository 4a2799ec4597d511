import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import epipolar, lie, pnp, procrustes

from tests.test_geometry import make_scene


def corrupt(rng, xy, frac):
    """Replace a fraction of correspondences with gross outliers."""
    n = xy.shape[0]
    n_out = int(n * frac)
    idx = rng.choice(n, n_out, replace=False)
    xy = np.asarray(xy).copy()
    xy[idx] += rng.uniform(0.2, 0.6, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return jnp.asarray(xy), idx


def test_find_essential_and_recover_pose(rng):
    pts, T21 = make_scene(rng, 300)
    xy1 = pts[:, :2] / pts[:, 2:3]
    pc2 = lie.transform_points(T21, pts)
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    xy2n, out_idx = corrupt(rng, xy2, 0.3)
    valid = jnp.ones((300,), bool)
    key = jax.random.PRNGKey(0)
    E, mask, n_inl = epipolar.find_essential(key, xy1, xy2n, valid, threshold2(1.0), 512)
    mask = np.asarray(mask)
    assert int(n_inl) > 180
    assert mask[out_idx].mean() < 0.1

    T_est, _ = epipolar.recover_pose(E, xy1, xy2n, jnp.asarray(mask))
    R_est, t_est = np.asarray(T_est[:3, :3]), np.asarray(T_est[:3, 3])
    R_gt, t_gt = np.asarray(T21[:3, :3]), np.asarray(T21[:3, 3])
    np.testing.assert_allclose(R_est, R_gt, atol=5e-3)
    t_dir = t_est / np.linalg.norm(t_est)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert abs(float(t_dir @ t_gt_dir)) > 0.999


def threshold2(px, f=500.0):
    return (px / f) ** 2


def test_find_homography_planar(rng):
    # planar scene: all points at z = 5 plane -> homography relates the views
    n = 150
    pts = np.concatenate([rng.uniform(-2, 2, (n, 2)), np.full((n, 1), 5.0)], axis=1)
    w = np.array([0.05, -0.02, 0.03])
    t = np.array([0.4, 0.2, -0.1])
    T21 = np.asarray(lie.rt_to_T(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t)))
    pts = jnp.asarray(pts)
    xy1 = pts[:, :2] / pts[:, 2:3]
    pc2 = lie.transform_points(jnp.asarray(T21), pts)
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    xy2n, out_idx = corrupt(rng, xy2, 0.2)
    H, mask, count = epipolar.find_homography(
        jax.random.PRNGKey(1), xy1, xy2n, jnp.ones((n,), bool), threshold2(1.0), 256
    )
    assert int(count) > 100
    assert np.asarray(mask)[out_idx].mean() < 0.1


def test_pnp_ransac(rng):
    pts, T21 = make_scene(rng, 200)
    pc2 = lie.transform_points(T21, pts)
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    xy2n, out_idx = corrupt(rng, xy2, 0.3)
    T_est, mask, n_inl = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(2), pts, xy2n, jnp.ones((200,), bool), threshold2(2.0), 256
    )
    assert int(n_inl) > 120
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T21), atol=1e-2)


def test_umeyama_exact(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)))
    s_gt, w, t = 1.7, np.array([0.3, -0.2, 0.5]), np.array([1.0, -2.0, 0.5])
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    dst = jnp.asarray(s_gt * (np.asarray(src) @ R_gt.T) + t)
    s, R, tt = procrustes.umeyama(src, dst)
    assert abs(float(s) - s_gt) < 1e-9
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tt), t, atol=1e-9)


def test_umeyama_rigid(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)))
    w, t = np.array([0.3, -0.2, 0.5]), np.array([1.0, -2.0, 0.5])
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    dst = jnp.asarray(np.asarray(src) @ R_gt.T + t)
    s, R, tt = procrustes.umeyama(src, dst, with_scale=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-9)


def test_sim3_ransac(rng):
    n = 100
    pts1 = jnp.asarray(rng.normal(size=(n, 3)) * 3.0)
    s_gt, w, t = 0.8, np.array([0.1, 0.4, -0.3]), np.array([2.0, 0.0, -1.0])
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    pts2 = np.asarray(pts1) * 0.0
    pts2 = s_gt * (np.asarray(pts1) @ R_gt.T) + t
    out_idx = rng.choice(n, 30, replace=False)
    pts2[out_idx] += rng.uniform(1.0, 3.0, (30, 3))
    S, mask, count = procrustes.sim3_ransac(
        jax.random.PRNGKey(3), pts1, jnp.asarray(pts2), jnp.ones((n,), bool), 0.01, 256
    )
    assert int(count) >= 65
    s, R, tt = lie.S_to_srt(S)
    assert abs(float(s) - s_gt) < 1e-6
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-6)
