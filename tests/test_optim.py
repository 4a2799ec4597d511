import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import lie, optim


K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])


def synth_scene(rng, n_cams=6, n_pts=300, stereo=False):
    pts = np.concatenate(
        [rng.uniform(-4, 4, (n_pts, 2)), rng.uniform(6.0, 14.0, (n_pts, 1))], axis=1
    )
    poses = []
    for i in range(n_cams):
        w = rng.normal(3) * 0.0 + rng.normal(size=3) * 0.03
        t = np.array([0.4 * i, 0.0, 0.0]) + rng.normal(size=3) * 0.05
        poses.append(np.asarray(lie.rt_to_T(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t))))
    poses = np.stack(poses)
    bf = 500.0 * 0.12 if stereo else 0.0

    cam_idx, pt_idx, uvs, urs = [], [], [], []
    for c in range(n_cams):
        pc = (poses[c][:3, :3] @ pts.T).T + poses[c][:3, 3]
        z = pc[:, 2]
        u = 500.0 * pc[:, 0] / z + 320.0
        v = 500.0 * pc[:, 1] / z + 240.0
        for p in range(n_pts):
            if z[p] > 0.1 and 0 < u[p] < 640 and 0 < v[p] < 480:
                cam_idx.append(c)
                pt_idx.append(p)
                uvs.append([u[p], v[p]])
                urs.append(u[p] - bf / z[p] if stereo else -1.0)
    return (
        jnp.asarray(poses),
        jnp.asarray(pts),
        jnp.asarray(cam_idx, jnp.int32),
        jnp.asarray(pt_idx, jnp.int32),
        jnp.asarray(uvs),
        jnp.asarray(urs),
    )


def test_pose_optimization_converges(rng):
    poses, pts, cam_idx, pt_idx, uv, ur = synth_scene(rng, n_cams=1)
    sel = np.asarray(cam_idx) == 0
    p3d = pts[pt_idx[sel]]
    uv0 = uv[sel]
    ur0 = ur[sel]
    n = p3d.shape[0]
    # add noise + 20% outliers in uv
    uv_noisy = np.asarray(uv0) + rng.normal(size=(n, 2)) * 0.5
    out = rng.choice(n, n // 5, replace=False)
    uv_noisy[out] += rng.uniform(20, 60, (len(out), 2))
    # perturb initial pose
    dxi = np.concatenate([rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.02])
    T_init = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ np.asarray(poses[0])

    T_opt, inliers, n_inl = optim.pose_optimization(
        jnp.asarray(T_init), p3d, jnp.asarray(uv_noisy), ur0,
        jnp.ones((n,)), jnp.ones((n,), bool), K,
    )
    assert int(n_inl) > 0.7 * n
    # outliers detected
    assert np.asarray(inliers)[out].mean() < 0.1
    err = np.abs(np.asarray(T_opt) - np.asarray(poses[0])).max()
    assert err < 5e-3, err


def test_pose_optimization_stereo(rng):
    poses, pts, cam_idx, pt_idx, uv, ur = synth_scene(rng, n_cams=1, stereo=True)
    sel = np.asarray(cam_idx) == 0
    p3d = pts[pt_idx[sel]]
    n = p3d.shape[0]
    dxi = np.concatenate([rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.02])
    T_init = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ np.asarray(poses[0])
    T_opt, inliers, n_inl = optim.pose_optimization(
        jnp.asarray(T_init), p3d, uv[sel], ur[sel],
        jnp.ones((n,)), jnp.ones((n,), bool), K, bf=500.0 * 0.12,
    )
    assert int(n_inl) == n
    np.testing.assert_allclose(np.asarray(T_opt), np.asarray(poses[0]), atol=1e-6)


def make_problem(rng, noise_px=1.0, pose_noise=0.02, pt_noise=0.05, stereo=False):
    poses, pts, cam_idx, pt_idx, uv, ur = synth_scene(rng, stereo=stereo)
    O = uv.shape[0]
    uv_noisy = jnp.asarray(np.asarray(uv) + rng.normal(size=(O, 2)) * noise_px)
    # perturb all but first pose; perturb points
    poses_n = np.asarray(poses).copy()
    for c in range(1, poses_n.shape[0]):
        dxi = np.concatenate([rng.normal(size=3) * pose_noise, rng.normal(size=3) * pose_noise * 0.5])
        poses_n[c] = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ poses_n[c]
    pts_n = np.asarray(pts) + rng.normal(size=pts.shape) * pt_noise
    fixed = np.zeros(poses_n.shape[0], bool)
    fixed[0] = True
    problem = optim.BAProblem(
        poses=jnp.asarray(poses_n),
        points=jnp.asarray(pts_n),
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        uv=uv_noisy,
        ur=ur,
        sigma2=jnp.ones((O,)),
        valid=jnp.ones((O,), bool),
        fixed=jnp.asarray(fixed),
        K=K,
        bf=jnp.asarray(500.0 * 0.12 if stereo else 0.0),
    )
    return problem, poses, pts


def test_bundle_adjust_reduces_error(rng):
    problem, poses_gt, pts_gt = make_problem(rng)
    cost0, _, _ = optim.ba_cost_and_chi2(problem, use_robust=False)
    poses_o, pts_o, cost = optim.bundle_adjust(problem, iters=15)
    costf, _, _ = optim.ba_cost_and_chi2(
        problem._replace(poses=poses_o, points=pts_o), use_robust=False
    )
    assert float(costf) < 0.2 * float(cost0)
    # pose error vs ground truth much smaller than the perturbation
    err0 = np.abs(np.asarray(problem.poses) - np.asarray(poses_gt)).max()
    errf = np.abs(np.asarray(poses_o) - np.asarray(poses_gt)).max()
    assert errf < 0.3 * err0


def test_bundle_adjust_stereo_exact(rng):
    problem, poses_gt, pts_gt = make_problem(rng, noise_px=0.0, stereo=True)
    poses_o, pts_o, cost = optim.bundle_adjust(problem, iters=20)
    # with zero measurement noise the solution should approach ground truth
    errf = np.abs(np.asarray(poses_o) - np.asarray(poses_gt)).max()
    assert errf < 1e-3, errf


def test_ba_respects_fixed_cameras(rng):
    problem, poses_gt, _ = make_problem(rng)
    poses_o, _, _ = optim.bundle_adjust(problem, iters=5)
    np.testing.assert_array_equal(np.asarray(poses_o[0]), np.asarray(problem.poses[0]))


def test_optimize_sim3(rng):
    n = 80
    pts1 = np.concatenate([rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 8, (n, 1))], 1)
    s_gt = 1.3
    w = np.array([0.05, -0.1, 0.02])
    t = np.array([0.5, -0.2, 0.3])
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    S12_gt = np.asarray(lie.srt_to_S(jnp.asarray(s_gt), jnp.asarray(R_gt), jnp.asarray(t)))
    # pts2 in cam2 frame: p1 = S12 p2 => p2 = S12^-1 p1
    S21_gt = np.asarray(lie.sim3_inv(jnp.asarray(S12_gt)))
    pts2 = (S21_gt[:3, :3] @ pts1.T).T + S21_gt[:3, 3]
    uv1 = np.stack([500 * pts1[:, 0] / pts1[:, 2] + 320, 500 * pts1[:, 1] / pts1[:, 2] + 240], 1)
    uv2 = np.stack([500 * pts2[:, 0] / pts2[:, 2] + 320, 500 * pts2[:, 1] / pts2[:, 2] + 240], 1)
    # initial guess: perturbed
    dxi = np.concatenate([rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.02, [0.05]])
    S_init = np.asarray(lie.sim3_exp(jnp.asarray(dxi))) @ S12_gt
    S_opt, inl, n_inl = optim.optimize_sim3(
        jnp.asarray(S_init), jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones((n,)), jnp.ones((n,)), jnp.ones((n,), bool), K, K,
    )
    assert int(n_inl) == n
    np.testing.assert_allclose(np.asarray(S_opt), S12_gt, atol=1e-5)


def test_pose_graph_optimize_closes_loop(rng):
    # ring of 12 keyframes with odometry drift; loop edge closes the ring
    V = 12
    S_gt = []
    for i in range(V):
        th = 2 * np.pi * i / V
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, th])))
        t = np.array([np.cos(th) * 3, np.sin(th) * 3, 0.0])
        S_gt.append(np.asarray(lie.srt_to_S(jnp.asarray(1.0), jnp.asarray(R), jnp.asarray(t))))
    S_gt = np.stack(S_gt)

    # odometry measurements between consecutive (exact)
    edges_i, edges_j, S_meas = [], [], []
    for i in range(V - 1):
        edges_i.append(i + 1)
        edges_j.append(i)
        S_meas.append(S_gt[i + 1] @ np.linalg.inv(S_gt[i]) @ np.eye(4))
    # loop edge V-1 -> 0 (exact)
    edges_i.append(0)
    edges_j.append(V - 1)
    S_meas.append(S_gt[0] @ np.linalg.inv(S_gt[V - 1]))
    # note S_meas convention: e = log(S_ij S_j S_i^-1), S_ij = S_i S_j^-1
    S_meas = [S_gt[i] @ np.linalg.inv(S_gt[j]) for i, j in zip(edges_i, edges_j)]

    # drifted initialization: accumulate noisy odometry
    S_init = [S_gt[0]]
    for i in range(1, V):
        dxi = np.concatenate([rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.02, [rng.normal() * 0.02]])
        noise = np.asarray(lie.sim3_exp(jnp.asarray(dxi)))
        S_init.append(noise @ S_gt[i] @ np.linalg.inv(S_gt[i - 1]) @ S_init[i - 1])
    S_init = np.stack(S_init)

    fixed = np.zeros(V, bool)
    fixed[0] = True
    S_opt = optim.pose_graph_optimize(
        jnp.asarray(S_init),
        jnp.asarray(edges_i, jnp.int32),
        jnp.asarray(edges_j, jnp.int32),
        jnp.asarray(np.stack(S_meas)),
        jnp.ones((len(edges_i),), bool),
        jnp.asarray(fixed),
        iters=15,
    )
    err0 = np.abs(S_init - S_gt).max()
    errf = np.abs(np.asarray(S_opt) - S_gt).max()
    assert errf < 0.1 * err0, (err0, errf)
