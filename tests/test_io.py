import os

import numpy as np
import pytest

from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_factory import dataset_factory
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.io.ground_truth import (
    GroundTruth,
    read_kitti_poses,
    read_tum_trajectory,
)
from pyslam_tpu.io.trajectory_writer import TrajectoryWriter
from pyslam_tpu.evaluation.metrics import eval_ate, eval_rpe, umeyama_np

KITTI06_GT = "/root/reference/data/videos/kitti06/06.txt"
KITTI06_TUMGT = "/root/reference/data/videos/kitti06/groundtruth.txt"


def test_synthetic_dataset_renders(rng):
    ds = SyntheticDataset(num_frames=5, sensor_type=SensorType.STEREO)
    img = ds.getImage(0)
    assert img.shape == (240, 320)
    assert img.std() > 10  # textured
    imgr = ds.getImageRight(0)
    assert imgr is not None
    # consecutive frames differ but overlap
    img1 = ds.getImage(1)
    assert np.abs(img - img1).mean() > 0.1


def test_synthetic_dataset_depth():
    ds = SyntheticDataset(num_frames=2, sensor_type=SensorType.RGBD)
    d = ds.getDepth(0)
    assert d.shape == (240, 320)
    assert (d > 0).mean() > 0.1


def test_dataset_factory_synthetic():
    ds = dataset_factory({"type": "synthetic", "num_frames": 3, "sensor_type": "stereo"})
    assert len(ds) == 3
    assert ds.sensor_type == SensorType.STEREO


@pytest.mark.skipif(not os.path.exists(KITTI06_GT), reason="kitti06 gt not present")
def test_read_kitti_gt():
    gt = read_kitti_poses(KITTI06_GT)
    assert len(gt) > 1000
    # kitti 06 is a loop: start and end near each other (<50m), path length >1km
    path = np.linalg.norm(np.diff(gt.positions, axis=0), axis=1).sum()
    assert path > 1000.0
    # poses are valid rotations
    R = gt.Twc[100, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(KITTI06_TUMGT), reason="kitti06 gt not present")
def test_read_tum_style_gt_matches_kitti():
    # the reference ships the same trajectory in both formats; ATE between the
    # two readers' outputs must be ~0
    gt_k = read_kitti_poses(KITTI06_GT)
    gt_t = read_tum_trajectory(KITTI06_TUMGT)  # cols: t x y z qx qy qz qw (+scale)
    n = min(len(gt_k), len(gt_t))
    d = np.linalg.norm(gt_k.positions[:n] - gt_t.positions[:n], axis=1)
    assert np.median(d) < 0.5


def test_trajectory_writer_tum_roundtrip(tmp_path, rng):
    from pyslam_tpu.ops import lie
    import jax.numpy as jnp

    n = 10
    poses = []
    for i in range(n):
        w = rng.normal(size=3) * 0.5
        T = np.eye(4)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(w)))
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    ts = np.arange(n) * 0.1
    f = str(tmp_path / "traj.txt")
    with TrajectoryWriter("tum", f) as tw:
        tw.write_full_trajectory(ts, poses)
    gt = read_tum_trajectory(f)
    assert len(gt) == n
    np.testing.assert_allclose(gt.Twc, np.stack(poses), atol=1e-6)


def test_eval_ate_identity(rng):
    t = np.arange(50) * 0.1
    p = rng.normal(size=(50, 3)).cumsum(0)
    res = eval_ate(t, p, t, p)
    assert res.rmse < 1e-9
    assert res.num_pairs == 50


def test_eval_ate_alignment_invariance(rng):
    # ATE must be invariant to a rigid transform of the estimate
    t = np.arange(80) * 0.1
    p = rng.normal(size=(80, 3)).cumsum(0)
    s, R, tt = 1.0, None, np.array([5.0, -3.0, 2.0])
    import jax.numpy as jnp
    from pyslam_tpu.ops import lie

    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, 0.2, -0.4])))
    p2 = p @ R.T + tt
    noise = rng.normal(size=p.shape) * 0.01
    res = eval_ate(t, p2 + noise, t, p)
    assert res.rmse < 0.05


def test_eval_ate_scale(rng):
    t = np.arange(50) * 0.1
    p = rng.normal(size=(50, 3)).cumsum(0)
    res = eval_ate(t, 2.5 * p, t, p, with_scale=True)
    assert res.rmse < 1e-9
    assert abs(res.scale - 0.4) < 1e-9


def test_eval_rpe_zero():
    poses = np.tile(np.eye(4), (20, 1, 1))
    for i in range(20):
        poses[i, :3, 3] = [i * 0.1, 0, 0]
    tr, ro = eval_rpe(poses, poses)
    assert tr < 1e-12 and ro < 1e-6


def _random_twc(rng, n):
    from pyslam_tpu.io.ground_truth import _quat_to_R

    T = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        T[i, :3, :3] = _quat_to_R(q)
        T[i, :3, 3] = rng.normal(size=3) * 5
    return T


def test_gt_reader_family_roundtrip(tmp_path, rng):
    """Replica / TartanAir / ScanNet / 7-Scenes / Neural-RGBD / ICL-NUIM
    readers (reference ground_truth.py readers) against on-disk fixtures."""
    from pyslam_tpu.io.ground_truth import groundtruth_factory

    n = 6
    T = _random_twc(rng, n)

    # Replica: flattened 4x4 per line
    rp = tmp_path / "traj.txt"
    np.savetxt(rp, T.reshape(n, 16))
    gt = groundtruth_factory({"type": "replica", "path": str(rp), "fps": 30.0})
    assert np.allclose(gt.Twc, T, atol=1e-6)
    assert np.isclose(gt.timestamps[1] - gt.timestamps[0], 1 / 30.0)

    # TartanAir: x y z qx qy qz qw rows
    from pyslam_tpu.io.ground_truth import _R_to_quat

    ta = tmp_path / "pose_left.txt"
    rows = np.concatenate(
        [T[:, :3, 3], np.stack([_R_to_quat(T[i, :3, :3]) for i in range(n)])],
        axis=1,
    )
    np.savetxt(ta, rows)
    gt = groundtruth_factory({"type": "tartanair", "path": str(ta)})
    assert np.allclose(np.abs(gt.Twc[:, :3, 3]), np.abs(T[:, :3, 3]), atol=1e-6)
    for i in range(n):
        assert np.allclose(gt.Twc[i, :3, :3], T[i, :3, :3], atol=1e-5)

    # ScanNet: pose/<n>.txt with one -inf dropout pose
    sd = tmp_path / "pose"
    sd.mkdir()
    for i in range(n):
        np.savetxt(sd / f"{i}.txt", T[i])
    np.savetxt(sd / f"{n}.txt", np.full((4, 4), -np.inf))
    gt = groundtruth_factory({"type": "scannet", "path": str(sd)})
    assert len(gt) == n and np.allclose(gt.Twc, T, atol=1e-6)

    # 7-Scenes: seq-01/frame-XXXXXX.pose.txt
    sq = tmp_path / "seq-01"
    sq.mkdir()
    for i in range(n):
        np.savetxt(sq / f"frame-{i:06d}.pose.txt", T[i])
    gt = groundtruth_factory({"type": "seven_scenes", "path": str(tmp_path)})
    assert np.allclose(gt.Twc, T, atol=1e-6)

    # Neural-RGBD: stacked 4x4 blocks, one NaN block dropped
    nr = tmp_path / "poses.txt"
    blocks = np.concatenate([T.reshape(-1, 4), np.full((4, 4), np.nan)])
    np.savetxt(nr, blocks)
    gt = groundtruth_factory({"type": "neural_rgbd", "path": str(nr)})
    assert len(gt) == n and np.allclose(gt.Twc, T, atol=1e-6)

    # ICL-NUIM: TUM rows with y inverted on read
    ic = tmp_path / "gt.freiburg"
    with open(ic, "w") as f:
        for i in range(n):
            q = _R_to_quat(T[i, :3, :3])
            x, y, z = T[i, :3, 3]
            f.write(f"{i * 0.1} {x} {y} {z} {q[0]} {q[1]} {q[2]} {q[3]}\n")
    gt = groundtruth_factory({"type": "icl_nuim", "path": str(ic)})
    assert np.allclose(gt.Twc[:, 1, 3], -T[:, 1, 3], atol=1e-6)
    assert np.allclose(gt.Twc[:, 0, 3], T[:, 0, 3], atol=1e-6)


def test_evaluation_grid_configs_parse():
    """The shipped KITTI/TUM/EuRoC evaluation grids (mirroring the
    reference's evaluation_*.json) parse into runnable EvalConfigs with
    resolvable tracker presets."""
    import os

    from pyslam_tpu.evaluation.manager import EvalConfig

    base = os.path.join(
        os.path.dirname(__file__), "..", "pyslam_tpu", "evaluation", "configs"
    )
    expected = {"kitti": 11, "tum": 5, "euroc": 6}
    for name, n_datasets in expected.items():
        cfg = EvalConfig.from_json(
            os.path.join(base, f"evaluation_{name}.json")
        )
        assert len(cfg.datasets) == n_datasets
        assert "baseline" in cfg.presets
        assert cfg.runs_per_dataset == 5
        for ds in cfg.datasets:
            assert "groundtruth" in ds and "sensor_type" in ds
        for preset in cfg.presets.values():
            assert preset.num_features > 0
