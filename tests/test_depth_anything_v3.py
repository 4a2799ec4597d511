"""DepthAnythingV3 (any-view depth+ray model): camera recovery from ray
maps, inference contract, scene-from-views / depth-estimator wiring."""

import numpy as np
import pytest


def _rot(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_recover_camera_from_rays():
    from pyslam_tpu.models.depth_anything_v3 import recover_camera_from_rays

    H, W, f = 48, 64, 80.0
    R = _rot([0.2, 1.0, 0.1], 0.4)      # cam->world
    t = np.array([0.5, -0.2, 1.5])
    vs, us = np.mgrid[0:H, 0:W]
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    d_cam = np.stack([(us - cx) / f, (vs - cy) / f, np.ones((H, W))], -1)
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_world = d_cam @ R.T
    origin = np.broadcast_to(t, (H, W, 3))

    Twc, f_est = recover_camera_from_rays(origin, d_world, (H, W))
    assert np.allclose(Twc[:3, 3], t, atol=1e-6)
    assert abs(f_est - f) / f < 0.05
    assert np.allclose(Twc[:3, :3], R, atol=0.02), \
        np.abs(Twc[:3, :3] - R).max()


@pytest.fixture(scope="module")
def small_model():
    from pyslam_tpu.models.depth_anything_v3 import DA3Config, DepthAnything3

    cfg = DA3Config(img_hw=(64, 64), patch=16, dim=64, depth=4, heads=4,
                    taps=(0, 1, 2, 3), features=32)
    return DepthAnything3(cfg)


def test_da3_inference_contract(small_model):
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (80, 100, 3)).astype(np.float32)
            for _ in range(3)]
    out = small_model.inference(imgs)
    assert out["depth"].shape == (3, 64, 64)
    assert out["conf"].shape == (3, 64, 64)
    assert out["points"].shape == (3, 64, 64, 3)
    assert out["poses"].shape == (3, 4, 4)
    assert np.isfinite(out["points"]).all()
    assert (out["depth"] >= 0).all()
    assert ((out["conf"] >= 0) & (out["conf"] <= 1)).all()
    # unit ray directions; points consistent with origin + depth*dir
    n = np.linalg.norm(out["direction"], axis=-1)
    assert np.allclose(n, 1.0, atol=1e-4)
    recon = out["origin"] + out["depth"][..., None] * out["direction"]
    assert np.allclose(recon, out["points"], atol=1e-5)


def test_da3_scene_from_views(small_model, monkeypatch):
    from pyslam_tpu.scene_from_views.scene_from_views import (
        SceneFromViewsDepthAnythingV3, SceneFromViewsType,
        scene_from_views_factory)

    backend = scene_from_views_factory.__wrapped__ \
        if hasattr(scene_from_views_factory, "__wrapped__") else None
    sv = SceneFromViewsDepthAnythingV3.__new__(SceneFromViewsDepthAnythingV3)
    sv.camera = None
    sv.model = small_model
    sv.conf_threshold = -1.0   # keep all pixels (untrained conf ~ 0.5)
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
            for _ in range(2)]
    res = sv.infer(imgs)
    assert res.poses.shape == (2, 4, 4)
    assert res.points.shape[1] == 3
    assert len(res.points) > 0
    assert SceneFromViewsType.DEPTH_ANYTHING_V3.value == "depth_anything_v3"


def test_da3_depth_estimator(small_model):
    from pyslam_tpu.depth_estimation.depth_estimator import (
        DepthEstimatorDepthAnythingV3)

    est = DepthEstimatorDepthAnythingV3.__new__(DepthEstimatorDepthAnythingV3)
    est.camera = None
    est.min_depth = 0.1
    est.max_depth = 50.0
    est.model = small_model
    img = np.random.default_rng(2).uniform(
        0, 255, (120, 160)).astype(np.float32)
    depth, pts = est.infer(img)
    assert depth.shape == (120, 160)
    assert (depth >= 0).all() and (depth <= 50.0).all()
