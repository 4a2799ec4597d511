"""MV-DUSt3R multi-view network: contract, pose recovery, wiring."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    from pyslam_tpu.models.mvdust3r import MVDust3rConfig, MVDust3rModel

    cfg = MVDust3rConfig(img_hw=(64, 64), patch=16, enc_dim=48, enc_depth=2,
                         enc_heads=4, dec_dim=48, dec_depth=2, dec_heads=4)
    return MVDust3rModel(cfg)


def test_mvdust3r_contract(model):
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (80, 96, 3)).astype(np.float32)
            for _ in range(3)]
    out = model.infer_views(imgs)
    assert out["points"].shape == (3, 64, 64, 3)
    assert out["conf"].shape == (3, 64, 64)
    assert out["local_points"].shape == (3, 64, 64, 3)
    assert out["poses"].shape == (3, 4, 4)
    assert out["ref_index"] == 0
    assert np.isfinite(out["points"]).all()
    assert (out["conf"] >= 1.0).all()     # 1 + exp(.) parameterization


def test_mvdust3r_single_view(model):
    rng = np.random.default_rng(1)
    out = model.infer_views([rng.uniform(0, 255, (64, 64))])
    assert out["points"].shape == (1, 64, 64, 3)


def test_mvdust3r_scene_from_views(model):
    from pyslam_tpu.scene_from_views.scene_from_views import (
        SceneFromViewsMVDust3r)

    sv = SceneFromViewsMVDust3r.__new__(SceneFromViewsMVDust3r)
    sv.camera = None
    sv.model = model
    sv.conf_threshold = 0.0   # keep all (untrained conf >= 1)
    rng = np.random.default_rng(2)
    res = sv.infer([rng.uniform(0, 255, (64, 64, 3)) for _ in range(2)])
    assert res.poses.shape == (2, 4, 4)
    assert len(res.points) > 0


def test_mvdust3r_depth_estimator(model):
    from pyslam_tpu.depth_estimation.depth_estimator import (
        DepthEstimatorMVDust3r)

    est = DepthEstimatorMVDust3r.__new__(DepthEstimatorMVDust3r)
    est.camera = None
    est.min_depth = 0.1
    est.max_depth = 50.0
    est.model = model
    rng = np.random.default_rng(3)
    depth, _ = est.infer(rng.uniform(0, 255, (100, 120)))
    assert depth.shape == (100, 120)
    assert (depth >= 0).all() and (depth <= 50).all()
