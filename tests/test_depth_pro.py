"""DepthPro multi-scale ViT: patch split/stitch, contract, focal scaling."""

import numpy as np
import pytest


def test_patch_positions_cover():
    from pyslam_tpu.models.depth_pro import _patch_positions

    for S, P in ((1536, 384), (768, 384), (384, 384), (128, 32), (64, 32)):
        pos = _patch_positions(S, P, 0.25)
        assert pos[0] == 0 and pos[-1] == S - P or S == P
        covered = np.zeros(S, bool)
        for p in pos:
            covered[p:p + P] = True
        assert covered.all(), (S, P, pos)


@pytest.fixture(scope="module")
def model():
    from pyslam_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig(img_px=128, patch_px=32, vit_patch=16,
                         dim=48, depth=2, heads=4, features=32)
    return DepthPro(cfg)


def test_depth_pro_contract(model):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (96, 140, 3)).astype(np.float32)
    depth, f_px = model.infer(img)
    assert depth.shape == (96, 140)
    assert np.isfinite(depth).all() and (depth > 0).all()
    assert f_px > 0
    # FOV head output is in the declared range
    fov = 2 * np.degrees(np.arctan(0.5 * 140 / f_px))
    assert 25.0 <= fov <= 95.0


def test_depth_pro_focal_scaling(model):
    """Metric depth scales linearly with the supplied focal length."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (128, 128, 3)).astype(np.float32)
    d1, _ = model.infer(img, f_px=100.0)
    d2, _ = model.infer(img, f_px=200.0)
    assert np.allclose(d2, 2.0 * d1, rtol=1e-4)


def test_depth_pro_estimator_factory():
    from pyslam_tpu.depth_estimation.depth_estimator import (
        DepthEstimatorDepthPro, DepthEstimatorType, depth_estimator_factory)
    from pyslam_tpu.models.depth_pro import DepthProConfig

    cfg = DepthProConfig(img_px=128, patch_px=32, vit_patch=16,
                         dim=48, depth=2, heads=4, features=32)
    est = depth_estimator_factory(DepthEstimatorType.DEPTH_PRO, cfg=cfg)
    assert isinstance(est, DepthEstimatorDepthPro)
    img = np.random.default_rng(2).uniform(0, 255, (100, 120)).astype(
        np.float32)
    depth, pts = est.infer(img)
    assert depth.shape == (100, 120)
    assert (depth >= 0).all() and (depth <= est.max_depth).all()
