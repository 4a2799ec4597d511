"""MASt3R-class network: shapes, descriptor matching, factory wirings.

Random weights (tiny config) — what's under test is the architecture's
composition, the confidence-subsampled reciprocal-NN matcher, and the
three integration surfaces (tracker / depth estimator / scene-from-views).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyslam_tpu.models.mast3r import (
    Mast3rConfig, Mast3rModel, reciprocal_nn_matches,
)

TINY = Mast3rConfig(img_hw=(64, 64), patch=16, enc_dim=32, enc_depth=2,
                    enc_heads=2, dec_dim=48, dec_depth=2, dec_heads=2,
                    desc_dim=8)


@pytest.fixture(scope="module")
def model():
    return Mast3rModel(TINY)


def test_mast3r_shapes(model):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    (p1, c1, d1, dc1), (p2, c2, d2, dc2) = model.infer_pair(img, img)
    assert p1.shape == (64, 64, 3) and c1.shape == (64, 64)
    assert d1.shape == (64, 64, 8) and dc1.shape == (64, 64)
    assert np.allclose(np.linalg.norm(d1, axis=-1), 1.0, atol=1e-4)
    assert (c1 >= 1.0).all() and (dc1 >= 1.0).all()


def test_reciprocal_nn_self_identity():
    rng = np.random.default_rng(1)
    d = rng.normal(0, 1, (16, 16, 8)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = rng.uniform(1, 2, (16, 16)).astype(np.float32)
    pix1, pix2, mutual = reciprocal_nn_matches(
        jnp.asarray(d), jnp.asarray(c), jnp.asarray(d), jnp.asarray(c), k=64)
    pix1, pix2, mutual = map(np.asarray, (pix1, pix2, mutual))
    # self-matching: every mutual match maps a pixel to itself
    assert mutual.all()
    assert (pix1 == pix2).all()


def test_mast3r_tracker(model, monkeypatch):
    from pyslam_tpu.features import tracker as tracker_mod

    monkeypatch.setattr(
        "pyslam_tpu.models.mast3r.Mast3rModel",
        lambda checkpoint=None: model)
    t = tracker_mod.feature_tracker_factory("MAST3R")
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    f1 = t.detectAndCompute(img)
    assert np.asarray(f1.valid).any()
    idx1, idx2 = t.match(f1, f1)
    assert len(idx1) > 0 and (idx1 == idx2).mean() > 0.9
    xy1, xy2, s = t.track_pair(img, img)
    assert xy1.shape == xy2.shape and xy1.shape[1] == 2


def test_mast3r_depth_estimator(model, monkeypatch):
    monkeypatch.setattr(
        "pyslam_tpu.models.mast3r.Mast3rModel",
        lambda checkpoint=None: model)
    from pyslam_tpu.depth_estimation.depth_estimator import (
        DepthEstimatorType, depth_estimator_factory)

    est = depth_estimator_factory(DepthEstimatorType.DEPTH_MAST3R)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    depth, pts = est.infer(img)
    assert depth.shape == (48, 64)
    assert np.isfinite(depth).all()


def test_mast3r_scene_from_views(model, monkeypatch):
    monkeypatch.setattr(
        "pyslam_tpu.models.mast3r.Mast3rModel",
        lambda checkpoint=None: model)
    from pyslam_tpu.scene_from_views.scene_from_views import (
        SceneFromViewsType, scene_from_views_factory)

    sv = scene_from_views_factory(SceneFromViewsType.MAST3R,
                                  conf_threshold=0.0)
    rng = np.random.default_rng(4)
    imgs = [rng.uniform(0, 255, (48, 64)).astype(np.float32)
            for _ in range(3)]
    res = sv.reconstruct(imgs)
    assert res.poses.shape == (3, 4, 4)
    assert np.isfinite(res.poses).all()
