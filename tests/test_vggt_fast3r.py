"""VGGT / Fast3R multi-view architectures: shapes, gauge fixing, factory
wiring, robust-view rejection plumbing (tiny configs, random weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyslam_tpu.models.vggt import VGGTConfig, VGGTModel
from pyslam_tpu.models.fast3r import Fast3RConfig, Fast3RModel

TINY_VGGT = VGGTConfig(img_hw=(32, 32), patch=16, dim=32, depth_pairs=2,
                       heads=2)
TINY_F3R = Fast3RConfig(img_hw=(32, 32), patch=16, enc_dim=32, enc_depth=2,
                        enc_heads=2, dec_dim=32, dec_depth=2, dec_heads=2,
                        max_views=8)


@pytest.fixture(scope="module")
def vggt():
    return VGGTModel(TINY_VGGT)


@pytest.fixture(scope="module")
def fast3r():
    return Fast3RModel(TINY_F3R)


def _imgs(rng, v=3, hw=(32, 32)):
    return [rng.uniform(0, 255, hw).astype(np.float32) for _ in range(v)]


def test_vggt_shapes_and_gauge(vggt):
    rng = np.random.default_rng(0)
    out = vggt.infer_views(_imgs(rng))
    assert out["points"].shape == (3, 32, 32, 3)
    assert out["conf"].shape == (3, 32, 32)
    assert out["poses"].shape == (3, 4, 4)
    assert np.allclose(out["poses"][0], np.eye(4), atol=1e-5)  # gauge-fixed
    assert out["anchor_mass"].shape == (3,)
    assert np.isfinite(out["points"]).all()
    # rotation blocks orthonormal
    R = out["poses"][1][:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_fast3r_shapes(fast3r):
    rng = np.random.default_rng(1)
    out = fast3r.infer_views(_imgs(rng, v=4))
    assert out["points"].shape == (4, 32, 32, 3)
    assert out["local_points"].shape == (4, 32, 32, 3)
    assert np.isfinite(out["points"]).all()


def test_vggt_factory(vggt, monkeypatch):
    monkeypatch.setattr("pyslam_tpu.models.vggt.VGGTModel",
                        lambda checkpoint=None: vggt)
    from pyslam_tpu.scene_from_views.scene_from_views import (
        SceneFromViewsType, scene_from_views_factory)

    rng = np.random.default_rng(2)
    for stype in (SceneFromViewsType.VGGT, SceneFromViewsType.VGGT_ROBUST):
        sv = scene_from_views_factory(stype, conf_threshold=0.0)
        res = sv.reconstruct(_imgs(rng, v=4))
        assert res.poses.shape == (4, 4, 4)
        assert np.isfinite(res.poses).all()
        assert len(res.points) > 0


def test_fast3r_factory(fast3r, monkeypatch):
    monkeypatch.setattr("pyslam_tpu.models.fast3r.Fast3RModel",
                        lambda checkpoint=None: fast3r)
    from pyslam_tpu.scene_from_views.scene_from_views import (
        SceneFromViewsType, scene_from_views_factory)

    rng = np.random.default_rng(3)
    sv = scene_from_views_factory(SceneFromViewsType.FAST3R,
                                  conf_threshold=0.0)
    res = sv.reconstruct(_imgs(rng, v=3))
    assert res.poses.shape == (3, 4, 4)
    assert np.isfinite(res.poses).all()
