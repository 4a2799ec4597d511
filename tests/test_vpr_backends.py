"""MegaLoc / AlexNet-conv3 / HDC-DELF global descriptors."""

import numpy as np
import pytest


def _img(seed, shift=0):
    rng = np.random.default_rng(seed)
    im = rng.uniform(0, 200, (120, 160)).astype(np.float32)
    im[40 + shift:80 + shift, 50:110] += 55
    return np.clip(im, 0, 255)


def test_sinkhorn_is_a_transport_plan():
    import jax.numpy as jnp

    from pyslam_tpu.models.megaloc import sinkhorn

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(0, 1, (32, 9)).astype(np.float32))
    plan = np.asarray(sinkhorn(scores, 5))
    assert (plan >= 0).all()
    assert np.allclose(plan.sum(axis=1), 1.0, atol=1e-3)   # rows = tokens


def test_megaloc_descriptor():
    from pyslam_tpu.models.megaloc import MegaLocConfig, MegaLocExtractor

    cfg = MegaLocConfig(img_px=56, patch=14, dim=64, depth=2, heads=4,
                        clusters=8, cluster_dim=16, token_dim=32)
    ex = MegaLocExtractor(cfg)
    d1 = ex(_img(1))
    d1b = ex(_img(1))
    d2 = ex(_img(2))
    assert d1.shape == (ex.dim,) == (32 + 8 * 16,)
    assert np.allclose(np.linalg.norm(d1), 1.0, atol=1e-4)
    assert np.allclose(d1, d1b)
    assert d1 @ d2 < 0.9999   # different images -> different descriptors


def test_alexnet_descriptor():
    from pyslam_tpu.loop_closing.vpr import AlexNetExtractor

    ex = AlexNetExtractor(img_px=128)
    d1, d2 = ex(_img(1)), ex(_img(3))
    assert np.allclose(np.linalg.norm(d1), 1.0, atol=1e-4)
    assert d1.shape == d2.shape
    # similar images score higher than dissimilar ones
    d1s = ex(_img(1, shift=2))
    assert d1 @ d1s > d1 @ d2


def test_hdc_delf_descriptor():
    from pyslam_tpu.loop_closing.vpr import HDCDelfExtractor

    ex = HDCDelfExtractor(hdc_dim=1024, num_features=128)
    d1, d1b, d2 = ex(_img(1)), ex(_img(1)), ex(_img(4))
    assert d1.shape == (1024,)
    assert np.allclose(d1, d1b)
    assert np.allclose(np.linalg.norm(d1), 1.0, atol=1e-4)
    assert d1 @ d2 < 0.9999


def test_loop_detector_dispatch():
    from pyslam_tpu.loop_closing.loop_closing import LoopDetector
    from pyslam_tpu.loop_closing.loop_detector_configs import (
        GlobalDescriptorType, LoopDetectorConfigs)

    cfg = LoopDetectorConfigs.ALEXNET \
        if hasattr(LoopDetectorConfigs, "ALEXNET") else None
    if cfg is None:
        pytest.skip("no ALEXNET preset")
    det = LoopDetector(cfg)
    assert det.score_based
