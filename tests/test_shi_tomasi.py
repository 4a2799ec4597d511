"""Shi-Tomasi min-eigenvalue detector + LK/HardNet preset wiring."""

import numpy as np


def _scene():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 40, (200, 260)).astype(np.float32)
    img[50:120, 70:180] += 150
    return np.clip(img, 0, 255)


def test_shi_tomasi_corners():
    from pyslam_tpu.features.classical import ShiTomasiExtractor

    ext = ShiTomasiExtractor(num_features=200)
    fd = ext(_scene())
    v = np.asarray(fd.valid)
    assert v.sum() > 20
    xy = np.asarray(fd.xy)[v]
    resp = np.asarray(fd.response)[v]
    # block corners must rank among the strongest responses
    corners = np.array([[70, 50], [180, 50], [70, 120], [180, 120]], float)
    strong = xy[np.argsort(-resp)[:40]]
    d = np.linalg.norm(strong[:, None] - corners[None], axis=2).min(0)
    assert (d < 6.0).sum() >= 3, d


def test_shi_tomasi_presets():
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("SHI_TOMASI_HARDNET")
    fd = tracker.detectAndCompute(_scene())
    assert np.asarray(fd.valid).any()
    assert np.asarray(fd.desc).shape[1] == 128

    lk = feature_tracker_factory("LK_SHI_TOMASI")
    img = _scene()
    f0 = lk.detectAndCompute(img)
    pts0 = np.asarray(f0.xy)[np.asarray(f0.valid)][:50]
    pts1, ok, _ = lk.track_lk(img, np.roll(img, 3, axis=1), pts0)
    moved = pts1[ok] - pts0[ok]
    assert ok.sum() > 10
    assert abs(np.median(moved[:, 0]) - 3.0) < 1.0
    assert abs(np.median(moved[:, 1])) < 1.0
