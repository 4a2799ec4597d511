"""TPU-native classical features: BRISK / FREAK / BEBLID / SURF."""

import numpy as np
import pytest


def _scene(seed=0, shift=(0, 0)):
    """Textured synthetic image with stable corners."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 60, (240, 320)).astype(np.float32)
    for (y, x, s, v) in ((40, 50, 18, 180), (120, 200, 24, 140),
                         (180, 90, 14, 200), (70, 260, 20, 160)):
        img[y + shift[0]:y + s + shift[0],
            x + shift[1]:x + s + shift[1]] += v
    return np.clip(img, 0, 255)


def test_brisk_freak_patterns():
    from pyslam_tpu.features.binary_descriptors import (brisk_pattern,
                                                        freak_pattern)

    pts, short, long_pairs = brisk_pattern()
    assert pts.shape == (60, 3)
    assert short.shape == (512, 2)
    assert len(long_pairs) > 50
    pts, pairs, ori = freak_pattern()
    assert pts.shape == (43, 3)
    assert pairs.shape == (512, 2)
    assert ori.shape == (45, 2)


@pytest.mark.parametrize("kind", ["BRISK", "FREAK", "BEBLID"])
def test_binary_descriptor_matching(kind):
    """Same physical point in a shifted image matches better than a
    different point."""
    from pyslam_tpu.features.binary_descriptors import (
        BeblidDescriptor, PatternBinaryDescriptor)

    desc = (BeblidDescriptor() if kind == "BEBLID"
            else PatternBinaryDescriptor(kind))
    img1 = _scene(0)
    img2 = np.roll(img1, 3, axis=1)         # truly shifted image
    kps1 = np.array([[50.0, 40.0], [200.0, 120.0], [90.0, 180.0]])
    kps2 = kps1 + np.array([3.0, 0.0])      # tracked positions
    sizes = np.full(3, 31.0)
    d1 = desc.compute(img1, kps1, sizes)
    d2 = desc.compute(img2, kps2, sizes)
    assert d1.shape == (3, 512) and d1.dtype == np.int8
    ham = (d1[:, None, :] != d2[None, :, :]).sum(-1)     # (3, 3)
    # the diagonal (true correspondences) must win its row
    assert (ham.argmin(axis=1) == np.arange(3)).all(), ham


def test_binary_tracker_presets():
    from pyslam_tpu.features.tracker import feature_tracker_factory

    img = _scene(1)
    for preset in ("BRISK", "ORB2_FREAK", "ORB2_BEBLID"):
        tracker = feature_tracker_factory(preset)
        fd = tracker.detectAndCompute(img)
        assert np.asarray(fd.valid).any(), preset
        assert np.asarray(fd.desc).shape[1] == 512
        idx1, idx2 = tracker.match(fd, fd)
        if len(idx1):
            assert (idx1 == idx2).mean() > 0.9, preset


def test_surf_detector_on_corners():
    from pyslam_tpu.features.surf import SurfExtractor

    ext = SurfExtractor(num_features=200)
    fd = ext(_scene(2))
    xy = np.asarray(fd.xy)[np.asarray(fd.valid)]
    assert len(xy) > 10
    # blob corners (e.g. (50, 40) block) should attract keypoints
    d = np.linalg.norm(xy - np.array([50.0, 40.0]), axis=1).min()
    assert d < 12.0, d


def test_surf_descriptor_shift_matching():
    from pyslam_tpu.features.surf import SurfExtractor

    ext = SurfExtractor(num_features=100)
    f1 = ext(_scene(3))
    f2 = ext(_scene(3, shift=(0, 4)))
    d1 = np.asarray(f1.desc)[np.asarray(f1.valid)]
    d2 = np.asarray(f2.desc)[np.asarray(f2.valid)]
    x1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    x2 = np.asarray(f2.xy)[np.asarray(f2.valid)]
    sim = d1 @ d2.T
    j = sim.argmax(axis=1)
    # for strong keypoints, the best descriptor match should lie near the
    # 4px-shifted location of the query
    err = np.linalg.norm(x2[j] - (x1 + np.array([4.0, 0.0])), axis=1)
    assert np.median(err) < 20.0, np.median(err)


def test_surf_tracker_preset():
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("SURF")
    fd = tracker.detectAndCompute(_scene(4))
    assert np.asarray(fd.desc).shape[1] == 64
    idx1, idx2 = tracker.match(fd, fd)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9
