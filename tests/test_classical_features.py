"""SIFT / RootSIFT host extractors -> FeatureData contract + matching."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pyslam_tpu.features.tracker import feature_tracker_factory


def _textured(rng, h=240, w=320):
    img = rng.uniform(0, 120, (h, w)).astype(np.float32)
    for _ in range(30):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        img[y:y + rng.integers(5, 15), x:x + rng.integers(5, 15)] += \
            rng.uniform(40, 120)
    return np.clip(img, 0, 255)


@pytest.mark.parametrize("preset", ["SIFT", "ROOT_SIFT"])
def test_sift_tracker(preset):
    rng = np.random.default_rng(3)
    tracker = feature_tracker_factory(preset)
    img = _textured(rng)
    f1 = tracker.detectAndCompute(img)
    valid = np.asarray(f1.valid)
    assert valid.sum() > 50
    des = np.asarray(f1.desc)[valid]
    if preset == "ROOT_SIFT":
        # Hellinger-mapped: unit L2 norm by construction
        assert np.allclose(np.linalg.norm(des, axis=1), 1.0, atol=1e-3)
    # shifted image should still match well
    img2 = np.roll(img, 5, axis=1)
    f2 = tracker.detectAndCompute(img2)
    idx1, idx2 = tracker.match(f1, f2)
    assert len(idx1) > 30
    xy1 = np.asarray(f1.xy)[idx1]
    xy2 = np.asarray(f2.xy)[idx2]
    dx = xy2[:, 0] - xy1[:, 0]
    good = np.abs(dx - 5) < 2.0
    assert good.mean() > 0.7, good.mean()
