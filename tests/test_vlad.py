"""VLAD + SAD global descriptors and the score-based candidate path."""

import numpy as np
import pytest

from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType


def _frame_desc(rng, n=300, flip=0):
    """Random binary descriptors; ``flip`` bits of noise per descriptor makes
    a 'revisit' of the same place."""
    d = rng.integers(0, 2, (n, 256)).astype(np.int8)
    if flip:
        idx = rng.integers(0, 256, (n, flip))
        for i in range(n):
            d[i, idx[i]] ^= 1
    return d


def test_vlad_discriminates_revisit(rng):
    from pyslam_tpu.loop_closing.vlad import VladVocabulary

    voc = VladVocabulary(num_clusters=32, train_after=1)
    # vocabulary must come from a corpus, not the query image itself: kmeans
    # makes per-cluster residual sums vanish over the training set, so a
    # VLAD of its own training image is numerically degenerate
    corpus = _frame_desc(rng, n=3000)
    voc.maybe_train(corpus.astype(np.float32))
    assert voc.trained
    base = _frame_desc(rng)
    valid = np.ones((len(base),), bool)

    v_base = voc.global_descriptor(base, valid)
    # revisit: same descriptors with a little bit noise
    noisy = base.copy()
    noisy[rng.uniform(size=base.shape) < 0.02] ^= 1
    v_revisit = voc.global_descriptor(noisy, valid)
    # different place: fresh random descriptors
    v_other = voc.global_descriptor(_frame_desc(rng), valid)

    s_revisit = float(v_base @ v_revisit)
    s_other = float(v_base @ v_other)
    assert s_revisit > 0.5, s_revisit
    assert s_revisit > s_other + 0.3, (s_revisit, s_other)
    np.testing.assert_allclose(np.linalg.norm(v_base), 1.0, atol=1e-5)


def test_sad_descriptor_revisit(rng):
    import jax.numpy as jnp

    from pyslam_tpu.loop_closing.vlad import sad_descriptor

    ds = SyntheticDataset(
        num_frames=40, sensor_type=SensorType.MONOCULAR,
        trajectory="loop", period=36,
    )
    # frame 36 revisits frame 0's pose exactly
    v0 = np.asarray(sad_descriptor(jnp.asarray(ds.getImage(0))))
    v_re = np.asarray(sad_descriptor(jnp.asarray(ds.getImage(36))))
    v_far = np.asarray(sad_descriptor(jnp.asarray(ds.getImage(18))))
    assert v0 @ v_re > 0.98
    assert v0 @ v_re > v0 @ v_far + 0.2


def test_score_based_database_candidates(rng):
    from pyslam_tpu.loop_closing.keyframe_database import KeyFrameDatabase

    db = KeyFrameDatabase(num_words=0)
    vecs = {}
    for kid in range(8):
        v = rng.normal(size=64)
        v /= np.linalg.norm(v)
        vecs[kid] = v
        db.add(kid, None, v)

    # query near keyframe 3, excluding its "covisible" neighbors 2 and 4
    q = vecs[3] + rng.normal(size=64) * 0.05
    q /= np.linalg.norm(q)
    out = db.detect_loop_candidates(
        kid=100, words=None, g_des=q, connected={2, 4},
        covisibles_of=lambda k: [],
    )
    assert 3 in out
    # relocalization candidates rank kf 3 first
    rel = db.detect_relocalization_candidates(None, q, max_out=3)
    assert rel[0] == 3


@pytest.mark.slow
def test_vlad_loop_closure_e2e(rng):
    """Full RGBD SLAM on the circular synthetic world with the VLAD detector:
    the loop must close (same scenario as test_loop_e2e, different place
    recognition engine)."""
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    ds = SyntheticDataset(
        num_frames=175, sensor_type=SensorType.RGBD, trajectory="loop", period=160
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * 0.2, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=800, num_levels=4)
    slam = Slam(cam, cfg, loop_detector_config="VLAD",
                sensor_type=SensorType.RGBD)
    assert slam.loop_closing is not None
    assert slam.loop_closing.detector.score_based

    for i in range(len(ds)):
        slam.track(ds.getImage(i), depth=ds.getDepth(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))

    assert slam.loop_closing.num_loops_closed >= 1, "VLAD loop not closed"
