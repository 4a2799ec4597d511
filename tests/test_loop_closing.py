import numpy as np
import pytest

from pyslam_tpu.loop_closing.keyframe_database import KeyFrameDatabase
from pyslam_tpu.loop_closing.vocabulary import BinaryVocabulary
from tests.test_features import synth_image


def test_vocabulary_quantize_deterministic(rng):
    from pyslam_tpu.features.orb2 import ORB2Extractor

    img = synth_image(rng)
    ext = ORB2Extractor(num_features=300, num_levels=3)
    f = ext(img)
    voc = BinaryVocabulary(num_words=512)
    w1 = voc.words_for(np.asarray(f.desc), np.asarray(f.valid))
    w2 = voc.words_for(np.asarray(f.desc), np.asarray(f.valid))
    np.testing.assert_array_equal(w1, w2)
    assert (w1[np.asarray(f.valid)] >= 0).all()


def test_global_descriptor_similarity(rng):
    """Same place scores much higher than a different place."""
    from pyslam_tpu.features.orb2 import ORB2Extractor

    ext = ORB2Extractor(num_features=300, num_levels=3)
    voc = BinaryVocabulary(num_words=1024)

    img_a = synth_image(rng)
    img_a2 = img_a[2:, 3:]          # same place, slightly shifted crop
    img_b = synth_image(np.random.default_rng(99))  # different place

    gds = []
    for img in (img_a, img_a2, img_b):
        f = ext(img)
        w = voc.words_for(np.asarray(f.desc), np.asarray(f.valid))
        voc.add_document(w)
        gds.append(voc.global_descriptor(w))
    s_same = float(gds[0] @ gds[1])
    s_diff = float(gds[0] @ gds[2])
    # uniform-weight tf histograms: absolute separation matters (idf would
    # widen the ratio but breaks incremental-store consistency)
    assert s_same > 1.2 * s_diff, (s_same, s_diff)
    assert s_same > 0.7


def test_keyframe_database_candidates(rng):
    voc = BinaryVocabulary(num_words=256)
    db = KeyFrameDatabase(256)
    # create fake word sets: kf0 and kf5 share most words
    base = rng.integers(0, 256, 80)
    for kid in range(6):
        if kid == 5:
            words = base.copy()
        elif kid == 0:
            words = base.copy()
        else:
            words = rng.integers(0, 256, 80)
        h = np.zeros(256, np.float32)
        np.add.at(h, words, 1.0)
        h /= np.linalg.norm(h)
        db.add(kid, words, h)

    cands = db.detect_loop_candidates(
        5, base, db.kf_gdes[5], connected={4}, covisibles_of=lambda k: [],
    )
    assert 0 in cands
    relocs = db.detect_relocalization_candidates(base, db.kf_gdes[5])
    assert relocs[0] in (0, 5)
