"""Embedding-mode semantic fusion + open-vocabulary 3D point queries."""

import numpy as np
import pytest


class _FakeKF:
    def __init__(self, kps, points):
        self.kps_raw = np.asarray(kps, np.float32)
        self.points = np.asarray(points, np.int64)


def test_embedding_fusion_and_text_query():
    from pyslam_tpu.models.clip import CLIPConfig
    from pyslam_tpu.semantics.semantic_mapping import (
        SemanticFeatureType, SemanticMappingConfig, SemanticMappingDense)
    from pyslam_tpu.semantics.semantic_segmentation import (
        CLIPOpenVocabSegmentation)

    cfg = CLIPConfig(img_px=64, vit_patch=16, vit_dim=48, vit_depth=2,
                     vit_heads=4, text_dim=32, text_depth=2, text_heads=4,
                     embed_dim=32)
    seg = CLIPOpenVocabSegmentation(labels=["wall", "chair"], cfg=cfg)
    sm = SemanticMappingDense(
        slam_map=None,
        config=SemanticMappingConfig(
            feature_type=SemanticFeatureType.FEATURE_VECTOR),
        segmenter=seg)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    kf = _FakeKF(kps=[[10.0, 12.0], [40.0, 30.0], [55.0, 50.0]],
                 points=[7, 9, -1])
    sm.process_keyframe(kf, img)
    sm.process_keyframe(kf, img)           # second observation -> averaging

    e7 = sm.point_embedding(7)
    assert e7 is not None and e7.shape == (32,)
    assert np.allclose(np.linalg.norm(e7), 1.0, atol=1e-5)
    assert sm.point_embedding_counts[7] == 2
    assert sm.point_embedding(999) is None

    pids, sims = sm.query_points_by_text("chair")
    assert set(pids) <= {7, 9}
    assert len(pids) == 2
    assert sims[0] >= sims[-1]

    # classic label fusion still works alongside
    assert sm.point_label(7) >= 0


def test_accumulators_pruned_on_point_removal():
    """Map.delete_point/replace_point must prune/merge semantic sidecars."""
    from pyslam_tpu.semantics.semantic_mapping import (
        SemanticFeatureType, SemanticMappingConfig, SemanticMappingDense)
    from pyslam_tpu.slam.map import Map

    m = Map()

    class _NoopSeg:
        num_classes = 3

        def infer(self, img):
            raise AssertionError("not used")

    sm = SemanticMappingDense(
        slam_map=m,
        config=SemanticMappingConfig(
            feature_type=SemanticFeatureType.FEATURE_VECTOR),
        segmenter=_NoopSeg())

    # seed two points' accumulators by hand
    sm.point_scores[0] = np.array([1.0, 0.0, 0.0], np.float32)
    sm.point_scores[1] = np.array([0.0, 2.0, 0.0], np.float32)
    sm.point_embeddings[0] = np.array([1.0, 0.0], np.float32)
    sm.point_embedding_counts[0] = 1
    sm.point_embeddings[1] = np.array([0.0, 1.0], np.float32)
    sm.point_embedding_counts[1] = 3

    # create two real points so delete/replace paths run
    import numpy as _np
    pids = m.points.new_points(2)
    m.points.pos[pids] = _np.array([[0, 0, 1], [0, 0, 2]], float)
    m.points.valid[pids] = True

    m.replace_point(0, 1)          # merge 0 -> 1
    assert 0 not in sm.point_scores
    assert 0 not in sm.point_embeddings
    np.testing.assert_allclose(sm.point_scores[1], [1.0, 2.0, 0.0])
    assert sm.point_embedding_counts[1] == 4
    m.delete_point(1)
    assert 1 not in sm.point_scores and 1 not in sm.point_embeddings
    assert sm.point_embedding_counts == {}
