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
