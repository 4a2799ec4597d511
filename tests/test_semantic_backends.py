"""CLIP / YOLO-seg / DETR / Detic semantic backends: contracts."""

import numpy as np
import pytest


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (96, 128, 3)).astype(np.float32)
    im[20:60, 30:90] += 60   # a bright blob
    return np.clip(im, 0, 255)


def _check_labels(out, img, nc):
    labels = out["labels"]
    assert labels.shape == img.shape[:2]
    assert labels.dtype == np.int32
    assert labels.min() >= 0 and labels.max() < nc


def test_clip_towers_and_similarity():
    from pyslam_tpu.models.clip import CLIPConfig, CLIPModel, tokenize

    toks = tokenize(["a chair", "a chair", "a very different long text"])
    assert (toks[0] == toks[1]).all() and not (toks[0] == toks[2]).all()

    cfg = CLIPConfig(img_px=64, vit_patch=16, vit_dim=48, vit_depth=2,
                     vit_heads=4, text_dim=32, text_depth=2, text_heads=4,
                     embed_dim=32)
    m = CLIPModel(cfg)
    e = m.encode_text(["a chair", "a table"])
    assert e.shape == (2, 32)
    assert np.allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)
    rng = np.random.default_rng(1)
    g, p = m.encode_image(rng.uniform(0, 255, (80, 90, 3)), dense=True)
    assert g.shape == (32,) and p.shape == (4, 4, 32)
    assert np.allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-5)


def test_clip_open_vocab_segmentation(img):
    from pyslam_tpu.models.clip import CLIPConfig
    from pyslam_tpu.semantics.semantic_segmentation import (
        CLIPOpenVocabSegmentation, SemanticSegmentationType)

    cfg = CLIPConfig(img_px=64, vit_patch=16, vit_dim=48, vit_depth=2,
                     vit_heads=4, text_dim=32, text_depth=2, text_heads=4,
                     embed_dim=32)
    seg = CLIPOpenVocabSegmentation(labels=["wall", "floor", "chair"],
                                    cfg=cfg)
    out = seg.infer(img)
    _check_labels(out, img, 3)
    assert out["probs"].shape == img.shape[:2] + (3,)
    assert np.allclose(out["probs"].sum(-1), 1.0, atol=1e-4)
    assert out["embeddings"].shape == img.shape[:2] + (32,)
    seg.set_labels(["sky", "road"])          # open vocabulary: re-prompt
    out = seg.infer(img)
    _check_labels(out, img, 2)
    assert SemanticSegmentationType.EOV_SEG.value == "eov_seg"


def test_yolo_seg_backend(img):
    from pyslam_tpu.models.yolo_seg import YoloSegConfig
    from pyslam_tpu.semantics.semantic_segmentation import YoloSegmentation

    cfg = YoloSegConfig(img_px=128, width=8, num_classes=4,
                        topk_per_level=16, max_det=8)
    seg = YoloSegmentation(num_classes=4, cfg=cfg, score_thr=0.2)
    out = seg.infer(img)
    _check_labels(out, img, 5)   # 4 classes + background
    inst = out["instances"]
    assert set(inst) >= {"scores", "classes", "boxes", "masks"}
    assert (np.asarray(inst["classes"]) < 4).all()


def test_detr_backend(img):
    from pyslam_tpu.models.detr import DetrConfig
    from pyslam_tpu.semantics.semantic_segmentation import DetrSegmentation

    cfg = DetrConfig(img_px=128, dim=64, heads=4, enc_depth=1, dec_depth=1,
                     num_queries=8, num_classes=4)
    seg = DetrSegmentation(num_classes=4, cfg=cfg, score_thr=0.1)
    out = seg.infer(img)
    _check_labels(out, img, 5)
    assert out["instances"]["masks"].shape[0] <= 8


def test_detic_backend(img):
    from pyslam_tpu.models.clip import CLIPConfig
    from pyslam_tpu.models.yolo_seg import YoloSegConfig
    from pyslam_tpu.semantics.semantic_segmentation import (
        DeticOpenVocabSegmentation)

    seg = DeticOpenVocabSegmentation(
        labels=["chair", "screen"],
        cfg=YoloSegConfig(img_px=128, width=8, num_classes=1,
                          topk_per_level=8, max_det=4),
        clip_cfg=CLIPConfig(img_px=64, vit_patch=16, vit_dim=48,
                            vit_depth=2, vit_heads=4, text_dim=32,
                            text_depth=2, text_heads=4, embed_dim=32),
        score_thr=0.05)
    out = seg.infer(img)
    _check_labels(out, img, 3)   # 2 labels + background
    assert "clip_classes" in out["instances"]


def test_factory_dispatch():
    from pyslam_tpu.models.detr import DetrConfig
    from pyslam_tpu.models.yolo_seg import YoloSegConfig
    from pyslam_tpu.semantics.semantic_segmentation import (
        DetrSegmentation, SemanticSegmentationType, YoloSegmentation,
        semantic_segmentation_factory)

    s = semantic_segmentation_factory(
        SemanticSegmentationType.YOLO, num_classes=2,
        cfg=YoloSegConfig(img_px=64, width=8, num_classes=2,
                          topk_per_level=8, max_det=4))
    assert isinstance(s, YoloSegmentation)
    s = semantic_segmentation_factory(
        "rf_detr", num_classes=2,
        cfg=DetrConfig(img_px=64, dim=32, heads=4, enc_depth=1,
                       dec_depth=1, num_queries=4, num_classes=2))
    assert isinstance(s, DetrSegmentation)
