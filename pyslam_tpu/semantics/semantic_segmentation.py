"""Semantic segmentation backends + factory.

Reference surface: pySLAM ``pyslam/semantics/semantic_segmentation_*.py``
(DeepLabv3, Segformer, CLIP, Detic, ... wrappers) behind
``semantic_segmentation_factory``.  Backends here:

- SEGFORMER: flax SegFormer-B0-style encoder-decoder defined in
  ``pyslam_tpu.models.segformer`` (runs as an XLA graph; random weights until
  a checkpoint is loaded — the zero-egress build environment cannot download
  pretrained models, the loader accepts converted .npz checkpoints).
- INTENSITY_BANDS: deterministic gray-level quantization segmentation used by
  the hermetic test suite (plays the role of the reference's real models in
  tests, which the reference runs against real datasets we don't have).

Output convention (reference ``semantic_segmentation_base.py``): ``infer``
returns a dict with "labels" (H,W) int32 and optionally "probs"
(H,W,num_classes) float32.
"""

from __future__ import annotations

import enum

import numpy as np


class SemanticSegmentationType(enum.Enum):
    DEEPLABV3 = "deeplabv3"
    SEGFORMER = "segformer"
    CLIP = "clip"
    DETIC = "detic"
    YOLO = "yolo"
    RF_DETR = "rf_detr"
    EOV_SEG = "eov_seg"
    ODISE = "odise"
    INTENSITY_BANDS = "intensity_bands"


class SemanticDatasetType(enum.Enum):
    VOC = 21
    CITYSCAPES = 19
    ADE20K = 150
    CUSTOM = 0


class SemanticSegmentationBase:
    num_classes: int = 21

    def infer(self, img) -> dict:
        raise NotImplementedError

    @property
    def class_names(self):
        return [f"class_{i}" for i in range(self.num_classes)]


class IntensityBandSegmentation(SemanticSegmentationBase):
    """Quantize gray levels into bands: hermetic stand-in backend."""

    def __init__(self, num_classes: int = 8):
        self.num_classes = num_classes

    def infer(self, img) -> dict:
        img = np.asarray(img, np.float32)
        labels = np.clip(
            (img / 256.0 * self.num_classes).astype(np.int32), 0, self.num_classes - 1
        )
        probs = np.zeros(labels.shape + (self.num_classes,), np.float32)
        np.put_along_axis(probs, labels[..., None], 0.9, axis=-1)
        probs += 0.1 / self.num_classes
        probs /= probs.sum(-1, keepdims=True)
        return {"labels": labels, "probs": probs}


class SegformerSegmentation(SemanticSegmentationBase):
    def __init__(self, num_classes: int = 19, checkpoint: str | None = None):
        from pyslam_tpu.models.segformer import SegFormerInference

        self.num_classes = num_classes
        self.model = SegFormerInference(num_classes=num_classes,
                                        checkpoint=checkpoint)

    def infer(self, img) -> dict:
        return self.model.infer(img)


class CLIPOpenVocabSegmentation(SemanticSegmentationBase):
    """Open-vocabulary dense segmentation from CLIP patch embeddings
    (reference ``semantic_segmentation_clip.py`` / f3rm features): labels
    are the argmax text prompt per patch, upsampled to pixel resolution;
    ``probs`` are the softmaxed patch-text similarities.  Also exposes
    the per-pixel CLIP embedding map for embedding-space semantic fusion."""

    def __init__(self, labels: list | None = None,
                 checkpoint: str | None = None, temperature: float = 0.01,
                 cfg=None):
        from pyslam_tpu.models.clip import CLIPModel

        self.model = CLIPModel(cfg=cfg, checkpoint=checkpoint)
        self.temperature = temperature
        self.set_labels(labels or [
            "floor", "wall", "ceiling", "furniture", "object", "person",
            "vehicle", "vegetation"])

    def set_labels(self, labels: list):
        self.labels = list(labels)
        self.num_classes = len(self.labels)
        self.text_emb = self.model.encode_text(
            [f"a photo of a {l}" for l in self.labels])  # (C, D)

    @property
    def class_names(self):
        return self.labels

    def infer(self, img) -> dict:
        h, w = np.asarray(img).shape[:2]
        _, patch = self.model.encode_image(img, dense=True)   # (g, g, D)
        sim = patch @ self.text_emb.T                          # (g, g, C)
        probs = np.exp(sim / self.temperature)
        probs /= probs.sum(-1, keepdims=True)
        g = patch.shape[0]
        ys = np.clip((np.arange(h) * g / h).astype(int), 0, g - 1)
        xs = np.clip((np.arange(w) * g / w).astype(int), 0, g - 1)
        probs = probs[np.ix_(ys, xs)]
        labels = probs.argmax(-1).astype(np.int32)
        emb = patch[np.ix_(ys, xs)]
        return {"labels": labels, "probs": probs.astype(np.float32),
                "embeddings": emb.astype(np.float32)}


class YoloSegmentation(SemanticSegmentationBase):
    """YOLO-class one-stage instance segmentation backend
    (models/yolo_seg.py); semantic labels from painted instance masks,
    class ``num_classes`` = background."""

    def __init__(self, num_classes: int = 8, checkpoint: str | None = None,
                 cfg=None, score_thr: float = 0.3):
        from pyslam_tpu.models.yolo_seg import YoloSeg, YoloSegConfig

        self.num_classes = num_classes + 1   # + background
        self.score_thr = score_thr
        self.model = YoloSeg(cfg or YoloSegConfig(num_classes=num_classes),
                             checkpoint=checkpoint)

    def infer(self, img) -> dict:
        return self.model.infer(img, score_thr=self.score_thr)


class DetrSegmentation(SemanticSegmentationBase):
    """RF-DETR-slot detection-transformer backend (models/detr.py)."""

    def __init__(self, num_classes: int = 8, checkpoint: str | None = None,
                 cfg=None, score_thr: float = 0.5):
        from pyslam_tpu.models.detr import DetrConfig, DetrModel

        self.num_classes = num_classes + 1   # + no-object/background
        self.score_thr = score_thr
        self.model = DetrModel(cfg or DetrConfig(num_classes=num_classes),
                               checkpoint=checkpoint)

    def infer(self, img) -> dict:
        return self.model.infer(img, score_thr=self.score_thr)


class DeticOpenVocabSegmentation(SemanticSegmentationBase):
    """Detic-style open-vocabulary detection backend: class-agnostic
    mask proposals (YOLO-class detector) classified by CLIP box crops
    against an arbitrary text label list (reference
    ``semantic_segmentation`` Detic wrapper; Detic = detector with a
    CLIP-embedding classifier head)."""

    def __init__(self, labels: list | None = None,
                 checkpoint: str | None = None, cfg=None,
                 clip_cfg=None, score_thr: float = 0.3):
        from pyslam_tpu.models.clip import CLIPModel
        from pyslam_tpu.models.yolo_seg import YoloSeg, YoloSegConfig

        self.score_thr = score_thr
        self.detector = YoloSeg(cfg or YoloSegConfig(num_classes=1),
                                checkpoint=checkpoint)
        self.clip = CLIPModel(cfg=clip_cfg)
        self.set_labels(labels or [
            "chair", "table", "person", "screen", "door", "window",
            "plant", "box"])

    def set_labels(self, labels: list):
        self.labels = list(labels)
        self.num_classes = len(labels) + 1   # + background
        self.text_emb = self.clip.encode_text(
            [f"a photo of a {l}" for l in self.labels])

    @property
    def class_names(self):
        return self.labels + ["background"]

    def infer(self, img) -> dict:
        img = np.asarray(img, np.float32)
        h, w = img.shape[:2]
        det = self.detector.infer(img, score_thr=self.score_thr)
        inst = det["instances"]
        lab_map = np.full((h, w), len(self.labels), np.int32)
        classes = []
        for i in np.argsort(inst["scores"]):
            x1, y1, x2, y2 = inst["boxes"][i]
            x1, x2 = int(max(0, x1)), int(min(w - 1, x2))
            y1, y2 = int(max(0, y1)), int(min(h - 1, y2))
            if x2 <= x1 + 1 or y2 <= y1 + 1:
                classes.append(-1)
                continue
            emb = self.clip.encode_image(img[y1:y2, x1:x2])
            cls = int(np.argmax(emb @ self.text_emb.T))
            classes.append(cls)
            m = inst["masks"][i]
            my = np.clip((np.arange(y1, y2) * m.shape[0]
                          / max(h, 1)).astype(int), 0, m.shape[0] - 1)
            mx = np.clip((np.arange(x1, x2) * m.shape[1]
                          / max(w, 1)).astype(int), 0, m.shape[1] - 1)
            sub = m[np.ix_(my, mx)] > 0.5
            region = lab_map[y1:y2, x1:x2]
            region[sub] = cls
        return {"labels": lab_map,
                "instances": {**inst, "clip_classes": np.array(classes)}}


def semantic_segmentation_factory(
    segmentation_type=SemanticSegmentationType.INTENSITY_BANDS,
    num_classes: int | None = None,
    checkpoint: str | None = None,
    **kw,
) -> SemanticSegmentationBase:
    if isinstance(segmentation_type, str):
        segmentation_type = SemanticSegmentationType(segmentation_type.lower())
    if segmentation_type == SemanticSegmentationType.INTENSITY_BANDS:
        return IntensityBandSegmentation(num_classes or 8)
    if segmentation_type == SemanticSegmentationType.SEGFORMER:
        return SegformerSegmentation(num_classes or 19, checkpoint)
    if segmentation_type == SemanticSegmentationType.DEEPLABV3:
        from pyslam_tpu.models.deeplabv3 import DeepLabV3Segmenter

        return DeepLabV3Segmenter(num_classes or 21, checkpoint)
    if segmentation_type in (SemanticSegmentationType.CLIP,
                             SemanticSegmentationType.EOV_SEG,
                             SemanticSegmentationType.ODISE):
        # EOV-Seg / ODISE occupy the open-vocabulary slot: the CLIP
        # text-prompt path provides the same label-set-free surface
        return CLIPOpenVocabSegmentation(checkpoint=checkpoint, **kw)
    if segmentation_type == SemanticSegmentationType.YOLO:
        return YoloSegmentation(num_classes or 8, checkpoint, **kw)
    if segmentation_type == SemanticSegmentationType.RF_DETR:
        return DetrSegmentation(num_classes or 8, checkpoint, **kw)
    if segmentation_type == SemanticSegmentationType.DETIC:
        return DeticOpenVocabSegmentation(checkpoint=checkpoint, **kw)
    raise NotImplementedError(f"segmentation backend {segmentation_type}")
