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
    raise NotImplementedError(f"segmentation backend {segmentation_type}")
