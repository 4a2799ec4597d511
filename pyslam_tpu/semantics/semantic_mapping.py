"""Semantic mapping: per-keypoint semantics fused into map points.

Reference: pySLAM ``pyslam/semantics/semantic_mapping_dense.py`` +
``semantic_fusion_methods.py`` — per-keyframe segmentation, keypoint label
sampling (``Frame.kps_sem``, reference ``frame.py:387``), fusion into map
points by counting / Bayesian / averaging, optional semantic weighting in BA.
Runs synchronously per keyframe like the other back-end modules.
"""

from __future__ import annotations

import enum
from collections import deque

import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.semantics.semantic_segmentation import (
    SemanticSegmentationBase,
    semantic_segmentation_factory,
)


class SemanticFeatureType(enum.Enum):
    LABEL = "label"
    PROBABILITY_VECTOR = "probability_vector"
    FEATURE_VECTOR = "feature_vector"


class SemanticMappingType(enum.Enum):
    DENSE = "dense"


def semantic_information_weights(dataset: str, num_classes: int) -> np.ndarray:
    """Per-class information weights for semantic BA weighting (reference
    ``semantic_information_weights_factory.py``): 1.0 everywhere except
    classes whose features are geometrically unstable — the reference
    down-weights Cityscapes 'vegetation' (class 8) to 0.001; unknown labels
    (-1 / out of range) map to 1.0 via the trailing slot."""
    w = np.ones(num_classes + 1, np.float32)
    d = dataset.lower()
    if d == "cityscapes" and num_classes > 8:
        w[8] = 0.001   # vegetation (ref :80)
    return w


class SemanticMappingConfig:
    def __init__(
        self,
        segmentation_type="intensity_bands",
        num_classes: int = 8,
        feature_type: SemanticFeatureType = SemanticFeatureType.PROBABILITY_VECTOR,
        dataset: str = "custom",
    ):
        self.segmentation_type = segmentation_type
        self.num_classes = num_classes
        self.feature_type = feature_type
        # label-set name ("cityscapes"/"voc"/"ade20k"/"nyu40"/"custom"):
        # selects the per-class BA information weights
        self.dataset = dataset


class SemanticMappingDense:
    """Per-keyframe segmentation + sparse map-point label fusion."""

    def __init__(self, slam_map, config: SemanticMappingConfig | None = None,
                 segmenter: SemanticSegmentationBase | None = None):
        self.map = slam_map
        self.config = config or SemanticMappingConfig()
        self.segmenter = segmenter or semantic_segmentation_factory(
            self.config.segmentation_type, self.config.num_classes
        )
        self.num_classes = self.segmenter.num_classes
        self.queue: deque = deque()
        self._pending_imgs: dict[int, np.ndarray] = {}
        # per-map-point class score accumulators (host dict -> lazily dense)
        self.point_scores: dict[int, np.ndarray] = {}
        # FEATURE_VECTOR mode: running mean of unit embeddings per point
        # (reference 'embedding' representation + averaging fusion)
        self.point_embeddings: dict[int, np.ndarray] = {}
        self.point_embedding_counts: dict[int, int] = {}
        # prune/merge accumulators when the map deletes or replaces points —
        # otherwise query_points_by_text returns dead pids and the dicts grow
        # without bound
        listeners = getattr(self.map, "point_removal_listeners", None)
        if listeners is not None:
            listeners.append(self._on_point_removed)

    def _on_point_removed(self, old_pid: int, new_pid: int | None):
        scores = self.point_scores.pop(old_pid, None)
        emb = self.point_embeddings.pop(old_pid, None)
        cnt = self.point_embedding_counts.pop(old_pid, 0)
        if new_pid is None:
            return
        if scores is not None:
            acc = self.point_scores.get(new_pid)
            self.point_scores[new_pid] = (
                scores if acc is None else acc + scores
            )
        if emb is not None:
            n_new = self.point_embedding_counts.get(new_pid, 0)
            mean_new = self.point_embeddings.get(new_pid)
            if mean_new is None:
                self.point_embeddings[new_pid] = emb
                self.point_embedding_counts[new_pid] = cnt
            else:
                tot = n_new + cnt
                self.point_embeddings[new_pid] = (
                    (mean_new * n_new + emb * cnt) / max(tot, 1)
                )
                self.point_embedding_counts[new_pid] = tot

    def offer_keyframe_image(self, kid: int, img):
        """Register the raw image for a just-created keyframe (frames do not
        retain full images; ``Slam.track`` offers it at keyframe creation and
        ``add_keyframe`` — called by local mapping when the keyframe is
        digested — consumes it, mirroring the volumetric integrator's
        snapshot pattern)."""
        self._pending_imgs[kid] = img

    def add_keyframe(self, kf, img=None):
        if img is None:
            img = self._pending_imgs.pop(kf.kid, None)
        if img is None:
            img = getattr(kf, "img", None)
        if img is None:
            return
        self.queue.append((kf, img))

    def step(self) -> bool:
        if not self.queue:
            return False
        kf, img = self.queue.popleft()
        self.process_keyframe(kf, img)
        return True

    def run_all(self):
        while self.step():
            pass

    def process_keyframe(self, kf, img):
        out = self.segmenter.infer(img)
        labels = out["labels"]
        probs = out.get("probs")
        h, w = labels.shape
        xs = np.clip(np.round(kf.kps_raw[:, 0]).astype(int), 0, w - 1)
        ys = np.clip(np.round(kf.kps_raw[:, 1]).astype(int), 0, h - 1)
        kp_labels = labels[ys, xs]
        kf.kps_sem = kp_labels  # reference stores per-keypoint semantics

        embeddings = out.get("embeddings")  # (H, W, D) open-vocab backends

        # fuse into observed map points
        slots = np.nonzero(kf.points >= 0)[0]
        for kp_idx in slots:
            pid = int(kf.points[kp_idx])
            acc = self.point_scores.get(pid)
            if acc is None:
                acc = np.zeros(self.num_classes, np.float32)
                self.point_scores[pid] = acc
            if (
                probs is not None
                and self.config.feature_type == SemanticFeatureType.PROBABILITY_VECTOR
            ):
                acc += probs[ys[kp_idx], xs[kp_idx]]
            else:
                acc[kp_labels[kp_idx]] += 1.0
            if (embeddings is not None and self.config.feature_type
                    == SemanticFeatureType.FEATURE_VECTOR):
                e = embeddings[ys[kp_idx], xs[kp_idx]]
                n = self.point_embedding_counts.get(pid, 0)
                mean = self.point_embeddings.get(pid)
                mean = e.copy() if mean is None else (mean * n + e) / (n + 1)
                self.point_embeddings[pid] = mean
                self.point_embedding_counts[pid] = n + 1

    def point_label(self, pid: int) -> int:
        acc = self.point_scores.get(int(pid))
        return int(np.argmax(acc)) if acc is not None else -1

    def get_semantic_weight(self, labels) -> np.ndarray:
        """Per-observation information weight from keypoint class labels
        (reference ``semantic_mapping_dense.py:285`` get_semantic_weight,
        consumed by BA edge information scaling, ``optimizer_g2o.py:728``).
        Accepts scalar or array labels; -1 / out-of-range -> 1.0."""
        if not hasattr(self, "_sem_weights"):
            self._sem_weights = semantic_information_weights(
                getattr(self.config, "dataset", "custom"), self.num_classes
            )
        labels = np.asarray(labels, np.int64)
        safe = np.where(
            (labels >= 0) & (labels < self.num_classes),
            labels, self.num_classes,
        )
        return self._sem_weights[safe]

    def point_confidence(self, pid: int) -> float:
        acc = self.point_scores.get(int(pid))
        if acc is None or acc.sum() <= 0:
            return 0.0
        return float(acc.max() / acc.sum())

    def point_embedding(self, pid: int):
        """Fused unit embedding of a map point (FEATURE_VECTOR mode)."""
        e = self.point_embeddings.get(int(pid))
        if e is None:
            return None
        return e / max(np.linalg.norm(e), 1e-9)

    def query_points_by_text(self, text: str, clip_model=None, top_k: int = 50):
        """Open-vocabulary 3D query: rank fused map points against a text
        prompt (the f3rm-style capability the reference gets from CLIP
        embeddings).  Returns (pids, similarities) sorted descending."""
        if clip_model is None:
            clip_model = getattr(self.segmenter, "model", None)
        if clip_model is None or not self.point_embeddings:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        t = clip_model.encode_text([f"a photo of a {text}"])[0]
        pids = np.fromiter(self.point_embeddings.keys(), np.int64)
        embs = np.stack([self.point_embedding(p) for p in pids])
        sims = embs @ t
        order = np.argsort(-sims)[:top_k]
        return pids[order], sims[order].astype(np.float32)


def semantic_mapping_factory(slam_map, config=None, **kw) -> SemanticMappingDense:
    return SemanticMappingDense(slam_map, config, **kw)
