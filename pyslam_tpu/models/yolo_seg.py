"""YOLOv8-seg-class one-stage instance segmentation in flax.

Reference capability: pySLAM's YOLO segmentation backend
(``pyslam/semantics/semantic_segmentation_*`` family, ultralytics YOLO
wrapper).  The defining architecture, rebuilt TPU-native:

  * CSP-style backbone: stem + 3 stages (stride 8/16/32) of Conv-s2 +
    C2f blocks (split-bottleneck with concat fusion);
  * PAN neck: top-down upsample+concat fusion, then bottom-up
    re-aggregation — P3/P4/P5 pyramid;
  * anchor-free decoupled heads per level: class scores (sigmoid),
    box offsets (ltrb distances, grid-relative), and mask COEFFICIENTS;
  * a proto head on P3 produces K mask PROTOTYPES at 1/8 resolution;
    instance mask = sigmoid(proto @ coefficients) cropped to the box
    (the YOLACT/YOLOv8-seg factorization — masks cost one matmul).

Decoding runs as one jitted graph: per-level top-k by score, batched
box decode, batched mask matmul; host does only the final greedy NMS
over <=256 candidates.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class YoloSegConfig:
    img_px: int = 256          # square working resolution (/32)
    width: int = 32            # base channels
    num_classes: int = 8
    num_protos: int = 16
    topk_per_level: int = 64
    max_det: int = 64


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        from pyslam_tpu.models.resnet import BN

        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv")(x)
        x = BN(self.features, name="bn")(x)   # torch-style running stats
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvBNSiLU(self.features, name="cv1")(x)
        y = ConvBNSiLU(self.features, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """YOLOv8 C2f: split, n bottlenecks on one half, concat everything."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        h = self.features // 2
        y = ConvBNSiLU(2 * h, kernel=1, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for i in range(self.n):
            b = Bottleneck(h, self.shortcut, name=f"m{i}")(b)
            outs.append(b)
        return ConvBNSiLU(self.features, kernel=1, name="cv2")(
            jnp.concatenate(outs, axis=-1))


class YoloSegNet(nn.Module):
    cfg: YoloSegConfig

    @nn.compact
    def __call__(self, img):  # (S, S, 3) in [0,1]
        c = self.cfg
        w = c.width
        x = img[None]
        x = ConvBNSiLU(w, stride=2, name="stem")(x)          # 1/2
        x = ConvBNSiLU(2 * w, stride=2, name="down1")(x)     # 1/4
        x = C2f(2 * w, name="c2f1")(x)
        x = ConvBNSiLU(4 * w, stride=2, name="down2")(x)     # 1/8
        p3 = C2f(4 * w, n=2, name="c2f2")(x)
        x = ConvBNSiLU(8 * w, stride=2, name="down3")(p3)    # 1/16
        p4 = C2f(8 * w, n=2, name="c2f3")(x)
        x = ConvBNSiLU(16 * w, stride=2, name="down4")(p4)   # 1/32
        p5 = C2f(16 * w, name="c2f4")(x)

        # PAN neck: top-down then bottom-up
        def up(x, ref):
            return jax.image.resize(x, ref.shape[:3] + (x.shape[-1],),
                                    "nearest")

        n4 = C2f(8 * w, shortcut=False, name="neck_td4")(
            jnp.concatenate([up(p5, p4), p4], -1))
        n3 = C2f(4 * w, shortcut=False, name="neck_td3")(
            jnp.concatenate([up(n4, p3), p3], -1))
        d3 = ConvBNSiLU(4 * w, stride=2, name="neck_bu3")(n3)
        n4 = C2f(8 * w, shortcut=False, name="neck_bu4")(
            jnp.concatenate([d3, n4], -1))
        d4 = ConvBNSiLU(8 * w, stride=2, name="neck_bu5")(n4)
        n5 = C2f(16 * w, shortcut=False, name="neck_bu6")(
            jnp.concatenate([d4, p5], -1))

        # proto head (1/8): K mask prototypes
        proto = ConvBNSiLU(2 * w, name="proto1")(n3)
        proto = nn.Conv(c.num_protos, (1, 1), name="proto2")(proto)[0]

        # decoupled heads per level
        outs = []
        for name, f in (("p3", n3), ("p4", n4), ("p5", n5)):
            cls = ConvBNSiLU(2 * w, name=f"head_{name}_cls1")(f)
            cls = nn.Conv(c.num_classes, (1, 1), name=f"head_{name}_cls2")(cls)
            box = ConvBNSiLU(2 * w, name=f"head_{name}_box1")(f)
            box = nn.Conv(4, (1, 1), name=f"head_{name}_box2")(box)
            coef = ConvBNSiLU(2 * w, name=f"head_{name}_m1")(f)
            coef = nn.Conv(c.num_protos, (1, 1),
                           name=f"head_{name}_m2")(coef)
            outs.append((cls[0], box[0], coef[0]))
        return outs, proto


class YoloSeg:
    """Instance segmentation facade -> semantic label map + instances."""

    def __init__(self, cfg: YoloSegConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or YoloSegConfig()
        self.net = YoloSegNet(self.cfg)
        S = self.cfg.img_px
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((S, S, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)

        @jax.jit
        def _run(params, img):
            outs, proto = self.net.apply(params, img)
            c = self.cfg
            cand = []
            for li, (cls, box, coef) in enumerate(outs):
                stride = (8, 16, 32)[li]
                g = cls.shape[0]
                score = jax.nn.sigmoid(cls).reshape(g * g, c.num_classes)
                best = score.max(axis=1)
                lab = score.argmax(axis=1)
                k = min(c.topk_per_level, g * g)
                v, idx = jax.lax.top_k(best, k)
                gy = (idx // g).astype(jnp.float32) + 0.5
                gx = (idx % g).astype(jnp.float32) + 0.5
                ltrb = nn.softplus(box.reshape(g * g, 4)[idx]) * stride
                x1 = gx * stride - ltrb[:, 0]
                y1 = gy * stride - ltrb[:, 1]
                x2 = gx * stride + ltrb[:, 2]
                y2 = gy * stride + ltrb[:, 3]
                cand.append((v, lab[idx],
                             jnp.stack([x1, y1, x2, y2], 1),
                             coef.reshape(g * g, c.num_protos)[idx]))
            scores = jnp.concatenate([c_[0] for c_ in cand])
            labels = jnp.concatenate([c_[1] for c_ in cand])
            boxes = jnp.concatenate([c_[2] for c_ in cand])
            coefs = jnp.concatenate([c_[3] for c_ in cand])
            masks = jax.nn.sigmoid(
                jnp.einsum("hwk,nk->nhw", proto, coefs))   # (N, S/8, S/8)
            return scores, labels, boxes, masks

        self._run = _run

    @staticmethod
    def _nms(boxes, scores, iou_thr=0.5, max_det=64):
        order = np.argsort(-scores)
        keep = []
        while len(order) and len(keep) < max_det:
            i = order[0]
            keep.append(i)
            if len(order) == 1:
                break
            rest = order[1:]
            xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
            a = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                 + (boxes[rest, 2] - boxes[rest, 0])
                 * (boxes[rest, 3] - boxes[rest, 1]) - inter)
            order = rest[inter / np.maximum(a, 1e-9) < iou_thr]
        return np.array(keep, int)

    def infer(self, img, score_thr: float = 0.3) -> dict:
        img = np.asarray(img, np.float32)
        H, W = img.shape[:2]
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        S = self.cfg.img_px
        ys = np.clip((np.arange(S) * H / S).astype(int), 0, H - 1)
        xs = np.clip((np.arange(S) * W / S).astype(int), 0, W - 1)
        x = img[np.ix_(ys, xs)]
        if x.max() > 2.0:
            x = x / 255.0
        scores, labels, boxes, masks = (
            np.asarray(o) for o in self._run(self.params, jnp.asarray(x)))
        sel = scores >= score_thr
        scores, labels, boxes, masks = (
            scores[sel], labels[sel], boxes[sel], masks[sel])
        if len(scores):
            keep = self._nms(boxes, scores, max_det=self.cfg.max_det)
            scores, labels, boxes, masks = (
                scores[keep], labels[keep], boxes[keep], masks[keep])
        # paint semantic labels (background = num_classes)
        lab_map = np.full((S, S), self.cfg.num_classes, np.int32)
        gm = masks.shape[-1] if len(masks) else S // 8
        for i in np.argsort(scores):     # highest painted last (wins)
            m = masks[i]
            m = m.repeat(S // m.shape[0], 0).repeat(S // m.shape[1], 1)
            x1, y1, x2, y2 = np.clip(boxes[i], 0, S - 1).astype(int)
            crop = np.zeros_like(m, bool)
            crop[y1:y2 + 1, x1:x2 + 1] = True
            lab_map[(m > 0.5) & crop] = labels[i]
        ys = np.clip((np.arange(H) * S / H).astype(int), 0, S - 1)
        xs = np.clip((np.arange(W) * S / W).astype(int), 0, S - 1)
        sx, sy = W / S, H / S
        boxes_img = boxes * np.array([sx, sy, sx, sy]) if len(boxes) \
            else boxes
        return {"labels": lab_map[np.ix_(ys, xs)],
                "instances": {"scores": scores, "classes": labels,
                              "boxes": boxes_img, "masks": masks}}
