"""DETR-class detection transformer with panoptic mask head in flax.

Reference capability: pySLAM's RF-DETR segmentation backend
(``pyslam/semantics`` detection-transformer family, wrapping
roboflow/rf-detr).  The detection-transformer design, rebuilt TPU-native:

  * conv backbone to a 1/16 feature map + 2D sine positional encoding;
  * transformer ENCODER over the flattened memory tokens;
  * DECODER with learned object queries: per layer self-attention over
    the queries, cross-attention into the memory, FFN (pre-LN);
  * prediction heads per query: softmax class scores over
    num_classes+1 (no-object), sigmoid (cx, cy, w, h) boxes;
  * panoptic-style MASK head: each query's multi-head cross-attention
    map over the memory grid is decoded by a small conv stack into a
    per-query mask (DETR-panoptic's attention-to-mask factorization).

Everything (backbone, encoder, decoder, mask decode) is one jitted
forward; queries are a fixed-size batch so shapes are static.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.vggt import _Block


@dataclass(frozen=True)
class DetrConfig:
    img_px: int = 256
    dim: int = 128
    heads: int = 8
    enc_depth: int = 3
    dec_depth: int = 3
    num_queries: int = 32
    num_classes: int = 8


def sine_pos_2d(h, w, dim):
    """(h*w, dim) 2D sine-cosine positional encoding."""
    d4 = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(d4) / d4))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.concatenate([
        np.sin(ys.reshape(-1, 1) * omega), np.cos(ys.reshape(-1, 1) * omega),
        np.sin(xs.reshape(-1, 1) * omega), np.cos(xs.reshape(-1, 1) * omega),
    ], axis=1)
    if out.shape[1] < dim:
        out = np.pad(out, ((0, 0), (0, dim - out.shape[1])))
    return jnp.asarray(out, jnp.float32)


class DecoderBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, q, mem):
        """q: (Q, D) queries, mem: (N, D).  Returns (q, attn (heads,Q,N))."""
        D, h = self.dim, self.heads
        hd = D // h
        # self-attention over queries
        y = nn.LayerNorm(name="norm1")(q)
        qkv = nn.Dense(3 * D, name="self_qkv")(y)
        qq, kk, vv = jnp.split(qkv, 3, axis=-1)
        qq = qq.reshape(-1, h, hd)
        kk = kk.reshape(-1, h, hd)
        vv = vv.reshape(-1, h, hd)
        a = jax.nn.softmax(
            jnp.einsum("qhd,khd->hqk", qq, kk) / np.sqrt(hd), -1)
        y = jnp.einsum("hqk,khd->qhd", a, vv).reshape(-1, D)
        q = q + nn.Dense(D, name="self_proj")(y)
        # cross-attention into memory
        y = nn.LayerNorm(name="norm2")(q)
        qq = nn.Dense(D, name="cross_q")(y).reshape(-1, h, hd)
        kk = nn.Dense(D, name="cross_k")(mem).reshape(-1, h, hd)
        vv = nn.Dense(D, name="cross_v")(mem).reshape(-1, h, hd)
        attn = jax.nn.softmax(
            jnp.einsum("qhd,khd->hqk", qq, kk) / np.sqrt(hd), -1)
        y = jnp.einsum("hqk,khd->qhd", attn, vv).reshape(-1, D)
        q = q + nn.Dense(D, name="cross_proj")(y)
        # FFN
        y = nn.LayerNorm(name="norm3")(q)
        y = nn.Dense(4 * D, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        q = q + nn.Dense(D, name="fc2")(y)
        return q, attn


class DetrNet(nn.Module):
    cfg: DetrConfig

    @nn.compact
    def __call__(self, img):  # (S, S, 3) in [0, 1]
        c = self.cfg
        x = img[None]
        for i, f in enumerate((c.dim // 4, c.dim // 2, c.dim, c.dim)):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"backbone{i}")(x)
            x = nn.relu(nn.Conv(f, (3, 3), padding="SAME",
                                name=f"backbone{i}b")(x))
        g = x.shape[1]                                     # S/16
        mem = x.reshape(g * g, c.dim) + sine_pos_2d(g, g, c.dim)
        mem = _Block(c.dim, c.heads, name="enc_in")(mem[None])[0]
        for i in range(c.enc_depth):
            mem = _Block(c.dim, c.heads, name=f"enc_{i}")(mem[None])[0]

        queries = self.param("query_embed", nn.initializers.normal(0.02),
                             (c.num_queries, c.dim))
        q = queries
        attn = None
        for i in range(c.dec_depth):
            q, attn = DecoderBlock(c.dim, c.heads, name=f"dec_{i}")(q, mem)

        logits = nn.Dense(c.num_classes + 1, name="class_head")(q)
        boxes = jax.nn.sigmoid(nn.Dense(4, name="box_head")(q))  # cxcywh/S

        # mask head: decode each query's attention maps (heads, g, g)
        amap = attn.transpose(1, 0, 2).reshape(
            c.num_queries, c.heads, g, g).transpose(0, 2, 3, 1)
        m = nn.Conv(16, (3, 3), padding="SAME", name="mask_conv1")(amap)
        m = nn.relu(m)
        m = jax.image.resize(m, (c.num_queries, g * 4, g * 4, 16), "bilinear")
        m = nn.relu(nn.Conv(8, (3, 3), padding="SAME", name="mask_conv2")(m))
        masks = nn.Conv(1, (1, 1), name="mask_out")(m)[..., 0]  # (Q, S/4, S/4)
        return logits, boxes, masks


class DetrModel:
    """RF-DETR-slot facade -> semantic label map + instances."""

    def __init__(self, cfg: DetrConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or DetrConfig()
        self.net = DetrNet(self.cfg)
        S = self.cfg.img_px
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((S, S, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    def infer(self, img, score_thr: float = 0.5) -> dict:
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
        logits, boxes, masks = (
            np.asarray(o) for o in self._run(self.params, jnp.asarray(x)))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        cls = probs[:, :-1].argmax(-1)
        score = probs[np.arange(len(cls)), cls]
        keep = (score >= score_thr) & (probs.argmax(-1) != self.cfg.num_classes)
        lab_map = np.full((S, S), self.cfg.num_classes, np.int32)
        order = np.argsort(score[keep])
        kq = np.flatnonzero(keep)[order]
        for qi in kq:                      # highest score painted last
            m = masks[qi]
            m = m.repeat(S // m.shape[0], 0).repeat(S // m.shape[1], 1)
            lab_map[m > 0.0] = cls[qi]
        ys = np.clip((np.arange(H) * S / H).astype(int), 0, S - 1)
        xs = np.clip((np.arange(W) * S / W).astype(int), 0, S - 1)
        boxes_img = boxes * np.array([W, H, W, H])
        return {"labels": lab_map[np.ix_(ys, xs)],
                "instances": {"scores": score[keep], "classes": cls[keep],
                              "boxes_cxcywh": boxes_img[keep],
                              "masks": masks[keep]}}
