"""DUSt3R-class two-view 3D reconstruction network in flax.

Follows the published DUSt3R design (CroCo v2 backbone: shared ViT encoder
over both views, two entangled decoders with cross-attention to the other
view's tokens, RoPE-2D relative position encoding in every attention, and a
linear pointmap head regressing per-pixel 3D points + confidence — view 2's
points expressed in view 1's frame).  Reference wrapper: pySLAM
``pyslam/scene_from_views/scene_from_views_dust3r.py`` over the upstream
torch implementation.

``dust3r_from_torch`` (models/torch_convert.py) maps the official checkpoint
layout (``patch_embed.proj``, ``enc_blocks.N.*`` timm blocks,
``decoder_embed``, ``dec_blocks.N`` / ``dec_blocks2.N`` with cross-attention,
``enc_norm``/``dec_norm``, ``downstream_head1/2.proj``) onto this tree; a
tiny-scale torch twin validates the mapping in tests/test_dust3r.py.

The whole two-view forward is ONE jitted XLA graph — attention matmuls land
on the MXU; static input size keeps a single compilation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ------------------------------------------------------------------ RoPE 2D
def rope2d_freqs(positions: jnp.ndarray, dim: int, base: float = 100.0):
    """positions: (N,2) integer (y,x) token grid coords -> cos/sin tables
    (N, dim/2) where the first half of head dims rotates with y, second with
    x (the CroCo v2 RoPE2D scheme)."""
    d4 = dim // 4
    inv = 1.0 / (base ** (jnp.arange(d4) / d4))           # (d4,)
    ang_y = positions[:, 0:1] * inv[None, :]              # (N,d4)
    ang_x = positions[:, 1:2] * inv[None, :]
    ang = jnp.concatenate([ang_y, ang_x], axis=1)         # (N, dim/2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (H, N, D) per-head tokens; rotate consecutive pairs."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape)


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)
        return nn.Dense(self.dim, name="fc2")(x)


class Attention(nn.Module):
    """timm-style self-attention with fused qkv + RoPE."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, cos, sin):
        n, d = x.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x).reshape(n, 3, h, hd)
        q = qkv[:, 0].transpose(1, 0, 2)
        k = qkv[:, 1].transpose(1, 0, 2)
        v = qkv[:, 2].transpose(1, 0, 2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        att = jax.nn.softmax(jnp.einsum("hnd,hmd->hnm", q, k) / jnp.sqrt(hd), -1)
        out = jnp.einsum("hnm,hmd->hnd", att, v).transpose(1, 0, 2).reshape(n, d)
        return nn.Dense(d, name="proj")(out)


class CrossAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, y, cos_q, sin_q, cos_k, sin_k):
        n, d = x.shape
        m = y.shape[0]
        h = self.heads
        hd = d // h
        q = nn.Dense(d, name="projq")(x).reshape(n, h, hd).transpose(1, 0, 2)
        k = nn.Dense(d, name="projk")(y).reshape(m, h, hd).transpose(1, 0, 2)
        v = nn.Dense(d, name="projv")(y).reshape(m, h, hd).transpose(1, 0, 2)
        q = apply_rope(q, cos_q, sin_q)
        k = apply_rope(k, cos_k, sin_k)
        att = jax.nn.softmax(jnp.einsum("hnd,hmd->hnm", q, k) / jnp.sqrt(hd), -1)
        out = jnp.einsum("hnm,hmd->hnd", att, v).transpose(1, 0, 2).reshape(n, d)
        return nn.Dense(d, name="proj")(out)


class EncBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, cos, sin):
        x = x + Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(name="norm1")(x), cos, sin
        )
        x = x + Mlp(self.dim, self.dim * self.mlp_ratio, name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )
        return x


class DecBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, y, cos, sin, cos_y, sin_y):
        x = x + Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(name="norm1")(x), cos, sin
        )
        x = x + CrossAttention(self.dim, self.heads, name="cross_attn")(
            nn.LayerNorm(name="norm2")(x), nn.LayerNorm(name="norm_y")(y),
            cos, sin, cos_y, sin_y,
        )
        x = x + Mlp(self.dim, self.dim * self.mlp_ratio, name="mlp")(
            nn.LayerNorm(name="norm3")(x)
        )
        return x


@dataclass
class Dust3rConfig:
    img_hw: tuple = (224, 224)
    patch: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12


class Dust3rNet(nn.Module):
    cfg: Dust3rConfig

    @nn.compact
    def __call__(self, img1, img2):
        """img: (H,W,3) in [-1,1] (DUSt3R normalizes (x-0.5)/0.5).

        Returns (pts1 (H,W,3), conf1 (H,W), pts2_in_1 (H,W,3), conf2 (H,W)).
        """
        c = self.cfg
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        ys, xs = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")
        pos = jnp.stack([ys.ravel(), xs.ravel()], axis=1).astype(jnp.float32)
        cos_e, sin_e = rope2d_freqs(pos, c.enc_dim // c.enc_heads)
        cos_d, sin_d = rope2d_freqs(pos, c.dec_dim // c.dec_heads)

        patchify = nn.Conv(
            c.enc_dim, (c.patch, c.patch), strides=(c.patch, c.patch),
            padding="VALID", name="patch_embed",
        )
        enc_blocks = [
            EncBlock(c.enc_dim, c.enc_heads, name=f"enc_{i}")
            for i in range(c.enc_depth)
        ]
        enc_norm = nn.LayerNorm(name="enc_norm")

        def encode(img):
            t = patchify(img[None]).reshape(-1, c.enc_dim)
            for blk in enc_blocks:
                t = blk(t, cos_e, sin_e)
            return enc_norm(t)

        t1 = encode(img1)
        t2 = encode(img2)

        dec_embed = nn.Dense(c.dec_dim, name="decoder_embed")
        d1 = dec_embed(t1)
        d2 = dec_embed(t2)
        for i in range(c.dec_depth):
            nd1 = DecBlock(c.dec_dim, c.dec_heads, name=f"dec1_{i}")(
                d1, d2, cos_d, sin_d, cos_d, sin_d
            )
            nd2 = DecBlock(c.dec_dim, c.dec_heads, name=f"dec2_{i}")(
                d2, d1, cos_d, sin_d, cos_d, sin_d
            )
            d1, d2 = nd1, nd2
        dec_norm = nn.LayerNorm(name="dec_norm")  # shared across views
        d1 = dec_norm(d1)
        d2 = dec_norm(d2)

        def head(tokens, name):
            out = nn.Dense(c.patch * c.patch * 4, name=name)(tokens)
            out = out.reshape(h8, w8, c.patch, c.patch, 4)
            out = out.transpose(0, 2, 1, 3, 4).reshape(
                h8 * c.patch, w8 * c.patch, 4
            )
            # DUSt3R post-process: exp-normalized depth-along-ray ("exp" mode)
            pts = out[..., :3]
            d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            pts = pts / jnp.maximum(d, 1e-8) * jnp.expm1(d)
            conf = 1.0 + jnp.exp(out[..., 3])
            return pts, conf

        pts1, conf1 = head(d1, "head1")
        pts2, conf2 = head(d2, "head2")
        return pts1, conf1, pts2, conf2


class Dust3rModel:
    """Two-view reconstruct facade with fixed input size (one jit shape)."""

    def __init__(self, cfg: Dust3rConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or Dust3rConfig()
        self.net = Dust3rNet(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3))
        )
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self._run = jax.jit(
            lambda p, a, b: self.net.apply(p, a, b)
        )

    def load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import dust3r_from_torch_file

            self.params = dust3r_from_torch_file(path, self.params)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(path, self.params)

    def infer_pair(self, img1: np.ndarray, img2: np.ndarray):
        """uint8/float images (H,W[,3]) -> (pts1, conf1, pts2_in_1, conf2)."""
        a = self._prep(img1)
        b = self._prep(img2)
        return tuple(np.asarray(o) for o in self._run(self.params, a, b))

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        h, w = self.cfg.img_hw
        ys = np.clip((np.arange(h) * img.shape[0] / h).astype(int), 0,
                     img.shape[0] - 1)
        xs = np.clip((np.arange(w) * img.shape[1] / w).astype(int), 0,
                     img.shape[1] - 1)
        img = img[ys][:, xs]
        return jnp.asarray((img / 255.0 - 0.5) / 0.5, jnp.float32)
