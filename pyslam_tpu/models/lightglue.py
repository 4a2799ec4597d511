"""LightGlue-class attention matcher in flax.

Follows the published LightGlue design (self + cross attention over keypoint
descriptors with rotary 2D positional encoding, matchability head, dual-
softmax partial assignment; reference wrapper: pySLAM
``pyslam/local_features/feature_lightglue*``): the whole matcher is one
jitted fixed-shape XLA graph — (N,256)x(M,256) descriptors in, match indices
out — with attention matmuls on the MXU.

Weights: ``lightglue_from_torch`` in ``models/torch_convert.py`` maps a torch
state_dict of the same architecture onto this tree (parity-tested against a
torch twin in tests/test_lightglue.py).  Random-init works for smoke paths;
real matching quality needs converted official weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def rotary_embed(xy: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """2D rotary frequencies: (N,2) coords x (2,F) learned projection ->
    (N,F) angles."""
    return xy @ w


def apply_rotary(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate feature pairs by per-position angles.  x: (H,N,D), theta:
    (N,D/2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


class Attention(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x, source, theta_x=None, theta_s=None, mask=None):
        """x attends to source. (N,D) x (M,D) -> (N,D) message."""
        d = self.dim
        hd = d // self.heads
        q = nn.Dense(d, name="to_q")(x).reshape(-1, self.heads, hd).transpose(1, 0, 2)
        k = nn.Dense(d, name="to_k")(source).reshape(-1, self.heads, hd).transpose(1, 0, 2)
        v = nn.Dense(d, name="to_v")(source).reshape(-1, self.heads, hd).transpose(1, 0, 2)
        if theta_x is not None:
            q = apply_rotary(q, theta_x)
            k = apply_rotary(k, theta_s)
        att = jnp.einsum("hnd,hmd->hnm", q, k) / jnp.sqrt(hd)
        if mask is not None:
            att = jnp.where(mask[None, None, :], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        msg = jnp.einsum("hnm,hmd->hnd", att, v)
        msg = msg.transpose(1, 0, 2).reshape(-1, d)
        return nn.Dense(d, name="to_out")(msg)


class GlueLayer(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x0, x1, th0, th1, m0, m1):
        # self attention (rotary position)
        sa = Attention(self.dim, self.heads, name="self_attn")
        msg0 = sa(x0, x0, th0, th0, m0)
        msg1 = sa(x1, x1, th1, th1, m1)

        def ffn(x, msg, name):
            h = jnp.concatenate([x, msg], axis=-1)
            h = nn.Dense(2 * self.dim, name=f"{name}_fc1")(h)
            h = nn.LayerNorm(name=f"{name}_ln")(h)
            h = nn.gelu(h, approximate=False)
            return x + nn.Dense(self.dim, name=f"{name}_fc2")(h)

        x0 = ffn(x0, msg0, "self_ffn0")
        x1 = ffn(x1, msg1, "self_ffn1")

        # cross attention (no positions across images)
        ca = Attention(self.dim, self.heads, name="cross_attn")
        msg0 = ca(x0, x1, None, None, m1)
        msg1 = ca(x1, x0, None, None, m0)
        x0 = ffn(x0, msg0, "cross_ffn0")
        x1 = ffn(x1, msg1, "cross_ffn1")
        return x0, x1


class LightGlueNet(nn.Module):
    dim: int = 256
    layers: int = 9
    heads: int = 4
    input_dim: int = 256

    @nn.compact
    def __call__(self, desc0, xy0, m0, desc1, xy1, m1, return_aux=False):
        """Returns (scores (N,M) log-assignment, sim matrix); with
        ``return_aux`` also the per-keypoint matchability logits (the
        training loss needs them, LightGlue eq. 10)."""
        inp = nn.Dense(self.dim, name="input_proj")  # shared across images
        x0 = inp(desc0)
        x1 = inp(desc1)
        hd = self.dim // self.heads
        wr = self.param("rotary_w", nn.initializers.normal(1.0), (2, hd // 2))
        th0 = rotary_embed(xy0, wr)
        th1 = rotary_embed(xy1, wr)

        for i in range(self.layers):
            x0, x1 = GlueLayer(self.dim, self.heads, name=f"layer_{i}")(
                x0, x1, th0, th1, m0, m1
            )

        fin = nn.Dense(self.dim, name="final_proj")    # shared
        mat = nn.Dense(1, name="matchability")         # shared
        f0, f1 = fin(x0), fin(x1)
        sim = (f0 @ f1.T) / (self.dim ** 0.25)
        sig0 = mat(x0)[:, 0]
        sig1 = mat(x1)[:, 0]

        # dual-softmax partial assignment with matchability (LightGlue eq. 8)
        big_neg = -1e9
        sim = jnp.where(m0[:, None] & m1[None, :], sim, big_neg)
        z0 = jax.nn.log_softmax(sim, axis=1)
        z1 = jax.nn.log_softmax(sim, axis=0)
        la0 = jax.nn.log_sigmoid(sig0)
        la1 = jax.nn.log_sigmoid(sig1)
        scores = la0[:, None] + la1[None, :] + z0 + z1
        if return_aux:
            return scores, sim, sig0, sig1
        return scores, sim


class LightGlueMatcher:
    """Fixed-shape matcher facade: (FeatureData, FeatureData) -> indices."""

    def __init__(self, dim: int = 256, layers: int = 9, input_dim: int = 256,
                 threshold: float = 0.1, checkpoint: str | None = None):
        self.trained = False
        if checkpoint is None:
            # bundled in-framework-trained checkpoint (ambiguous-descriptor
            # homography pairs, models/train_lightglue.py) — the zero-egress
            # stand-in for the official weights the reference downloads
            # (pyslam feature_lightglue wrappers).  The npz stores its own
            # architecture dims; adopt them when the input_dim matches.
            import os

            default = os.path.join(
                os.path.dirname(__file__), "checkpoints", "lightglue_tiny.npz"
            )
            if os.path.exists(default):
                meta = np.load(default)
                if int(meta["__input_dim__"]) == input_dim:
                    dim = int(meta["__dim__"])
                    layers = int(meta["__layers__"])
                    checkpoint = default
                    self.trained = True
        self.net = LightGlueNet(dim=dim, layers=layers, input_dim=input_dim)
        n = 32
        self.params = self.net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((n, input_dim)), jnp.zeros((n, 2)), jnp.ones((n,), bool),
            jnp.zeros((n, input_dim)), jnp.zeros((n, 2)), jnp.ones((n,), bool),
        )
        self.threshold = threshold
        if checkpoint:
            self.load_checkpoint(checkpoint)

        @jax.jit
        def _run(params, d0, xy0, m0, d1, xy1, m1, wh):
            # normalize coords to [-1,1] (LightGlue normalizes by image size)
            c = wh / 2.0
            n0 = (xy0 - c) / jnp.max(c)
            n1 = (xy1 - c) / jnp.max(c)
            scores, _ = self.net.apply(params, d0, n0, m0, d1, n1, m1)
            p = jnp.exp(scores)
            best1 = jnp.argmax(p, axis=1)
            best0 = jnp.argmax(p, axis=0)
            mutual = best0[best1] == jnp.arange(p.shape[0])
            conf = jnp.max(p, axis=1)
            idx = jnp.where(
                mutual & (conf > self.threshold) & m0, best1, -1
            ).astype(jnp.int32)
            return idx, conf

        self._run = _run

    def load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            from pyslam_tpu.models.torch_convert import lightglue_from_torch_file

            self.params = lightglue_from_torch_file(path, self.params)
        else:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(path, self.params)

    def match(self, f0, f1, image_wh=(640.0, 480.0)):
        idx, conf = self._run(
            self.params,
            jnp.asarray(f0.desc, jnp.float32), jnp.asarray(f0.xy, jnp.float32),
            jnp.asarray(f0.valid),
            jnp.asarray(f1.desc, jnp.float32), jnp.asarray(f1.xy, jnp.float32),
            jnp.asarray(f1.valid),
            jnp.asarray(image_wh, jnp.float32),
        )
        return np.asarray(idx), np.asarray(conf)
