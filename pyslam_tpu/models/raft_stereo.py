"""RAFT-class recurrent stereo matching in flax.

The reference exposes RAFT-Stereo / CREStereo as torch inference backends
(pySLAM ``pyslam/depth_estimation/depth_estimator_raft_stereo.py``,
``depth_estimator_crestereo_pytorch.py``).  This is the same algorithmic
family implemented TPU-native: feature encoder at 1/4 resolution, all-pairs
1D correlation volume with a pooled pyramid, iterative ConvGRU updates that
look up correlation around the current disparity, and convex upsampling back
to full resolution.  The iteration is a ``lax.scan`` — the whole N-iteration
inference is one XLA graph.

Everything is differentiable: the model trains in-framework with optax (see
tests/test_raft_stereo.py, which fits a tiny model on synthetic stereo).
Official RAFT-Stereo checkpoints use a 3-level GRU variant; a converter can
target this tree once the exact released configuration is pinned — until
then SGM remains the zero-weights production path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass
class RaftStereoConfig:
    feat_dim: int = 96
    hidden_dim: int = 64
    context_dim: int = 64
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    max_disp: float = 192.0


class ResBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = nn.relu(nn.GroupNorm(num_groups=8, name="gn1")(y))
        y = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = nn.GroupNorm(num_groups=8, name="gn2")(y)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        name="down")(x)
        return nn.relu(x + y)


class Encoder(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):  # (B,H,W,1) -> (B,H/4,W/4,out)
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    name="stem")(x)
        x = nn.relu(x)
        x = ResBlock(32, name="res1")(x)
        x = ResBlock(48, stride=2, name="res2")(x)
        x = ResBlock(64, name="res3")(x)
        return nn.Conv(self.out_dim, (1, 1), name="out")(x)


def corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, levels: int):
    """f1/f2: (H,W,D) quarter-res features -> list of (H, W, W/2^l) volumes."""
    d = f1.shape[-1]
    corr = jnp.einsum("hwd,hvd->hwv", f1, f2) / jnp.sqrt(d)  # (H,W,W)
    pyr = [corr]
    for _ in range(levels - 1):
        h, w, v = pyr[-1].shape
        pyr.append(pyr[-1].reshape(h, w, v // 2, 2).mean(-1))
    return pyr


def lookup(pyr, disp, radius: int):
    """Sample each pyramid level at (x - disp) +- radius (linear interp).

    disp: (H,W) positive disparity. Returns (H,W,levels*(2r+1))."""
    h, w = disp.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    out = []
    for lvl, c in enumerate(pyr):
        scale = 2.0 ** lvl
        center = (xs - disp) / scale
        for r in range(-radius, radius + 1):
            pos = center + r
            x0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, c.shape[2] - 1)
            x1 = jnp.clip(x0 + 1, 0, c.shape[2] - 1)
            f = pos - x0
            rows = jnp.arange(h)[:, None].repeat(w, 1)
            cols = jnp.arange(w)[None, :].repeat(h, 0)
            v0 = c[rows, cols, x0]
            v1 = c[rows, cols, x1]
            out.append(v0 * (1 - f) + v1 * f)
    return jnp.stack(out, axis=-1)


class ConvGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3),
                                   padding=[(1, 1), (1, 1)], name="convz")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3),
                                   padding=[(1, 1), (1, 1)], name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                             name="convq")(
            jnp.concatenate([r * h, x], axis=-1)
        ))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    cfg: RaftStereoConfig

    @nn.compact
    def __call__(self, h, context, corr_feat, disp):
        c = self.cfg
        m = nn.relu(nn.Conv(64, (1, 1), name="convc1")(corr_feat))
        m = nn.relu(nn.Conv(48, (3, 3), padding=[(1, 1), (1, 1)], name="convc2")(m))
        f = nn.relu(nn.Conv(48, (7, 7), padding=[(3, 3), (3, 3)],
                            name="convf1")(disp[..., None]))
        f = nn.relu(nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="convf2")(f))
        motion = jnp.concatenate([m, f, disp[..., None], context], axis=-1)
        h = ConvGRU(c.hidden_dim, name="gru")(h, motion)
        dd = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], name="head1")(h)
        dd = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="head2")(
            nn.relu(dd)
        )[..., 0]
        mask = nn.Conv(16 * 9, (1, 1), name="mask")(h)  # convex upsample x4
        return h, dd, mask


def convex_upsample(disp: jnp.ndarray, mask: jnp.ndarray):
    """disp (H,W) at 1/4 res + mask (H,W,144) -> (4H,4W) full-res disparity."""
    h, w = disp.shape
    m = mask.reshape(h, w, 16, 9)
    m = jax.nn.softmax(m, axis=-1)
    # 3x3 neighborhood of the coarse disparity
    pad = jnp.pad(disp, 1, mode="edge")
    neigh = jnp.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (H,W,9)
    up = jnp.einsum("hwks,hws->hwk", m, neigh)  # (H,W,16)
    up = up.reshape(h, w, 4, 4).transpose(0, 2, 1, 3).reshape(4 * h, 4 * w)
    return up * 4.0  # disparity scales with resolution


class RaftStereoNet(nn.Module):
    cfg: RaftStereoConfig

    @nn.compact
    def __call__(self, left, right):  # (H,W) grayscale in [0,1]
        c = self.cfg
        fnet = Encoder(c.feat_dim, name="fnet")
        f1 = fnet(left[None, ..., None])[0]
        f2 = fnet(right[None, ..., None])[0]
        cnet = Encoder(c.hidden_dim + c.context_dim, name="cnet")
        ctx = cnet(left[None, ..., None])[0]
        h = jnp.tanh(ctx[..., : c.hidden_dim])
        context = nn.relu(ctx[..., c.hidden_dim :])

        pyr = corr_pyramid(f1, f2, c.corr_levels)
        update = UpdateBlock(c, name="update")

        disp = jnp.zeros(f1.shape[:2], jnp.float32)
        outputs = []
        for _ in range(c.iters):
            corr_feat = lookup(pyr, disp, c.corr_radius)
            h, dd, mask = update(h, context, corr_feat, disp)
            disp = jnp.clip(disp + dd, 0.0, c.max_disp / 4.0)
            outputs.append(convex_upsample(disp, mask))
        return outputs[-1], outputs


class RaftStereo:
    """Full-res disparity from a rectified pair; one jitted graph."""

    def __init__(self, cfg: RaftStereoConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or RaftStereoConfig()
        self.net = RaftStereoNet(self.cfg)
        self.params = None
        if checkpoint:
            self.load_checkpoint(checkpoint)

        @jax.jit
        def _run(params, left, right):
            d, _ = self.net.apply(params, left, right)
            return d

        self._run = _run

    def _ensure_params(self, hw):
        if self.params is None:
            self.params = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros(hw), jnp.zeros(hw),
            )

    def load_checkpoint(self, path: str):
        from pyslam_tpu.models.torch_convert import load_variables_npz

        if self.params is None:
            raise RuntimeError("call infer once (or _ensure_params) before load")
        self.params = load_variables_npz(path, self.params)

    def infer(self, left, right) -> np.ndarray:
        left = np.asarray(left, np.float32) / 255.0
        right = np.asarray(right, np.float32) / 255.0
        h, w = left.shape
        h4, w4 = (h // 16) * 16, (w // 16) * 16
        self._ensure_params((h4, w4))
        d = np.asarray(self._run(self.params, jnp.asarray(left[:h4, :w4]),
                                 jnp.asarray(right[:h4, :w4])))
        out = np.zeros((h, w), np.float32)
        out[:h4, :w4] = d
        return out
