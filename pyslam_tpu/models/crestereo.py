"""CREStereo-class cascaded recurrent stereo in flax.

Reference capability: pySLAM's DEPTH_CRESTEREO_MEGENGINE /
DEPTH_CRESTEREO_PYTORCH estimators
(``pyslam/depth_estimation/depth_estimator_crestereo_*.py`` wrapping
megvii-research/CREStereo).  The architecture keeps CREStereo's defining
structure — a **cascade over resolutions** with **adaptive group
correlation**:

  * shared feature encoder (reuses the RAFT-stereo ResBlock encoder) run
    on a 2-level image pyramid (1/8 and 1/4 working resolutions here);
  * ADAPTIVE GROUP CORRELATION: channels are split into G groups; local
    correlation is computed per group over a (2r+1) search window with
    content-predicted per-pixel OFFSETS added to the search positions
    (the deformable ingredient of CREStereo's AGCL);
  * recurrent ConvGRU update iterations at each cascade level (coarse
    level initializes from zero, finer levels from 2x-upsampled coarser
    disparity), with the correlation re-looked-up at the current
    disparity each iteration;
  * final convex upsampling to full resolution (RAFT-style mask head).

Differentiable end-to-end; shares ConvGRU/encoder blocks with
models/raft_stereo.py, so in-framework training works the same way.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.raft_stereo import ConvGRU, Encoder, convex_upsample


@dataclass
class CREStereoConfig:
    feat_dim: int = 96
    hidden_dim: int = 96
    groups: int = 4
    radius: int = 4
    iters_coarse: int = 4
    iters_fine: int = 4
    max_disp: float = 192.0


def _group_corr_window(f1, f2, disp, offsets, radius, groups):
    """Adaptive group correlation over a local window.

    f1, f2: (H, W, C); disp: (H, W) current disparity (positive = left
    shift); offsets: (H, W, G) per-group learned offset added to the
    window center.  Returns (H, W, G*(2r+1)) correlation features.
    """
    H, W, C = f1.shape
    gch = C // groups
    f1g = f1.reshape(H, W, groups, gch)
    f2g = f2.reshape(H, W, groups, gch)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    out = []
    for dx in range(-radius, radius + 1):
        # sample f2 at x - disp + dx + offset_g (bilinear along x, per group)
        pos = xs[..., None] - disp[..., None] + dx + offsets  # (H,W,G)
        x0 = jnp.floor(pos)
        a = pos - x0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        rows = jnp.arange(H)[:, None, None]
        g_idx = jnp.arange(groups)[None, None, :]
        s0 = f2g[rows, x0i, g_idx]  # (H,W,G,gch)
        s1 = f2g[rows, x1i, g_idx]
        samp = s0 * (1 - a[..., None]) + s1 * a[..., None]
        corr = (f1g * samp).mean(axis=-1) / np.sqrt(gch)  # (H,W,G)
        out.append(corr)
    return jnp.concatenate(out, axis=-1)  # (H,W,(2r+1)*G)


class AGCLUpdate(nn.Module):
    """One cascade level: offset head + iterative GRU refinement."""

    cfg: CREStereoConfig
    iters: int

    @nn.compact
    def __call__(self, f1, f2, context, h, disp):
        c = self.cfg
        offset_head = nn.Conv(c.groups, (3, 3), padding=[(1, 1), (1, 1)],
                              name="offset_head")
        corr_enc = nn.Conv(64, (1, 1), name="corr_enc")
        disp_enc = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                           name="disp_enc")
        gru = ConvGRU(c.hidden_dim, name="gru")
        delta_head = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                             name="delta_head")

        for _ in range(self.iters):
            offsets = jnp.tanh(offset_head(context)) * 2.0  # bounded offsets
            corr = _group_corr_window(f1, f2, disp, offsets,
                                      c.radius, c.groups)
            cf = nn.relu(corr_enc(corr))
            df = nn.relu(disp_enc(disp[..., None]))
            x = jnp.concatenate([cf, df, context], axis=-1)
            h = gru(h, x)
            delta = delta_head(h)[..., 0]
            disp = disp + delta
            disp = jnp.clip(disp, 0.0, c.max_disp)
        return h, disp


class CREStereoNet(nn.Module):
    cfg: CREStereoConfig

    @nn.compact
    def __call__(self, left, right):  # (H,W) grayscale in [0,1]
        c = self.cfg
        H, W = left.shape
        feat = Encoder(c.feat_dim, name="fnet")
        ctx = Encoder(c.hidden_dim + c.hidden_dim, name="cnet")

        l4 = feat(left[None, ..., None])[0]    # (H/4, W/4, C)
        r4 = feat(right[None, ..., None])[0]
        ctx4_full = ctx(left[None, ..., None])[0]
        ctx4, h4 = jnp.split(ctx4_full, 2, axis=-1)
        ctx4 = nn.relu(ctx4)
        h4 = jnp.tanh(h4)

        def down2(x):
            return nn.avg_pool(x[None], (2, 2), strides=(2, 2))[0]

        l8, r8, ctx8, h8 = down2(l4), down2(r4), down2(ctx4), down2(h4)

        # cascade: coarse (1/8) -> fine (1/4), shared level module weights
        level = AGCLUpdate(c, c.iters_coarse, name="level_coarse")
        disp8 = jnp.zeros(l8.shape[:2])
        h8, disp8 = level(l8, r8, ctx8, h8, disp8)

        disp4_init = 2.0 * jax.image.resize(disp8, l4.shape[:2], "bilinear")
        fine = AGCLUpdate(c, c.iters_fine, name="level_fine")
        h4, disp4 = fine(l4, r4, ctx4, h4, disp4_init)

        mask = nn.Conv(16 * 9, (3, 3), padding=[(1, 1), (1, 1)],
                       name="up_mask")(h4)
        disp = convex_upsample(disp4, mask)  # scales x4 internally
        return disp[:H, :W]


class CREStereo:
    """Stereo disparity facade (same surface as RaftStereo)."""

    def __init__(self, cfg: CREStereoConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or CREStereoConfig()
        self.net = CREStereoNet(self.cfg)
        self.params = None
        self._run = None

    def _ensure_params(self, hw):
        if self._run is None:
            h = ((hw[0] + 7) // 8) * 8
            w = ((hw[1] + 7) // 8) * 8
            self._hw = (h, w)
            self.params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((h, w)), jnp.zeros((h, w)))
            self._run = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def infer(self, left, right) -> np.ndarray:
        left = np.asarray(left, np.float32)
        right = np.asarray(right, np.float32)
        if left.ndim == 3:
            left, right = left.mean(-1), right.mean(-1)
        if left.max() > 2.0:
            left, right = left / 255.0, right / 255.0
        self._ensure_params(left.shape)
        h, w = self._hw
        L = np.zeros((h, w), np.float32)
        R = np.zeros((h, w), np.float32)
        L[:left.shape[0], :left.shape[1]] = left
        R[:right.shape[0], :right.shape[1]] = right
        disp = np.asarray(self._run(self.params, jnp.asarray(L),
                                    jnp.asarray(R)))
        return disp[:left.shape[0], :left.shape[1]]
