"""ContextDesc (context-augmented local descriptors) in flax.

Reference capability: pySLAM ``pyslam/local_features/
feature_contextdesc.py`` wrapping the TF1 lzx551402/contextdesc.  The
published three-tower design, rebuilt TPU-native:

  * LOCAL tower: the GeoDesc patch network (models/patch_descriptors
    .GeoDesc) over oriented 32x32 patches -> raw 128-d descriptors, plus
    a MATCHABILITY head on the conv5 feature map (conv8x8-VALID 128 ->
    1x1 32 -> 1x1 32 -> 1 -> fc -> tanh; reference cnn_wrapper/augdesc
    MatchabilityPrediction);
  * REGIONAL tower: a small conv encoder over the full image produces a
    grid of regional features (the reference uses a ResNet; the role is
    the retrieval-style visual context);
  * VISUAL context: regional grid -> 1x1 convs with CONTEXT
    NORMALIZATION (moments over the token set) -> 3-NN inverse-distance
    interpolation at the keypoints -> concat with local -> MLP
    [512, 256, 128] (reference augdesc VisualContext);
  * GEOMETRIC context: [matchability, kpt_xy] tokens through 4 residual
    context-normalization blocks -> 128 (reference
    LightContextNormalization);
  * output = l2norm(local + visual + geometric)   (reference AugModel).

Everything after patch extraction is a batch of dense matmuls over the
keypoint set — one jitted dispatch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.patch_descriptors import GeoDesc, _BN
from pyslam_tpu.ops.patches import extract_oriented_patches


@dataclass(frozen=True)
class ContextDescConfig:
    reg_dim: int = 128       # regional grid feature channels
    vis_dims: tuple = (256, 128)   # context-normalized 1x1 conv widths
    fuse_dims: tuple = (512, 256, 128)
    geo_dim: int = 128


def _context_norm(x, eps=1e-5):
    """Normalize over the token (keypoint/grid) axis, per channel."""
    mu = x.mean(axis=0, keepdims=True)
    sd = x.std(axis=0, keepdims=True)
    return (x - mu) / (sd + eps)


class MatchabilityHead(nn.Module):
    @nn.compact
    def __call__(self, inter):  # (N, 8, 8, 128) GeoDesc conv5
        x = nn.Conv(128, (8, 8), padding="VALID", use_bias=False,
                    name="kpt_m_conv0")(inter)
        x = nn.relu(_BN(128, affine=True, name="kpt_m_bn0")(x))
        x = nn.relu(nn.Conv(32, (1, 1), name="kpt_m_conv1")(x))
        x = nn.relu(nn.Conv(32, (1, 1), name="kpt_m_conv2")(x))
        x = nn.Conv(1, (1, 1), name="kpt_m")(x)
        x = nn.Dense(1, name="fc")(x.reshape(x.shape[0], -1))
        return jnp.tanh(x[:, 0])          # (N,)


class RegionalEncoder(nn.Module):
    cfg: ContextDescConfig

    @nn.compact
    def __call__(self, img):  # (H, W) [0,1] -> (h, w, reg_dim) stride 16
        x = img[None, ..., None]
        for i, ch in enumerate((32, 64, 128, self.cfg.reg_dim)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        return x[0]


class VisualContext(nn.Module):
    cfg: ContextDescConfig

    @nn.compact
    def __call__(self, grid_feat, grid_xy, local, kpt_xy):
        """grid_feat (G, D), grid_xy (G, 2) in [-1,1], local (N, 128),
        kpt_xy (N, 2) in [-1, 1]."""
        c = self.cfg
        x = grid_feat
        for i, d in enumerate(c.vis_dims):
            x = nn.Dense(d, name=f"conv{i + 1}")(x)
            x = _context_norm(x)
            x = nn.relu(nn.LayerNorm(name=f"conv{i + 1}_bn")(x))
        # 3-NN inverse-distance interpolation at the keypoints
        d2 = ((kpt_xy[:, None] - grid_xy[None]) ** 2).sum(-1)
        dist = jnp.sqrt(d2 + 1e-6)
        nd, idx = jax.lax.top_k(-dist, 3)            # (N, 3)
        w = 1.0 / jnp.maximum(-nd, 1e-10)
        w = w / w.sum(axis=1, keepdims=True)
        inter = (x[idx] * w[..., None]).sum(axis=1)  # (N, vis_dims[-1])
        y = jnp.concatenate([inter, local], axis=-1)
        for i, d in enumerate(c.fuse_dims):
            y = nn.Dense(d, name=f"fuse_photo_context_{i}")(y)
            if i < len(c.fuse_dims) - 1:
                y = nn.relu(y)
        return y


class GeoContext(nn.Module):
    """4 residual context-normalization blocks over [kpt_m, kpt_xy]."""

    cfg: ContextDescConfig

    @nn.compact
    def __call__(self, kpt_m, kpt_xy):  # (N,), (N, 2)
        c = self.cfg
        pts = jnp.concatenate([kpt_m[:, None], kpt_xy], axis=-1)
        x = nn.Dense(c.geo_dim, name="dim_control")(pts)
        for i in range(4):
            y = _context_norm(x)
            y = nn.relu(nn.LayerNorm(name=f"cn{i + 1}_bn")(y))
            y = nn.Dense(c.geo_dim, name=f"cn{i + 1}_conv")(y)
            x = x + y
        return nn.Dense(c.geo_dim, name="context_trans")(x)


class ContextDescExtractor:
    """Descriptor-augmentation stage: re-describe any detector's
    keypoints (the reference runs it over SIFT keypoints)."""

    def __init__(self, cfg: ContextDescConfig | None = None,
                 checkpoint: str | None = None, rng_seed: int = 0):
        self.cfg = cfg or ContextDescConfig()
        self.local = GeoDesc()
        self.mb_head = MatchabilityHead()
        self.regional = RegionalEncoder(self.cfg)
        self.vis = VisualContext(self.cfg)
        self.geo = GeoContext(self.cfg)
        key = jax.random.PRNGKey(rng_seed)
        p0 = jnp.zeros((2, 32, 32))
        self.local_params = self.local.init(key, p0)
        _, inter0 = self.local.apply(self.local_params, p0,
                                     return_inter=True)
        self.mb_params = self.mb_head.init(key, inter0)
        self.reg_params = self.regional.init(key, jnp.zeros((64, 64)))
        g0 = self.regional.apply(self.reg_params, jnp.zeros((64, 64)))
        g0f = g0.reshape(-1, g0.shape[-1])
        xy0 = jnp.zeros((g0f.shape[0], 2))
        self.vis_params = self.vis.init(
            key, g0f, xy0, jnp.zeros((2, 128)), jnp.zeros((2, 2)))
        self.geo_params = self.geo.init(
            key, jnp.zeros((2,)), jnp.zeros((2, 2)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            for name in ("local", "mb", "reg", "vis", "geo"):
                setattr(self, f"{name}_params", load_variables_npz(
                    f"{checkpoint}.{name}.npz",
                    getattr(self, f"{name}_params")))

        @jax.jit
        def _describe(params, img, xys, sizes, angles):
            lp, mp, rp, vp, gp = params
            H, W = img.shape
            patches = extract_oriented_patches(
                img / 255.0, xys, sizes, angles, patch_size=32,
                mag_factor=3.0)
            local, inter = self.local.apply(lp, patches, return_inter=True)
            kpt_m = self.mb_head.apply(mp, inter)
            grid = self.regional.apply(rp, img / 255.0)
            h, w = grid.shape[:2]
            gy, gx = jnp.mgrid[0:h, 0:w]
            grid_xy = jnp.stack(
                [2.0 * (gx.ravel() + 0.5) / w - 1.0,
                 2.0 * (gy.ravel() + 0.5) / h - 1.0], axis=1)
            kxy = jnp.stack([2.0 * xys[:, 0] / W - 1.0,
                             2.0 * xys[:, 1] / H - 1.0], axis=1)
            visf = self.vis.apply(vp, grid.reshape(-1, grid.shape[-1]),
                                  grid_xy, local, kxy)
            geof = self.geo.apply(gp, kpt_m, kxy)
            out = local + visf + geof
            out = out / jnp.sqrt((out * out).sum(1, keepdims=True) + 1e-10)
            return out, kpt_m

        self._describe = _describe

    def compute(self, img: np.ndarray, xys, sizes, angles) -> np.ndarray:
        """img (H, W); returns (N, 128) augmented descriptors."""
        if len(xys) == 0:
            return np.zeros((0, 128), np.float32)
        params = (self.local_params, self.mb_params, self.reg_params,
                  self.vis_params, self.geo_params)
        out, _ = self._describe(
            params, jnp.asarray(img, jnp.float32),
            jnp.asarray(xys, jnp.float32), jnp.asarray(sizes, jnp.float32),
            jnp.asarray(angles, jnp.float32))
        return np.asarray(out)
