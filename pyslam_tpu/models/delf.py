"""DELF attention-based local features in flax.

Reference capability: pySLAM ``pyslam/local_features/feature_delf.py``
(wrapping the TF1 tensorflow_models DELF).  The published DELF design,
rebuilt TPU-native:

  * a ResNet trunk (torchvision-layout, models/resnet.py) tapped at
    conv4 provides dense features at stride 16;
  * a 2-layer ATTENTION head (conv 512 relu -> conv 1, softplus) scores
    every location; DELF keypoints are the top-K attention locations,
    mapped to pixel centers via the receptive-field stride;
  * descriptors are the backbone features at the selected locations
    passed through a learned projection (DELF's PCA+whitening step is a
    linear layer here), L2-normalized;
  * multi-scale extraction: the image pyramid is processed in one
    batched forward per level and the per-level keypoints share the
    global top-K (keypoint ``size`` reflects the level's receptive
    field, as the reference exposes via cv2 keypoints).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.models.resnet import BN


@dataclass(frozen=True)
class DELFConfig:
    trunk_ch: tuple = (32, 64, 128)    # 3 stages, stride 4 overall x4 = 16
    attn_ch: int = 64
    desc_dim: int = 40                 # DELF's PCA output dimensionality
    levels: tuple = (1.0, 0.7071)      # image pyramid scales


class DELFTrunk(nn.Module):
    cfg: DELFConfig

    @nn.compact
    def __call__(self, img):  # (H, W) [0,1] -> (H/16, W/16, C)
        x = img[None, ..., None]
        x = nn.Conv(self.cfg.trunk_ch[0], (7, 7), strides=(4, 4),
                    padding="SAME", use_bias=False, name="stem")(x)
        x = nn.relu(BN(self.cfg.trunk_ch[0], name="stem_bn")(x))
        for i, ch in enumerate(self.cfg.trunk_ch[1:]):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, name=f"down{i}")(x)
            x = nn.relu(BN(ch, name=f"down{i}_bn")(x))
            y = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"res{i}a")(x)
            y = nn.relu(BN(ch, name=f"res{i}a_bn")(y))
            y = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"res{i}b")(y)
            x = nn.relu(x + BN(ch, name=f"res{i}b_bn")(y))
        return x[0]


class DELFHead(nn.Module):
    """Attention scores + projected descriptors."""

    cfg: DELFConfig

    @nn.compact
    def __call__(self, feat):  # (h, w, C)
        a = nn.Conv(self.cfg.attn_ch, (1, 1), name="attn1")(feat[None])
        a = nn.relu(a)
        a = nn.Conv(1, (1, 1), name="attn2")(a)
        attn = nn.softplus(a[0, ..., 0])             # (h, w)
        d = nn.Dense(self.cfg.desc_dim, name="pca")(feat)  # learned PCA
        d = d / jnp.maximum(
            jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        return attn, d


class DELFExtractor:
    """DELF keypoints+descriptors with the FeatureData contract."""

    def __init__(self, num_features: int = 1000,
                 cfg: DELFConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or DELFConfig()
        self.num_features = num_features
        self.trunk = DELFTrunk(self.cfg)
        self.head = DELFHead(self.cfg)
        key = jax.random.PRNGKey(0)
        self.trunk_params = self.trunk.init(key, jnp.zeros((64, 64)))
        f0 = self.trunk.apply(self.trunk_params, jnp.zeros((64, 64)))
        self.head_params = self.head.init(key, f0)
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.trunk_params = load_variables_npz(
                checkpoint + ".trunk.npz", self.trunk_params)
            self.head_params = load_variables_npz(
                checkpoint + ".head.npz", self.head_params)
        self.scale_factors = np.array([1.0], np.float32)
        self.sigma2 = np.array([1.0], np.float32)
        self.inv_sigma2 = 1.0 / self.sigma2

        @functools.partial(jax.jit, static_argnames=("n",))
        def _run(trunk_params, head_params, img, n):
            """Multi-level: concatenate per-level candidates, global top-K."""
            H, W = img.shape
            stride = 16.0
            cand = []
            for s in self.cfg.levels:
                h2, w2 = max(int(H * s) // 16 * 16, 32), \
                    max(int(W * s) // 16 * 16, 32)
                im = jax.image.resize(img, (h2, w2), "bilinear")
                feat = self.trunk.apply(trunk_params, im / 255.0)
                attn, desc = self.head.apply(head_params, feat)
                h, w = attn.shape
                ys, xs = jnp.mgrid[0:h, 0:w]
                # receptive-field centers back in original pixels
                px = (xs.ravel() + 0.5) * stride / s
                py = (ys.ravel() + 0.5) * stride / s
                cand.append((attn.ravel(),
                             jnp.stack([px, py], 1),
                             desc.reshape(-1, desc.shape[-1]),
                             jnp.full((h * w,), stride / s)))
            scores = jnp.concatenate([c[0] for c in cand])
            xy = jnp.concatenate([c[1] for c in cand])
            desc = jnp.concatenate([c[2] for c in cand])
            sizes = jnp.concatenate([c[3] for c in cand])
            k = min(n, scores.shape[0])
            v, idx = jax.lax.top_k(scores, k)
            pad = n - k
            xyk = jnp.pad(xy[idx], ((0, pad), (0, 0)))
            return (xyk, jnp.pad(v, (0, pad)),
                    jnp.pad(jnp.ones((k,), bool), (0, pad)),
                    jnp.pad(desc[idx], ((0, pad), (0, 0))),
                    jnp.pad(sizes[idx], (0, pad)))

        self._run = _run

    def __call__(self, img) -> FeatureData:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        xy, resp, valid, desc, sizes = self._run(
            self.trunk_params, self.head_params, jnp.asarray(img),
            self.num_features)
        n = self.num_features
        return FeatureData(
            xy=xy, level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), jnp.float32),
            size=sizes, response=resp, desc=desc, valid=valid)
