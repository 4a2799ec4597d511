"""DepthPro-class multi-scale ViT monocular metric depth in flax.

Reference capability: pySLAM ``pyslam/depth_estimation/
depth_estimator_depth_pro.py`` (wrapping apple/ml-depth-pro, "Depth Pro:
Sharp Monocular Metric Depth in Less Than a Second").  The published
design, rebuilt TPU-native:

  * the input image is resampled to THREE scales (full, 1/2, 1/4 of the
    working resolution) and each scale is split into overlapping
    ``patch_px`` x ``patch_px`` patches (the 1/4 scale is exactly one
    patch);
  * ONE shared ViT "patch encoder" processes every patch of every scale
    — here as a single batched forward over all patches (one MXU-friendly
    (B, N, D) attention stack), plus a separate "image encoder" ViT pass
    over the whole downsampled image for global context;
  * per-scale feature maps are re-assembled by stitching the patch grids
    (overlaps averaged — seam-free merging);
  * a DPT-style fusion decoder combines image-encoder features (coarsest)
    with the three stitched scales and predicts CANONICAL inverse depth;
  * a FOV head predicts the horizontal field of view from the decoder +
    image-encoder features; metric depth = f_px / (W * canonical_inv_depth)
    with f_px from the predicted FOV (or the calibrated camera if given).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.vggt import _Block


@dataclass(frozen=True)
class DepthProConfig:
    img_px: int = 1536          # working resolution (square)
    patch_px: int = 384         # patch encoder input size
    overlap: float = 0.25       # patch overlap fraction
    vit_patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    features: int = 64          # fusion width


def _patch_positions(S: int, P: int, overlap: float):
    """Evenly spaced patch origins covering [0, S-P] (static, host)."""
    if S <= P:
        return [0]
    stride = int(P * (1.0 - overlap))
    n = int(np.ceil((S - P) / stride)) + 1
    return [int(round(p)) for p in np.linspace(0, S - P, n)]


class PatchViT(nn.Module):
    """Shared ViT over (B, P, P, 3) patches -> (B, g, g, dim) grids."""

    cfg: DepthProConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = c.patch_px // c.vit_patch
        t = nn.Conv(c.dim, (c.vit_patch, c.vit_patch),
                    strides=(c.vit_patch, c.vit_patch), padding="VALID",
                    name="patch_embed")(x)
        B = t.shape[0]
        t = t.reshape(B, g * g, c.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g, c.dim))
        t = t + pos
        for i in range(c.depth):
            t = _Block(c.dim, c.heads, name=f"block_{i}")(t)
        t = nn.LayerNorm(name="norm")(t)
        return t.reshape(B, g, g, c.dim)


class DepthProNet(nn.Module):
    cfg: DepthProConfig

    @nn.compact
    def __call__(self, img):  # (S, S, 3) in [-1, 1], S = cfg.img_px
        c = self.cfg
        S, P = c.img_px, c.patch_px
        g = P // c.vit_patch
        encoder = PatchViT(c, name="patch_encoder")

        # --- multi-scale split (static layout: positions are Python ints)
        scale_imgs = []
        for s in (1, 2, 4):
            size = S // s
            scale_imgs.append(jax.image.resize(
                img, (size, size, 3), "bilinear") if s > 1 else img)

        all_patches, layout = [], []
        for si, im in enumerate(scale_imgs):
            pos = _patch_positions(im.shape[0], P, c.overlap)
            for y0 in pos:
                for x0 in pos:
                    all_patches.append(
                        jax.lax.dynamic_slice(im, (y0, x0, 0), (P, P, 3)))
            layout.append((im.shape[0], pos))
        batch = jnp.stack(all_patches)                 # (B, P, P, 3)

        # --- ONE batched ViT forward for every patch of every scale,
        # plus the global image encoder pass (the 1/4 image == one patch)
        feats = encoder(batch)                         # (B, g, g, dim)
        img_global = jax.image.resize(img, (P, P, 3), "bilinear")
        glob = PatchViT(c, name="image_encoder")(img_global[None])[0]

        # --- stitch each scale's patch grids (average the overlaps)
        def stitch(feat_list, size, pos):
            gs = size // c.vit_patch              # stitched grid side
            pg = [p // c.vit_patch for p in pos]  # patch origins in grid
            acc = jnp.zeros((gs, gs, c.dim))
            wacc = jnp.zeros((gs, gs, 1))
            i = 0
            for gy in pg:                 # static python ints -> fused adds
                for gx in pg:
                    acc = acc.at[gy:gy + g, gx:gx + g].add(feat_list[i])
                    wacc = wacc.at[gy:gy + g, gx:gx + g].add(1.0)
                    i += 1
            return acc / jnp.maximum(wacc, 1.0)

        stitched, off = [], 0
        for size, pos in layout:
            n = len(pos) ** 2
            stitched.append(stitch([feats[off + i] for i in range(n)],
                                   size, pos))
            off += n
        hi, mid, low = stitched       # grids: S/16, S/32, S/64

        # --- DPT fusion decoder (coarse -> fine)
        from pyslam_tpu.models.depth_anything_v2 import FusionBlock

        def proj(x, name):
            return nn.Conv(c.features, (1, 1), name=name)(x[None])

        f_glob = proj(glob, "proj_glob")              # S/64 grid
        f_low = proj(low, "proj_low")
        f_mid = proj(mid, "proj_mid")
        f_hi = proj(hi, "proj_hi")

        p4 = FusionBlock(c.features, name="refine4")(
            f_glob, f_low, out_hw=f_mid.shape[1:3])
        p3 = FusionBlock(c.features, name="refine3")(
            p4, f_mid, out_hw=f_hi.shape[1:3])
        p2 = FusionBlock(c.features, name="refine2")(p3, f_hi)  # S/8

        y = nn.Conv(c.features // 2, (3, 3), padding="SAME",
                    name="head_conv1")(p2)
        y = jax.image.resize(y, (1, S, S, y.shape[-1]), "bilinear")
        y = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(y))
        y = nn.Conv(1, (1, 1), name="head_out")(y)
        canonical_inv = nn.softplus(y[0, ..., 0])     # (S, S)

        # --- FOV head: global pooled image-encoder + decoder features
        fhead = jnp.concatenate(
            [glob.mean(axis=(0, 1)), p2[0].mean(axis=(0, 1))])
        fov = nn.Dense(64, name="fov_fc1")(fhead)
        fov = nn.gelu(fov, approximate=False)
        fov = nn.Dense(1, name="fov_fc2")(fov)[0]
        fov_deg = 30.0 + 60.0 * jax.nn.sigmoid(fov)   # plausible range
        return canonical_inv, fov_deg


class DepthPro:
    """Image -> (metric depth, fov_deg), one jitted graph."""

    def __init__(self, cfg: DepthProConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or DepthProConfig()
        self.net = DepthProNet(self.cfg)
        S = self.cfg.img_px
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((S, S, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    def infer(self, img, f_px: float | None = None):
        """(H, W[,3]) [0,255] -> (metric depth (H,W), f_px estimate).

        ``f_px`` (focal in pixels at the ORIGINAL width) overrides the
        FOV-head estimate when the camera is calibrated."""
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
        x = (x - 0.5) / 0.5
        cinv, fov_deg = self._run(self.params, jnp.asarray(x, jnp.float32))
        cinv = np.asarray(cinv)
        fov_deg = float(fov_deg)
        if f_px is None:
            f_px = 0.5 * W / np.tan(0.5 * np.radians(fov_deg))
        # canonical inverse depth -> metric: d = f_px / (W * c_inv)
        inv = cinv * (W / f_px)
        depth = 1.0 / np.maximum(inv, 1e-4)
        ys = np.clip((np.arange(H) * S / H).astype(int), 0, S - 1)
        xs = np.clip((np.arange(W) * S / W).astype(int), 0, S - 1)
        return depth[np.ix_(ys, xs)].astype(np.float32), f_px
