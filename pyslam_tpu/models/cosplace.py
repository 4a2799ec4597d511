"""CosPlace / EigenPlaces place-recognition networks in flax.

Reference capability: pySLAM's score-based VPR loop detectors
(``pyslam/loop_closing/loop_detector_vpr.py:241-248``) load
``gmberton/CosPlace`` / ``gmberton/EigenPlaces`` via torch.hub.  Both hub
models share one structure (their ``network.GeoLocalizationNet``):

    backbone (torchvision ResNet trunk, avgpool+fc removed)
    -> L2 normalize across channels
    -> GeM pooling (learnable scalar p, init 3)
    -> Flatten -> Linear(features_dim, fc_output_dim) -> L2 normalize

so one flax module + one converter serves both.  Checkpoints store the
backbone either with torchvision names (``backbone.conv1.weight``,
EigenPlaces) or as a bare Sequential (``backbone.0.weight``, CosPlace);
the converter handles both.  Images are ImageNet-normalized RGB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from pyslam_tpu.models.resnet import ResNet, resnet_from_torch
from pyslam_tpu.models.torch_convert import _np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GeoLocalizationNet(nn.Module):
    """CosPlace/EigenPlaces: ResNet trunk + L2N -> GeM -> Linear -> L2N."""

    arch: str = "resnet50"
    out_dim: int = 512
    gem_eps: float = 1e-6
    width: int = 64

    @nn.compact
    def __call__(self, x):  # (B,H,W,3) ImageNet-normalized
        f = ResNet(arch=self.arch, width=self.width,
                   name="backbone")(x)  # (B,h,w,C)
        f = f / jnp.maximum(
            jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        p = self.param("gem_p", lambda k: jnp.full((1,), 3.0))
        f = jnp.clip(f, self.gem_eps, None) ** p[0]
        f = jnp.mean(f, axis=(1, 2)) ** (1.0 / p[0])  # (B,C)
        f = nn.Dense(self.out_dim, name="fc")(f)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)


def _canonicalize_sequential_backbone(sd):
    """Map 'backbone.N.' Sequential keys onto torchvision resnet names."""
    idx_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            parts = k.split(".")
            if parts[1] in idx_map and not parts[1].startswith("layer"):
                parts[1] = idx_map[parts[1]]
                k = ".".join(parts)
        out[k] = v
    return out


def cosplace_from_torch(state_dict):
    """Convert a CosPlace/EigenPlaces hub checkpoint.

    Returns (variables, arch, out_dim) — arch/out_dim are inferred from the
    tensor shapes so callers can build a matching module.
    """
    sd = dict(state_dict)
    if not any(k.startswith("backbone.conv1") for k in sd):
        sd = _canonicalize_sequential_backbone(sd)
    # locate aggregation pieces: GeM p is the only 1-element tensor; the
    # linear head is the only 2-D weight
    p_key = next(k for k in sd if k.endswith(".p") or k == "gem.p")
    fc_w = next(k for k in sd if np.asarray(_np(sd[k])).ndim == 2
                and k.endswith("weight"))
    fc_b = fc_w.replace("weight", "bias")
    W = _np(sd[fc_w])
    out_dim, feat_dim = W.shape
    # infer arch: feature dim 512 -> resnet18/34 (count layer blocks), 2048
    # -> resnet50/101
    n_l3 = len({k.split(".")[2] for k in sd
                if k.startswith("backbone.layer3.")})
    if feat_dim == 512:
        arch = "resnet18" if n_l3 <= 2 else "resnet34"
    else:
        arch = "resnet50" if n_l3 <= 6 else "resnet101"
    params = {
        "backbone": resnet_from_torch(sd, prefix="backbone."),
        "gem_p": _np(sd[p_key]).reshape(1),
        "fc": {"kernel": W.T, "bias": _np(sd[fc_b])},
    }
    return {"params": params}, arch, out_dim


class CosPlaceExtractor:
    """Whole-image global descriptor for the score-based loop detector
    (same output contract as NetVLADExtractor: float unit-norm vector)."""

    def __init__(self, arch: str = "resnet18", out_dim: int = 512,
                 checkpoint: str | None = None, image_hw=(480, 640)):
        self.image_hw = image_hw
        self.trained = False
        if checkpoint and not str(checkpoint).endswith(".npz"):
            import torch

            sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            self.variables, arch, out_dim = cosplace_from_torch(sd)
            self.net = GeoLocalizationNet(arch=arch, out_dim=out_dim)
            self.trained = True
        else:
            import os

            if checkpoint is None:
                # bundled in-framework-trained tiny checkpoint (procedural
                # places, models/train_cosplace.py) — the zero-egress
                # stand-in for the gmberton/CosPlace hub weights the
                # reference downloads (loop_detector_vpr.py:241-248)
                default = os.path.join(
                    os.path.dirname(__file__), "checkpoints",
                    "cosplace_tiny.npz",
                )
                if os.path.exists(default):
                    checkpoint = default
            width = 64
            if checkpoint:
                meta = np.load(checkpoint)
                arch = str(meta["__arch__"])
                out_dim = int(meta["__out_dim__"])
                width = int(meta["__width__"])
            self.net = GeoLocalizationNet(arch=arch, out_dim=out_dim,
                                          width=width)
            self.variables = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, image_hw[0] // 4, image_hw[1] // 4, 3)))
            if checkpoint:
                from pyslam_tpu.models.torch_convert import load_variables_npz

                self.variables = load_variables_npz(checkpoint, self.variables)
                self.trained = True
        self.out_dim = out_dim

        @jax.jit
        def _run(variables, img):
            return self.net.apply(variables, img)[0]

        self._run = _run

    def __call__(self, img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img / 255.0 if img.max() > 2.0 else img
        img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        # pad/crop to the fixed inference size (static shapes for jit)
        H, W = self.image_hw
        h, w = img.shape[:2]
        canvas = np.zeros((H, W, 3), np.float32)
        canvas[: min(h, H), : min(w, W)] = img[:H, :W]
        return np.asarray(self._run(self.variables, canvas[None]))
