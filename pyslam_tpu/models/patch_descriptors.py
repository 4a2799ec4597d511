"""Patch-descriptor networks (HardNet / SOSNet / L2Net / TFeat) in flax.

Faithful re-implementations of the architectures the reference wraps
(pySLAM ``pyslam/local_features/feature_hardnet.py:64-110`` HardNet,
``feature_l2net.py:70-113`` L2Net, ``feature_sosnet.py`` SOSNet(32x32),
``feature_tfeat.py`` + thirdparty tfeat TNet), so official checkpoints
convert directly (converters below, parity-tested against torch twins in
``tests/test_patch_descriptors.py``).

All four consume 32x32 grayscale patches extracted around keypoints with
``pyslam_tpu.ops.patches.extract_oriented_patches`` (the reference's
``extract_patches_array``, ``pyslam/utilities/features.py:754``), and are
batched over the whole frame's keypoints — one MXU-friendly forward pass
replaces the reference's per-frame torch call.

Architecture notes (kept exactly as upstream):
  * HardNet:  7x [conv3x3 no-bias -> BN(affine=False) -> ReLU] backbone with
    strides (1,1,2,1,2,1) then conv8x8 -> BN; per-patch input norm uses the
    *unbiased* std (torch.std); final L2 normalization.
  * L2Net (as defined in the reference wrapper): same topology but convs
    have bias and BN is affine with eps=1e-10.
  * SOSNet(32x32): HardNet topology with an InstanceNorm input (biased
    variance), BN(affine=False), final L2 norm.
  * TFeat TNet: InstanceNorm input -> conv7x7/32 -> tanh -> maxpool2 ->
    conv6x6/64 -> tanh -> FC(64*8*8 -> 128) -> tanh.  NOT L2-normalized
    (reference max distance 11, feature_types.py:189).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.torch_convert import _np, _t2f_conv


def _input_norm_unbiased(x: jnp.ndarray) -> jnp.ndarray:
    """HardNet.input_norm: per-patch (x-mean)/(std+1e-7), unbiased std."""
    flat = x.reshape(x.shape[0], -1)
    mean = flat.mean(axis=1)
    n = flat.shape[1]
    var = ((flat - mean[:, None]) ** 2).sum(axis=1) / (n - 1)
    std = jnp.sqrt(var) + 1e-7
    return (x - mean[:, None, None, None]) / std[:, None, None, None]


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): per-patch biased normalization."""
    flat = x.reshape(x.shape[0], -1)
    mean = flat.mean(axis=1)
    var = flat.var(axis=1)
    return (x - mean[:, None, None, None]) / jnp.sqrt(var + eps)[:, None, None, None]


class _BN(nn.Module):
    """Inference-mode BatchNorm with running statistics (torch layout)."""

    features: int
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * w + b
        return y


_BACKBONE = [  # (out_ch, kernel, stride, padding)
    (32, 3, 1, 1),
    (32, 3, 1, 1),
    (64, 3, 2, 1),
    (64, 3, 1, 1),
    (128, 3, 2, 1),
    (128, 3, 1, 1),
    (128, 8, 1, 0),
]


class _L2NetBackbone(nn.Module):
    """Shared 7-conv backbone; bias/affine/eps differ per model."""

    use_bias: bool
    bn_affine: bool
    bn_eps: float

    @nn.compact
    def __call__(self, x):  # x: (N, H, W, 1)
        for i, (ch, k, s, p) in enumerate(_BACKBONE):
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=[(p, p), (p, p)], use_bias=self.use_bias,
                        name=f"conv{i}")(x)
            x = _BN(ch, affine=self.bn_affine, eps=self.bn_eps, name=f"bn{i}")(x)
            if i < len(_BACKBONE) - 1:
                x = nn.relu(x)
        return x.reshape(x.shape[0], -1)  # (N, 128)


class HardNet(nn.Module):
    """HardNet (feature_hardnet.py:64): input_norm -> backbone -> L2."""

    @nn.compact
    def __call__(self, patches):  # (N, 32, 32) float
        x = patches[..., None]
        x = _input_norm_unbiased(x)
        d = _L2NetBackbone(use_bias=False, bn_affine=False, bn_eps=1e-5,
                           name="features")(x)
        return d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)


class L2Net(nn.Module):
    """L2Net as in the reference wrapper (feature_l2net.py:70-113)."""

    @nn.compact
    def __call__(self, patches):
        x = patches[..., None]
        x = _input_norm_unbiased(x)
        d = _L2NetBackbone(use_bias=True, bn_affine=True, bn_eps=1e-10,
                           name="features")(x)
        return d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)


class SOSNet(nn.Module):
    """SOSNet 32x32 (feature_sosnet.py; official sosnet repo layout)."""

    @nn.compact
    def __call__(self, patches):
        x = patches[..., None]
        x = _instance_norm(x)
        d = _L2NetBackbone(use_bias=False, bn_affine=False, bn_eps=1e-5,
                           name="features")(x)
        return d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)


class TFeat(nn.Module):
    """TFeat TNet (feature_tfeat.py; thirdparty/tfeat tfeat_model.TNet)."""

    @nn.compact
    def __call__(self, patches):  # (N, 32, 32)
        x = patches[..., None]
        x = _instance_norm(x)
        x = nn.Conv(32, (7, 7), padding="VALID", name="conv0")(x)  # -> 26
        x = jnp.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # -> 13
        x = nn.Conv(64, (6, 6), padding="VALID", name="conv1")(x)  # -> 8
        x = jnp.tanh(x)
        # torch flattens NCHW: (N, C, H, W) -> (N, C*H*W); transpose to match
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dense(128, name="fc")(x)
        return jnp.tanh(x)


class GeoDesc(nn.Module):
    """GeoDesc tower (reference thirdparty/contextdesc cnn_wrapper
    descnet.py GeoDesc; wrapper feature_geodesc.py): per-patch
    standardization, 6 conv-BN-relu layers (32,32,64s2,64,128s2,128),
    a bias-free 8x8 VALID conv to 128 and L2 normalization."""

    @nn.compact
    def __call__(self, patches, return_inter: bool = False):  # (N, 32, 32)
        x = patches[..., None]
        x = _instance_norm(x)                        # per-patch moments norm
        chans = ((32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1))
        for i, (ch, s) in enumerate(chans):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding="SAME",
                        use_bias=False, name=f"conv{i}")(x)
            x = _BN(ch, affine=True, eps=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        inter = x                                    # conv5: (N, 8, 8, 128)
        x = nn.Conv(128, (8, 8), padding="VALID", use_bias=False,
                    name="conv6")(x)                 # (N, 1, 1, 128)
        d = x.reshape(x.shape[0], -1)
        d = d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)
        return (d, inter) if return_inter else d


class LogPolarDesc(nn.Module):
    """Log-polar descriptor net ("Beyond Cartesian Representations";
    reference wrapper feature_logpolar.py): HardNet-style tower over
    LOG-POLAR sampled patches (ops/patches.extract_log_polar_patches) —
    rotation becomes a cyclic column shift of the input."""

    @nn.compact
    def __call__(self, patches):  # (N, 32, 32) log-polar layout
        x = patches[..., None]
        x = _input_norm_unbiased(x)
        d = _L2NetBackbone(use_bias=False, bn_affine=False, bn_eps=1e-5,
                           name="features")(x)
        return d / jnp.sqrt((d * d).sum(axis=1, keepdims=True) + 1e-10)


# --------------------------------------------------------------- converters
def _backbone_from_torch(sd, prefix="features", with_bias=False,
                         with_affine=False):
    """Map a torch Sequential L2Net backbone onto _L2NetBackbone params.

    Torch Sequential indices: conv/bn pairs interleaved with ReLU (and one
    Dropout before the final conv), exactly as in feature_hardnet.py:71-93.
    """
    # collect conv and bn layer indices in order of appearance
    conv_idx, bn_idx = [], []
    i = 0
    while len(conv_idx) < 7:
        wk = f"{prefix}.{i}.weight"
        if wk in sd and sd[wk].ndim == 4:
            conv_idx.append(i)
            bn_idx.append(i + 1)
        i += 1
        if i > 64:
            raise KeyError("could not locate 7 conv layers in state_dict")
    out = {}
    for j, (ci, bi) in enumerate(zip(conv_idx, bn_idx)):
        conv = {"kernel": _t2f_conv(_np(sd[f"{prefix}.{ci}.weight"]))}
        if with_bias:
            conv["bias"] = _np(sd[f"{prefix}.{ci}.bias"])
        out[f"conv{j}"] = conv
        bn = {
            "running_mean": _np(sd[f"{prefix}.{bi}.running_mean"]),
            "running_var": _np(sd[f"{prefix}.{bi}.running_var"]),
        }
        if with_affine:
            bn["weight"] = _np(sd[f"{prefix}.{bi}.weight"])
            bn["bias"] = _np(sd[f"{prefix}.{bi}.bias"])
        out[f"bn{j}"] = bn
    return out


def hardnet_from_torch(state_dict):
    return {"params": {"features": _backbone_from_torch(
        state_dict, "features", with_bias=False, with_affine=False)}}


def sosnet_from_torch(state_dict):
    """Official SOSNet checkpoints use key prefix 'layers' (InstanceNorm at
    index 0 has no params); fall back to 'features'."""
    prefix = "layers" if any(k.startswith("layers.") for k in state_dict) \
        else "features"
    return {"params": {"features": _backbone_from_torch(
        state_dict, prefix, with_bias=False, with_affine=False)}}


def l2net_from_torch(state_dict):
    return {"params": {"features": _backbone_from_torch(
        state_dict, "features", with_bias=True, with_affine=True)}}


def tfeat_from_torch(state_dict):
    """tfeat TNet: features.{0,3} convs (after InstanceNorm idx?) — the
    published TNet is features=[InstanceNorm, Conv7, Tanh, MaxPool, Conv6,
    Tanh], classifier=[Linear, Tanh]."""
    sd = state_dict
    convs = [k for k in sd if k.endswith(".weight")
             and getattr(sd[k], "ndim", np.asarray(sd[k]).ndim) == 4]
    convs = sorted(convs, key=lambda k: int(k.split(".")[1]))
    fc_w = [k for k in sd if k.endswith(".weight")
            and getattr(sd[k], "ndim", np.asarray(sd[k]).ndim) == 2][0]
    fc_b = fc_w.replace("weight", "bias")
    params = {
        "conv0": {"kernel": _t2f_conv(_np(sd[convs[0]])),
                  "bias": _np(sd[convs[0].replace("weight", "bias")])},
        "conv1": {"kernel": _t2f_conv(_np(sd[convs[1]])),
                  "bias": _np(sd[convs[1].replace("weight", "bias")])},
        "fc": {"kernel": _np(sd[fc_w]).T, "bias": _np(sd[fc_b])},
    }
    return {"params": params}


def logpolar_from_torch(state_dict):
    """The official log-polar descriptor ships a HardNet-layout embedding
    net; reuse the ordered-backbone mapping."""
    return hardnet_from_torch(state_dict)


# name -> (cls, converter, mag_factor[, sampler])
PATCH_DESCRIPTOR_REGISTRY = {
    "HARDNET": (HardNet, hardnet_from_torch, 1.0),
    "SOSNET": (SOSNet, sosnet_from_torch, 3.0),
    "L2NET": (L2Net, l2net_from_torch, 1.0),
    "TFEAT": (TFeat, tfeat_from_torch, 3.0),
    "GEODESC": (GeoDesc, None, 3.0),                 # TF1 origin: npz only
    "LOGPOLAR": (LogPolarDesc, logpolar_from_torch, 3.0, "logpolar"),
}


class PatchDescriptorExtractor:
    """Compute-descriptors-only stage: keypoints from any detector ->
    oriented 32x32 patches -> descriptor net, one jitted dispatch.

    Mirrors the reference's detector+descriptor composition
    (``feature_manager.py`` with descriptor=HARDNET/SOSNET/L2NET/TFEAT over
    the ORB2 detector, presets ``feature_tracker_configs.py``).
    """

    def __init__(self, kind: str, variables=None, rng_seed: int = 0):
        from pyslam_tpu.ops.patches import (extract_log_polar_patches,
                                            extract_oriented_patches)

        entry = PATCH_DESCRIPTOR_REGISTRY[kind]
        cls, self._converter, self.mag_factor = entry[:3]
        sampler = entry[3] if len(entry) > 3 else "cartesian"
        self.kind = kind
        self.model = cls()
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 32, 32)))
        self.variables = variables
        extract = (extract_log_polar_patches if sampler == "logpolar"
                   else extract_oriented_patches)
        self._extract = extract

        mag = self.mag_factor
        model = self.model

        @jax.jit
        def _describe(variables, img, xys, sizes, angles):
            patches = extract(
                img, xys, sizes, angles, patch_size=32, mag_factor=mag)
            return model.apply(variables, patches)

        self._describe = _describe

    def load_torch(self, path: str):
        import torch

        if self._converter is None:
            raise NotImplementedError(
                f"{self.kind}: TF1-era weights — supply converted .npz "
                "variables instead (models/torch_convert.load_variables_npz)")
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.variables = self._converter(sd)

    def compute(self, img: np.ndarray, xys, sizes, angles) -> np.ndarray:
        """img: (H, W) grayscale; returns (N, D) float32 descriptors."""
        if len(xys) == 0:
            return np.zeros((0, 128), np.float32)
        return np.asarray(self._describe(
            self.variables,
            jnp.asarray(img, jnp.float32), jnp.asarray(xys, jnp.float32),
            jnp.asarray(sizes, jnp.float32), jnp.asarray(angles, jnp.float32)))
