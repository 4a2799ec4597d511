"""Torch checkpoint -> flax variable converters for learned perception models.

The reference framework downloads official torch weights at setup time
(pySLAM ``pyslam/local_features/feature_superpoint.py``,
``feature_xfeat.py``); this environment has no network egress, so the parity
story is: the flax architectures here are 1:1 with the published torch
models, and these converters map an official ``.pth`` state_dict onto the
flax variable tree.  Converter correctness is tested by building torch twins
with RANDOM weights and asserting output parity (tests/test_model_convert.py)
— so when a user supplies the real checkpoint, the converted model computes
the same function as upstream.
"""

from __future__ import annotations

import numpy as np

try:  # flax trees are plain dicts in recent flax; freeze if available
    from flax.core import freeze as _freeze
except Exception:  # pragma: no cover
    def _freeze(x):
        return x


def _t2f_conv(w) -> np.ndarray:
    """torch conv kernel (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _np(t):
    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "cpu") else t)


# ------------------------------------------------------------- generic npz io
def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            out.update(flatten_tree(dict(v), key))
        else:
            out[key] = np.asarray(v)
    return out


def save_variables_npz(path: str, variables):
    np.savez(path, **flatten_tree(dict(variables)))


def load_variables_npz(path: str, template):
    z = np.load(path)
    flat = dict(z)

    def rebuild(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = rebuild(dict(v), key)
            else:
                out[k] = flat[key].astype(np.asarray(v).dtype)
        return out

    return _freeze(rebuild(dict(template)))


# ----------------------------------------------------------------- SuperPoint
_SP_TORCH_CONVS = [
    "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
    "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
]


def superpoint_from_torch(state_dict, params_template):
    """Map the MagicLeap SuperPointNet state_dict (conv1a..convDb, each
    weight+bias) onto the flax params (Conv_0..Conv_11 in call order)."""
    params = {"params": {}}
    for i, name in enumerate(_SP_TORCH_CONVS):
        params["params"][f"Conv_{i}"] = {
            "kernel": _t2f_conv(_np(state_dict[f"{name}.weight"])),
            "bias": _np(state_dict[f"{name}.bias"]),
        }
    _check_shapes(params, params_template)
    return _freeze(params)


def superpoint_from_torch_file(path: str, params_template):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return superpoint_from_torch(sd, params_template)


# ---------------------------------------------------------------------- XFeat
# Ordered BasicLayer prefixes in the public XFeatModel, matching the flax
# call order BasicLayer_0..BasicLayer_22 in models/xfeat.py.
_XFEAT_BASIC_LAYERS = [
    "block1.0", "block1.1", "block1.2", "block1.3",
    "block2.0", "block2.1",
    "block3.0", "block3.1", "block3.2",
    "block4.0", "block4.1", "block4.2",
    "block5.0", "block5.1", "block5.2", "block5.3",
    "block_fusion.0", "block_fusion.1",
    "heatmap_head.0", "heatmap_head.1",
    "keypoint_head.0", "keypoint_head.1", "keypoint_head.2",
]
_XFEAT_PLAIN_CONVS = {
    "skip1.1": "skip1_conv",
    "block_fusion.2": "fusion_conv",
    "heatmap_head.2": "heatmap_conv",
    "keypoint_head.3": "keypoint_conv",
}


def xfeat_from_torch(state_dict, variables_template):
    """Map the public XFeatModel state_dict onto the flax variable tree
    ({'params', 'batch_stats'}).  BasicLayer = ``<prefix>.layer.0`` conv
    (bias-free) + ``<prefix>.layer.1`` BatchNorm (affine-free: running stats
    only).  ``fine_matcher.*`` (match refinement MLP, unused for extraction)
    is ignored."""
    params, stats = {}, {}
    for i, pre in enumerate(_XFEAT_BASIC_LAYERS):
        name = f"BasicLayer_{i}"
        params[name] = {
            "Conv_0": {"kernel": _t2f_conv(_np(state_dict[f"{pre}.layer.0.weight"]))}
        }
        stats[name] = {
            "BatchNorm_0": {
                "mean": _np(state_dict[f"{pre}.layer.1.running_mean"]),
                "var": _np(state_dict[f"{pre}.layer.1.running_var"]),
            }
        }
    for pre, name in _XFEAT_PLAIN_CONVS.items():
        params[name] = {
            "kernel": _t2f_conv(_np(state_dict[f"{pre}.weight"])),
            "bias": _np(state_dict[f"{pre}.bias"]),
        }
    out = {"params": params, "batch_stats": stats}
    _check_shapes(out, variables_template)
    return _freeze(out)


def xfeat_from_torch_file(path: str, variables_template):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return xfeat_from_torch(sd, variables_template)


# ------------------------------------------------------------------- checking
def _check_shapes(built, template, path=""):
    """Every leaf in the template must exist in the built tree with the same
    shape (catches silent architecture drift between torch and flax)."""
    t = dict(template)
    b = dict(built)
    for k, v in t.items():
        key = f"{path}/{k}" if path else str(k)
        if k not in b:
            raise KeyError(f"converted tree is missing {key}")
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            _check_shapes(b[k], v, key)
        else:
            got = np.asarray(b[k]).shape
            want = np.asarray(v).shape
            if got != want:
                raise ValueError(f"shape mismatch at {key}: torch {got} vs flax {want}")


# ----------------------------------------------------- generic dotted-name
def generic_from_torch(state_dict, template):
    """Map a torch module whose submodules are named EXACTLY like the flax
    tree path (dots for slashes) onto the flax params.

    Leaf conventions: Dense ``kernel`` <- ``<path>.weight`` transposed;
    ``bias`` <- ``<path>.bias``; LayerNorm ``scale`` <- ``<path>.weight``;
    bare parameters (e.g. ``rotary_w``) <- same dotted name.  Used for the
    LightGlue-class matcher where torch twins follow our module naming.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    def build(tree, path=""):
        out = {}
        for k, v in tree.items():
            # the top-level flax collection wrapper has no torch counterpart
            p = path if (path == "" and k == "params") else (
                f"{path}.{k}" if path else str(k)
            )
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = build(dict(v), p)
                continue
            want = np.asarray(v).shape
            if k == "kernel":
                w = sd[f"{path}.weight"]
                out[k] = w.T if w.T.shape == want else _t2f_conv(w)
            elif k == "scale":
                out[k] = sd[f"{path}.weight"]
            elif k == "bias":
                out[k] = sd[f"{path}.bias"]
            else:
                out[k] = sd[p]
            if np.asarray(out[k]).shape != want:
                raise ValueError(
                    f"shape mismatch at {p}: {np.asarray(out[k]).shape} vs {want}"
                )
        return out

    return _freeze(build(dict(template)))


def lightglue_from_torch_file(path: str, params_template):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return generic_from_torch(sd, params_template)


# -------------------------------------------------------------------- NetVLAD
_VGG16_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def netvlad_from_torch(state_dict, params_template):
    """Map a pytorch-NetVlad checkpoint (``encoder.<i>.weight`` torchvision
    VGG16 features + ``pool.conv.weight`` soft-assign 1x1 conv +
    ``pool.centroids``) onto the flax tree.  Accepts optional ``module.``
    prefixes."""
    sd = {}
    for k, v in state_dict.items():
        sd[k.replace("module.", "")] = _np(v)

    params = {"encoder": {}, "pool": {}}
    for i, fi in enumerate(_VGG16_FEATURE_IDX):
        params["encoder"][f"conv_{i}"] = {
            "kernel": _t2f_conv(sd[f"encoder.{fi}.weight"]),
            "bias": sd[f"encoder.{fi}.bias"],
        }
    # pool.conv: (K, D, 1, 1) -> Dense kernel (D, K)
    w = sd["pool.conv.weight"]
    params["pool"] = {
        "assign": {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T)},
        "centroids": sd["pool.centroids"],
    }
    out = {"params": params}
    _check_shapes(out, params_template)
    return _freeze(out)


def netvlad_from_torch_file(path: str, params_template):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return netvlad_from_torch(sd, params_template)


# --------------------------------------------------------------------- DUSt3R
def _dust3r_torch_name(flax_path: str) -> str:
    """flax tree path (slash-joined, no 'params/') -> official DUSt3R/CroCo
    state_dict name."""
    parts = flax_path.split("/")
    head = parts[0]
    if head == "patch_embed":
        return "patch_embed.proj"
    if head == "enc_norm":
        return "enc_norm"
    if head == "dec_norm":
        return "dec_norm"
    if head == "decoder_embed":
        return "decoder_embed"
    if head == "head1":
        return "downstream_head1.proj"
    if head == "head2":
        return "downstream_head2.proj"
    if head.startswith("enc_"):
        i = head.split("_")[1]
        return f"enc_blocks.{i}." + ".".join(parts[1:])
    if head.startswith("dec1_"):
        i = head.split("_")[1]
        return f"dec_blocks.{i}." + ".".join(parts[1:])
    if head.startswith("dec2_"):
        i = head.split("_")[1]
        return f"dec_blocks2.{i}." + ".".join(parts[1:])
    raise KeyError(flax_path)


def dust3r_from_torch(state_dict, params_template):
    """Map the official DUSt3R (linear-head) checkpoint onto the flax tree."""
    sd = {k.replace("module.", ""): _np(v) for k, v in state_dict.items()}

    def build(tree, path=""):
        out = {}
        for k, v in tree.items():
            p = path if (path == "" and k == "params") else (
                f"{path}/{k}" if path else str(k)
            )
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = build(dict(v), p)
                continue
            want = np.asarray(v).shape
            base = _dust3r_torch_name(p.rsplit("/", 1)[0]) if "/" in p else \
                _dust3r_torch_name(p)
            if k == "kernel":
                w = sd[f"{base}.weight"]
                out[k] = w.T if w.ndim == 2 else _t2f_conv(w)
            elif k == "scale":
                out[k] = sd[f"{base}.weight"]
            elif k == "bias":
                out[k] = sd[f"{base}.bias"]
            else:
                raise KeyError(p)
            if np.asarray(out[k]).shape != want:
                raise ValueError(
                    f"shape mismatch at {p}: {np.asarray(out[k]).shape} vs {want}"
                )
        return out

    return _freeze(build(dict(params_template)))


def dust3r_from_torch_file(path: str, params_template):
    import torch

    # untrusted third-party checkpoint: never unpickle arbitrary objects
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("model", sd.get("state_dict", sd)) if isinstance(sd, dict) else sd
    return dust3r_from_torch(sd, params_template)


# -------------------------------------------------------- DepthAnythingV2
def depth_anything_v2_from_torch(state_dict, params_template, grid_hw=None):
    """Map the official DepthAnythingV2 checkpoint (``pretrained.*`` DINOv2
    encoder + ``depth_head.*`` DPT) onto the flax tree.  The learned position
    embedding is bilinearly resized from the checkpoint's grid to ours."""
    sd = {k.replace("module.", ""): _np(v) for k, v in state_dict.items()}
    t = dict(params_template)["params"]
    p = {}

    # --- encoder
    p["patch_embed"] = {
        "kernel": _t2f_conv(sd["pretrained.patch_embed.proj.weight"]),
        "bias": sd["pretrained.patch_embed.proj.bias"],
    }
    p["cls_token"] = sd["pretrained.cls_token"].reshape(1, -1)
    pe = sd["pretrained.pos_embed"][0]            # (1+G*G, D)
    want = np.asarray(t["pos_embed"]).shape       # (1+h8*w8, D)
    if pe.shape != want:
        d = pe.shape[1]
        g = int(round((pe.shape[0] - 1) ** 0.5))
        grid = pe[1:].reshape(g, g, d)
        if grid_hw is None:
            n = want[0] - 1
            # infer (h8, w8) from the template's patch count assuming the
            # aspect used at model construction
            h8 = int(round((n * g / g) ** 0.5))
            # fall back to exhaustive factor search
            best = None
            for hh in range(1, n + 1):
                if n % hh == 0:
                    ww = n // hh
                    if best is None or abs(hh - ww) < abs(best[0] - best[1]):
                        best = (hh, ww)
            h8, w8 = best
        else:
            h8, w8 = grid_hw
        try:
            from scipy.ndimage import zoom  # pragma: no cover

            grid = zoom(grid, (h8 / g, w8 / g, 1), order=1)
        except Exception:
            ys = np.clip((np.arange(h8) * g / h8), 0, g - 1)
            xs = np.clip((np.arange(w8) * g / w8), 0, g - 1)
            y0 = ys.astype(int); x0 = xs.astype(int)
            y1 = np.minimum(y0 + 1, g - 1); x1 = np.minimum(x0 + 1, g - 1)
            fy = (ys - y0)[:, None, None]; fx = (xs - x0)[None, :, None]
            grid = (
                grid[y0][:, x0] * (1 - fy) * (1 - fx)
                + grid[y0][:, x1] * (1 - fy) * fx
                + grid[y1][:, x0] * fy * (1 - fx)
                + grid[y1][:, x1] * fy * fx
            )
        pe = np.concatenate([pe[:1], grid.reshape(-1, pe.shape[1])], axis=0)
    p["pos_embed"] = pe
    p["encoder_norm"] = {
        "scale": sd["pretrained.norm.weight"], "bias": sd["pretrained.norm.bias"]
    }
    nblocks = sum(1 for k in t if k.startswith("block_"))
    for i in range(nblocks):
        b = f"pretrained.blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "qkv": {"kernel": sd[f"{b}.attn.qkv.weight"].T,
                    "bias": sd[f"{b}.attn.qkv.bias"]},
            "attn_proj": {"kernel": sd[f"{b}.attn.proj.weight"].T,
                          "bias": sd[f"{b}.attn.proj.bias"]},
            "ls1": sd[f"{b}.ls1.gamma"],
            "norm2": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "fc1": {"kernel": sd[f"{b}.mlp.fc1.weight"].T,
                    "bias": sd[f"{b}.mlp.fc1.bias"]},
            "fc2": {"kernel": sd[f"{b}.mlp.fc2.weight"].T,
                    "bias": sd[f"{b}.mlp.fc2.bias"]},
            "ls2": sd[f"{b}.ls2.gamma"],
        }

    # --- DPT head
    def conv(name, tname, bias=True):
        d = {"kernel": _t2f_conv(sd[f"{tname}.weight"])}
        if bias:
            d["bias"] = sd[f"{tname}.bias"]
        return d

    for j in range(4):
        p[f"project_{j}"] = conv(None, f"depth_head.projects.{j}")
        p[f"layer{j + 1}_rn"] = conv(None, f"depth_head.scratch.layer{j + 1}_rn",
                                     bias=False)
    # ConvTranspose kernels: torch (in,out,kh,kw) -> flax transpose_kernel
    # layout (kh,kw,out,in)
    for j in (0, 1):
        w = sd[f"depth_head.resize_layers.{j}.weight"]
        p[f"resize_{j}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": sd[f"depth_head.resize_layers.{j}.bias"],
        }
    p["resize_3"] = conv(None, "depth_head.resize_layers.3")
    for r in range(1, 5):
        rn = f"depth_head.scratch.refinenet{r}"
        p[f"refine{r}"] = {
            "rcu1": {"conv1": conv(None, f"{rn}.resConfUnit1.conv1"),
                     "conv2": conv(None, f"{rn}.resConfUnit1.conv2")},
            "rcu2": {"conv1": conv(None, f"{rn}.resConfUnit2.conv1"),
                     "conv2": conv(None, f"{rn}.resConfUnit2.conv2")},
            "out_conv": conv(None, f"{rn}.out_conv"),
        }
    # refine4 has no skip input: the checkpoint still carries its unused
    # resConfUnit1 weights; the prune() below keeps only keys our graph has
    p["output_conv1"] = conv(None, "depth_head.scratch.output_conv1")
    p["output_conv2a"] = conv(None, "depth_head.scratch.output_conv2.0")
    p["output_conv2b"] = conv(None, "depth_head.scratch.output_conv2.2")

    # keep only keys the template has (e.g. refine4/rcu1 absent)
    def prune(built, tmpl):
        out = {}
        for k, v in tmpl.items():
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = prune(built[k], dict(v))
            else:
                out[k] = built[k]
        return out

    out = {"params": prune(p, t)}
    _check_shapes(out, params_template)
    return _freeze(out)


def depth_anything_v2_from_torch_file(path: str, params_template):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return depth_anything_v2_from_torch(sd, params_template)
