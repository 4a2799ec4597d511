"""Unified checkpoint conversion CLI: official torch weights -> .npz.

Reference capability: pySLAM's ``utilities/download.py`` fetches
pretrained models/vocabularies at runtime; this build is zero-egress, so
the equivalent workflow is: download the official checkpoint on any
machine, run this converter once, point the model at the ``.npz``.

    python -m pyslam_tpu.tools.convert_checkpoint \
        --model superpoint --input superpoint_v1.pth --output sp.npz

``--list`` prints every supported model with its official source layout.
Each entry instantiates the flax model (random init), runs its
checkpoint converter (the same code paths the twin-parity tests cover),
and saves the converted variable tree with ``save_variables_npz`` —
loadable everywhere via ``checkpoint=<path>.npz``.
"""

from __future__ import annotations

import argparse


def _conv(loader):
    """Adapt 'object with load_checkpoint + params' to (params, save_key)."""
    return loader


_REGISTRY: dict[str, str] = {
    # name -> description (the build function lives in _build below)
    "superpoint": "magicleap SuperPointNet .pth",
    "xfeat": "verlab accelerated_features xfeat.pt",
    "disk": "cvlab-epfl DISK depth-save.pth",
    "r2d2": "naver r2d2 *.pt (ops.N layout)",
    "d2net": "d2net d2_tf.pth (named Sequential)",
    "keynet": "KeyNet keynet_pytorch.pth (kornia layout)",
    "aliked": "ALIKED aliked-n16.pth (block/score_head/desc_head layout)",
    "hardnet": "HardNet++ checkpoint (features Sequential)",
    "sosnet": "SOSNet 32x32 (layers Sequential)",
    "l2net": "L2Net torch port",
    "tfeat": "tfeat TNet",
    "logpolar": "log-polar descriptors (HardNet-layout embedding net)",
    "lightglue": "LightGlue matcher .pth",
    "loftr": "LoFTR outdoor/indoor .ckpt",
    "netvlad": "pytorch-NetVlad VGG16 checkpoint",
    "cosplace": "gmberton CosPlace/EigenPlaces hub checkpoint",
    "alexnet": "torchvision AlexNet (features.* indices)",
    "depth_anything_v2": "DepthAnythingV2 vits .pth",
    "dust3r": "DUSt3R 224-linear .pth",
    "mast3r": "MASt3R (DUSt3R trunk + catmlp heads)",
    "deeplabv3": "torchvision deeplabv3_resnet50",
    "dbow3_vocab": "DBoW3 text vocabulary (ORBvoc.txt) -> tree .npz",
}


def _build(name: str):
    """-> (template_params, converter(state_dict) -> params)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    if name == "superpoint":
        from pyslam_tpu.models.superpoint import SuperPointNet
        from pyslam_tpu.models.torch_convert import superpoint_from_torch

        net = SuperPointNet()
        tpl = net.init(key, jnp.zeros((64, 64)))
        return tpl, lambda sd: superpoint_from_torch(sd, tpl)
    if name == "xfeat":
        from pyslam_tpu.models.torch_convert import xfeat_from_torch
        from pyslam_tpu.models.xfeat import XFeatNet

        net = XFeatNet()
        tpl = net.init(key, jnp.zeros((64, 64)))
        return tpl, lambda sd: xfeat_from_torch(sd, tpl)
    if name == "disk":
        from pyslam_tpu.models.disk import DiskUNet, disk_from_torch

        tpl = DiskUNet().init(key, jnp.zeros((1, 64, 64, 3)))
        return tpl, lambda sd: disk_from_torch(sd, tpl)
    if name == "r2d2":
        from pyslam_tpu.models.r2d2 import R2D2Net, r2d2_from_torch

        tpl = R2D2Net().init(key, jnp.zeros((1, 32, 32, 3)))
        return tpl, lambda sd: r2d2_from_torch(sd, tpl)
    if name == "d2net":
        from pyslam_tpu.models.d2net import D2Net, d2net_from_torch

        tpl = D2Net().init(key, jnp.zeros((64, 64, 3)))
        return tpl, lambda sd: d2net_from_torch(sd)
    if name == "keynet":
        from pyslam_tpu.models.keynet import KeyNet, keynet_from_torch

        tpl = KeyNet().init(key, jnp.zeros((64, 64)))
        return tpl, lambda sd: keynet_from_torch(sd)
    if name == "aliked":
        from pyslam_tpu.models.aliked import AlikedNet, aliked_from_torch

        tpl = AlikedNet().init(key, jnp.zeros((64, 64, 3)))

        def conv(sd):
            net_vars, head_vars = aliked_from_torch(sd, None)
            return {"net": net_vars, "head": head_vars}

        return tpl, conv
    if name in ("hardnet", "sosnet", "l2net", "tfeat", "logpolar"):
        from pyslam_tpu.models.patch_descriptors import (
            PATCH_DESCRIPTOR_REGISTRY)

        entry = PATCH_DESCRIPTOR_REGISTRY[name.upper()]
        cls, converter = entry[0], entry[1]
        tpl = cls().init(key, jnp.zeros((1, 32, 32)))
        return tpl, converter
    if name == "lightglue":
        def conv_file(path):
            from pyslam_tpu.models.lightglue import LightGlueMatcher

            m = LightGlueMatcher()
            m.load_checkpoint(path)
            return m.params

        return None, ("file", conv_file)
    if name == "loftr":
        def conv_file(path):
            from pyslam_tpu.models.loftr import LoFTRMatcher

            m = LoFTRMatcher()
            m.load_checkpoint(path)
            return m.params

        return None, ("file", conv_file)
    if name == "netvlad":
        from pyslam_tpu.models.netvlad import NetVLADNet
        from pyslam_tpu.models.torch_convert import netvlad_from_torch

        tpl = NetVLADNet().init(key, jnp.zeros((224, 224, 3)))
        return tpl, lambda sd: netvlad_from_torch(sd, tpl)
    if name == "alexnet":
        from pyslam_tpu.loop_closing.vpr import (AlexNetConv3,
                                                 alexnet_from_torch)

        tpl = AlexNetConv3().init(key, jnp.zeros((224, 224, 3)))
        return tpl, lambda sd: alexnet_from_torch(sd, tpl)
    if name == "depth_anything_v2":
        from pyslam_tpu.models.depth_anything_v2 import (DAv2Config,
                                                         DepthAnythingV2Net)
        from pyslam_tpu.models.torch_convert import (
            depth_anything_v2_from_torch)

        cfg = DAv2Config()
        tpl = DepthAnythingV2Net(cfg).init(
            key, jnp.zeros((cfg.img_hw[0], cfg.img_hw[1], 3)))
        return tpl, lambda sd: depth_anything_v2_from_torch(sd, tpl)
    if name in ("dust3r", "mast3r"):
        from pyslam_tpu.models.dust3r import Dust3rConfig, Dust3rNet
        from pyslam_tpu.models.torch_convert import dust3r_from_torch

        cfg = Dust3rConfig()
        h, w = cfg.img_hw
        tpl = Dust3rNet(cfg).init(key, jnp.zeros((h, w, 3)),
                                  jnp.zeros((h, w, 3)))
        return tpl, lambda sd: dust3r_from_torch(sd, tpl)
    if name == "deeplabv3":
        from pyslam_tpu.models.deeplabv3 import deeplabv3_from_torch

        return None, lambda sd: deeplabv3_from_torch(sd, num_classes=21)
    if name == "cosplace":
        from pyslam_tpu.models.cosplace import cosplace_from_torch

        return None, lambda sd: cosplace_from_torch(sd)
    raise KeyError(name)


def convert(model: str, input_path: str, output_path: str):
    if model == "dbow3_vocab":
        # pretrained hierarchical vocabulary (pySLAM thirdparty/pydbow3
        # Vocabulary.cpp load_fromtxt format) -> HierarchicalVocabulary npz
        from pyslam_tpu.loop_closing.vocabulary import HierarchicalVocabulary

        v = HierarchicalVocabulary.from_dbow3_text(input_path)
        v.save(output_path)
        return output_path
    import torch

    from pyslam_tpu.models.torch_convert import save_variables_npz

    tpl, converter = _build(model)
    if isinstance(converter, tuple) and converter[0] == "file":
        variables = converter[1](input_path)
        save_variables_npz(output_path, variables)
        return output_path
    sd = torch.load(input_path, map_location="cpu", weights_only=True)
    for k in ("state_dict", "model", "extractor", "model_state_dict"):
        if isinstance(sd, dict) and k in sd and isinstance(sd[k], dict):
            sd = sd[k]
    variables = converter(sd)
    save_variables_npz(output_path, variables)
    return output_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=sorted(_REGISTRY))
    ap.add_argument("--input")
    ap.add_argument("--output")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)
    if args.list or not args.model:
        for name, desc in sorted(_REGISTRY.items()):
            print(f"{name:20s} {desc}")
        return
    out = convert(args.model, args.input, args.output)
    print(f"converted {args.model}: {args.input} -> {out}")


if __name__ == "__main__":
    main()
