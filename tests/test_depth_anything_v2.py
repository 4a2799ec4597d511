"""DepthAnythingV2 (DINOv2 + DPT): tiny torch-twin conversion parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pyslam_tpu.models.depth_anything_v2 import (  # noqa: E402
    DAv2Config, DepthAnythingV2,
)


class TBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.ones(dim))
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.ones(dim))
        self.h = heads

    def forward(self, x):
        n, d = x.shape
        hd = d // self.h
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(n, 3, self.h, hd)
        q, k, v = (qkv[:, i].permute(1, 0, 2) for i in range(3))
        att = torch.softmax(torch.einsum("hnd,hmd->hnm", q, k) / hd ** 0.5, -1)
        y = torch.einsum("hnm,hmd->hnd", att, v).permute(1, 0, 2).reshape(n, d)
        x = x + self.attn.proj(y) * self.ls1.gamma
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y * self.ls2.gamma


class TRCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        y = self.conv2(F.relu(self.conv1(F.relu(x))))
        return x + y


class TFusion(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = TRCU(f)
        self.resConfUnit2 = TRCU(f)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        if out_hw is None:
            out_hw = (x.shape[-2] * 2, x.shape[-1] * 2)
        x = F.interpolate(x, out_hw, mode="bilinear", align_corners=False)
        return self.out_conv(x)


class TorchDAv2(tnn.Module):
    """Official-layout twin (pretrained.* + depth_head.*) at tiny scale."""

    def __init__(self, cfg: DAv2Config):
        super().__init__()
        c = cfg
        self.cfg = c
        self.pretrained = tnn.Module()
        self.pretrained.patch_embed = tnn.Module()
        self.pretrained.patch_embed.proj = tnn.Conv2d(
            3, c.dim, c.patch, stride=c.patch
        )
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        self.pretrained.cls_token = tnn.Parameter(torch.zeros(1, 1, c.dim))
        self.pretrained.pos_embed = tnn.Parameter(
            torch.zeros(1, 1 + h8 * w8, c.dim)
        )
        self.pretrained.blocks = tnn.ModuleList(
            [TBlock(c.dim, c.heads) for _ in range(c.depth)]
        )
        self.pretrained.norm = tnn.LayerNorm(c.dim)

        dh = tnn.Module()
        self.depth_head = dh
        dh.projects = tnn.ModuleList(
            [tnn.Conv2d(c.dim, oc, 1) for oc in c.out_ch]
        )
        dh.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(c.out_ch[0], c.out_ch[0], 4, 4),
            tnn.ConvTranspose2d(c.out_ch[1], c.out_ch[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(c.out_ch[3], c.out_ch[3], 3, stride=2, padding=1),
        ])
        dh.scratch = tnn.Module()
        for j in range(4):
            setattr(dh.scratch, f"layer{j+1}_rn",
                    tnn.Conv2d(c.out_ch[j], c.features, 3, padding=1, bias=False))
        for r in range(1, 5):
            setattr(dh.scratch, f"refinenet{r}", TFusion(c.features))
        dh.scratch.output_conv1 = tnn.Conv2d(c.features, c.features // 2, 3, padding=1)
        dh.scratch.output_conv2 = tnn.Sequential(
            tnn.Conv2d(c.features // 2, 32, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU(),
        )

    def forward(self, img):  # (1,3,H,W) ImageNet-normalized
        c = self.cfg
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        x = self.pretrained.patch_embed.proj(img)      # (1,D,h8,w8)
        t = x.flatten(2).permute(0, 2, 1)[0]
        t = torch.cat([self.pretrained.cls_token[0], t], 0)
        t = t + self.pretrained.pos_embed[0]
        taps = []
        for i, blk in enumerate(self.pretrained.blocks):
            t = blk(t)
            if i in c.taps:
                taps.append(self.pretrained.norm(t)[1:])

        feats = []
        for j, tap in enumerate(taps):
            f = tap.T.reshape(1, c.dim, h8, w8)
            f = self.depth_head.projects[j](f)
            f = self.depth_head.resize_layers[j](f)
            f = getattr(self.depth_head.scratch, f"layer{j+1}_rn")(f)
            feats.append(f)
        l1, l2, l3, l4 = feats
        s = self.depth_head.scratch
        p4 = s.refinenet4(l4, out_hw=l3.shape[-2:])
        p3 = s.refinenet3(p4, l3, out_hw=l2.shape[-2:])
        p2 = s.refinenet2(p3, l2, out_hw=l1.shape[-2:])
        p1 = s.refinenet1(p2, l1)
        y = s.output_conv1(p1)
        y = F.interpolate(y, c.img_hw, mode="bilinear", align_corners=False)
        y = s.output_conv2(y)
        return y[0, 0]


TINY = DAv2Config(
    img_hw=(56, 70), patch=14, dim=32, depth=4, heads=2, taps=(0, 1, 2, 3),
    out_ch=(8, 16, 24, 32), features=16,
)


def test_dav2_torch_parity(rng):
    tm = TorchDAv2(TINY)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    tm.eval()

    from pyslam_tpu.models.torch_convert import depth_anything_v2_from_torch

    model = DepthAnythingV2(TINY)
    model.params = depth_anything_v2_from_torch(tm.state_dict(), model.params)

    img = rng.uniform(-1, 1, (56, 70, 3)).astype(np.float32)
    with torch.no_grad():
        d_t = tm(torch.from_numpy(img).permute(2, 0, 1)[None]).numpy()
    import jax.numpy as jnp

    d_j = np.asarray(model.net.apply(model.params, jnp.asarray(img)))
    assert d_j.shape == d_t.shape
    np.testing.assert_allclose(d_j, d_t, atol=5e-3)


def test_dav2_infer_facade(rng):
    model = DepthAnythingV2(TINY)
    img = rng.integers(0, 255, (100, 130)).astype(np.uint8)
    d = model.infer(img)
    assert d.shape == (100, 130)
    assert np.isfinite(d).all() and (d >= 0).all()
