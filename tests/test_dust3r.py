"""DUSt3R-class model: tiny-scale torch-twin conversion parity + facade."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pyslam_tpu.models.dust3r import (  # noqa: E402
    Dust3rConfig, Dust3rModel, Dust3rNet,
)


# ------------------------------------------------------------- torch twin
def t_rope2d(pos, dim, base=100.0):
    d4 = dim // 4
    inv = 1.0 / (base ** (torch.arange(d4, dtype=torch.float32) / d4))
    ang_y = pos[:, 0:1] * inv[None]
    ang_x = pos[:, 1:2] * inv[None]
    ang = torch.cat([ang_y, ang_x], 1)
    return torch.cos(ang), torch.sin(ang)


def t_apply_rope(x, cos, sin):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = torch.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
    return out.reshape(x.shape)


class TAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.h = heads

    def forward(self, x, cos, sin):
        n, d = x.shape
        hd = d // self.h
        qkv = self.qkv(x).reshape(n, 3, self.h, hd)
        q = t_apply_rope(qkv[:, 0].permute(1, 0, 2), cos, sin)
        k = t_apply_rope(qkv[:, 1].permute(1, 0, 2), cos, sin)
        v = qkv[:, 2].permute(1, 0, 2)
        att = torch.softmax(torch.einsum("hnd,hmd->hnm", q, k) / hd ** 0.5, -1)
        out = torch.einsum("hnm,hmd->hnd", att, v).permute(1, 0, 2).reshape(n, d)
        return self.proj(out)


class TCross(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.projq = tnn.Linear(dim, dim)
        self.projk = tnn.Linear(dim, dim)
        self.projv = tnn.Linear(dim, dim)
        self.proj = tnn.Linear(dim, dim)
        self.h = heads

    def forward(self, x, y, cos, sin):
        n, d = x.shape
        m = y.shape[0]
        hd = d // self.h
        q = t_apply_rope(self.projq(x).reshape(n, self.h, hd).permute(1, 0, 2), cos, sin)
        k = t_apply_rope(self.projk(y).reshape(m, self.h, hd).permute(1, 0, 2), cos, sin)
        v = self.projv(y).reshape(m, self.h, hd).permute(1, 0, 2)
        att = torch.softmax(torch.einsum("hnd,hmd->hnm", q, k) / hd ** 0.5, -1)
        out = torch.einsum("hnm,hmd->hnd", att, v).permute(1, 0, 2).reshape(n, d)
        return self.proj(out)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TEncBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x, cos, sin):
        x = x + self.attn(self.norm1(x), cos, sin)
        return x + self.mlp(self.norm2(x))


class TDecBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm_y = tnn.LayerNorm(dim)
        self.cross_attn = TCross(dim, heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x, y, cos, sin):
        x = x + self.attn(self.norm1(x), cos, sin)
        x = x + self.cross_attn(self.norm2(x), self.norm_y(y), cos, sin)
        return x + self.mlp(self.norm3(x))


class TorchDust3r(tnn.Module):
    """Official layout twin at configurable (tiny) scale."""

    def __init__(self, cfg: Dust3rConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(
            3, cfg.enc_dim, cfg.patch, stride=cfg.patch
        )
        self.enc_blocks = tnn.ModuleList(
            [TEncBlock(cfg.enc_dim, cfg.enc_heads) for _ in range(cfg.enc_depth)]
        )
        self.enc_norm = tnn.LayerNorm(cfg.enc_dim)
        self.decoder_embed = tnn.Linear(cfg.enc_dim, cfg.dec_dim)
        self.dec_blocks = tnn.ModuleList(
            [TDecBlock(cfg.dec_dim, cfg.dec_heads) for _ in range(cfg.dec_depth)]
        )
        self.dec_blocks2 = tnn.ModuleList(
            [TDecBlock(cfg.dec_dim, cfg.dec_heads) for _ in range(cfg.dec_depth)]
        )
        self.dec_norm = tnn.LayerNorm(cfg.dec_dim)
        self.downstream_head1 = tnn.Module()
        self.downstream_head1.proj = tnn.Linear(cfg.dec_dim, cfg.patch ** 2 * 4)
        self.downstream_head2 = tnn.Module()
        self.downstream_head2.proj = tnn.Linear(cfg.dec_dim, cfg.patch ** 2 * 4)

    def forward(self, img1, img2):
        c = self.cfg
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        ys, xs = torch.meshgrid(
            torch.arange(h8), torch.arange(w8), indexing="ij"
        )
        pos = torch.stack([ys.reshape(-1), xs.reshape(-1)], 1).float()
        cos_e, sin_e = t_rope2d(pos, c.enc_dim // c.enc_heads)
        cos_d, sin_d = t_rope2d(pos, c.dec_dim // c.dec_heads)

        def encode(img):
            t = self.patch_embed.proj(img[None])  # (1,D,h8,w8)
            t = t.flatten(2).permute(0, 2, 1)[0]
            for blk in self.enc_blocks:
                t = blk(t, cos_e, sin_e)
            return self.enc_norm(t)

        t1, t2 = encode(img1), encode(img2)
        d1 = self.decoder_embed(t1)
        d2 = self.decoder_embed(t2)
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            nd1 = b1(d1, d2, cos_d, sin_d)
            nd2 = b2(d2, d1, cos_d, sin_d)
            d1, d2 = nd1, nd2
        d1 = self.dec_norm(d1)
        d2 = self.dec_norm(d2)

        def head(proj, tokens):
            out = proj(tokens).reshape(h8, w8, c.patch, c.patch, 4)
            out = out.permute(0, 2, 1, 3, 4).reshape(
                h8 * c.patch, w8 * c.patch, 4
            )
            pts = out[..., :3]
            d = pts.norm(dim=-1, keepdim=True)
            pts = pts / d.clamp(min=1e-8) * torch.expm1(d)
            conf = 1 + out[..., 3].exp()
            return pts, conf

        p1, c1 = head(self.downstream_head1.proj, d1)
        p2, c2 = head(self.downstream_head2.proj, d2)
        return p1, c1, p2, c2


TINY = Dust3rConfig(
    img_hw=(32, 48), patch=8, enc_dim=32, enc_depth=2, enc_heads=2,
    dec_dim=24, dec_depth=2, dec_heads=2,
)


def test_dust3r_torch_parity(rng):
    tm = TorchDust3r(TINY)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    tm.eval()

    from pyslam_tpu.models.torch_convert import dust3r_from_torch

    model = Dust3rModel(TINY)
    model.params = dust3r_from_torch(tm.state_dict(), model.params)

    i1 = rng.uniform(-1, 1, (32, 48, 3)).astype(np.float32)
    i2 = rng.uniform(-1, 1, (32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        p1_t, c1_t, p2_t, c2_t = tm(
            torch.from_numpy(i1).permute(2, 0, 1),
            torch.from_numpy(i2).permute(2, 0, 1),
        )
    p1_j, c1_j, p2_j, c2_j = model.net.apply(
        model.params, jnp.asarray(i1), jnp.asarray(i2)
    )
    np.testing.assert_allclose(np.asarray(p1_j), p1_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(c1_j), c1_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(p2_j), p2_t.numpy(), atol=2e-3)


def test_dust3r_facade(rng):
    model = Dust3rModel(TINY)
    img = rng.integers(0, 255, (60, 90)).astype(np.uint8)  # gray, odd size
    pts1, conf1, pts2, conf2 = model.infer_pair(img, img)
    assert pts1.shape == (32, 48, 3) and conf1.shape == (32, 48)
    assert np.isfinite(pts1).all() and (conf1 >= 1.0).all()
