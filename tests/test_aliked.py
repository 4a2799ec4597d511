"""ALIKED torch-twin converter parity and extractor contract."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402


@pytest.fixture
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


def t_bilinear(x, ys, xs):
    """torch mirror of models.aliked.bilinear_sample (clamped borders).
    x: (H, W, C); ys/xs arbitrary same-shape tensors."""
    H, W, _ = x.shape
    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    ay = (ys - y0).unsqueeze(-1)
    ax = (xs - x0).unsqueeze(-1)
    y0i = y0.long().clamp(0, H - 1)
    y1i = (y0i + 1).clamp(0, H - 1)
    x0i = x0.long().clamp(0, W - 1)
    x1i = (x0i + 1).clamp(0, W - 1)
    v00 = x[y0i, x0i]
    v01 = x[y0i, x1i]
    v10 = x[y1i, x0i]
    v11 = x[y1i, x1i]
    return ((v00 * (1 - ax) + v01 * ax) * (1 - ay)
            + (v10 * (1 - ax) + v11 * ax) * ay)


class TDeformConv(tnn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.k = k
        self.offset_conv = tnn.Conv2d(cin, 2 * k * k, k, padding=k // 2)
        self.conv = tnn.Conv2d(cin, cout, k)  # weights only

    def forward(self, x):  # (H, W, C)
        k = self.k
        H, W, C = x.shape
        off = self.offset_conv(x.permute(2, 0, 1)[None])[0].permute(1, 2, 0)
        ys = torch.arange(H, dtype=torch.float32)[:, None].expand(H, W)
        xs = torch.arange(W, dtype=torch.float32)[None, :].expand(H, W)
        taps = []
        t = 0
        r = (k - 1) // 2
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                dy = off[..., 2 * t]
                dx = off[..., 2 * t + 1]
                taps.append(t_bilinear(x, ys + di + dy, xs + dj + dx))
                t += 1
        stacked = torch.cat(taps, dim=-1)  # (H, W, k*k*C)
        w = self.conv.weight  # (Cout, Cin, k, k)
        dense = w.permute(2, 3, 1, 0).reshape(k * k * C, -1)
        return stacked @ dense + self.conv.bias


class TConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):  # NCHW
        x = F.selu(self.bn1(self.conv1(x)))
        return F.selu(self.bn2(self.conv2(x)))


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, deform=False):
        super().__init__()
        self.deform = deform
        if deform:
            self.conv1 = TDeformConv(cin, cout)
            self.conv2 = TDeformConv(cout, cout)
        else:
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = tnn.Conv2d(cin, cout, 1, bias=False) \
            if cin != cout else None

    def forward(self, x):  # NCHW
        if self.deform:
            hwc = x[0].permute(1, 2, 0)
            y = self.conv1(hwc).permute(2, 0, 1)[None]
        else:
            y = self.conv1(x)
        y = F.selu(self.bn1(y))
        if self.deform:
            y = self.conv2(y[0].permute(1, 2, 0)).permute(2, 0, 1)[None]
        else:
            y = self.conv2(y)
        y = self.bn2(y)
        if self.downsample is not None:
            x = self.downsample(x)
        return F.selu(x + y)


class TAliked(tnn.Module):
    """Official-layout twin (block1-4, conv1-4, score_head, desc_head)."""

    def __init__(self, c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16):
        super().__init__()
        self.dim, self.K, self.M = dim, K, M
        self.block1 = TConvBlock(3, c1)
        self.block2 = TResBlock(c1, c2)
        self.block3 = TResBlock(c2, c3, deform=True)
        self.block4 = TResBlock(c3, c4, deform=True)
        d = dim // 4
        self.conv1 = tnn.Conv2d(c1, d, 1)
        self.conv2 = tnn.Conv2d(c2, d, 1)
        self.conv3 = tnn.Conv2d(c3, d, 1)
        self.conv4 = tnn.Conv2d(c4, d, 1)
        self.score_head = tnn.Sequential(
            tnn.Conv2d(dim, 8, 1), tnn.SELU(),
            tnn.Conv2d(8, 4, 3, padding=1), tnn.SELU(),
            tnn.Conv2d(4, 4, 3, padding=1), tnn.SELU(),
            tnn.Conv2d(4, 1, 3, padding=1))
        self.desc_head = TSDDH(dim, K, M)

    def forward(self, img):  # (H, W, 3) in [0,1]
        H, W, _ = img.shape
        x = img.permute(2, 0, 1)[None]
        x1 = self.block1(x)
        x2 = self.block2(F.avg_pool2d(x1, 2))
        x3 = self.block3(F.avg_pool2d(x2, 4))
        x4 = self.block4(F.avg_pool2d(x3, 4))

        def up(conv, x):
            return F.interpolate(conv(x), size=(H, W), mode="bilinear",
                                 align_corners=False)

        feats = torch.cat([up(self.conv1, x1), up(self.conv2, x2),
                           up(self.conv3, x3), up(self.conv4, x4)], dim=1)
        score = torch.sigmoid(self.score_head(feats))[0, 0]
        return feats[0].permute(1, 2, 0), score


class TSDDH(tnn.Module):
    def __init__(self, dim, K, M):
        super().__init__()
        self.dim, self.K, self.M = dim, K, M
        self.offset_conv = tnn.Sequential(
            tnn.Conv2d(dim, 2 * M, K), tnn.SELU(),
            tnn.Conv2d(2 * M, 2 * M, 1))
        self.sf_conv = tnn.Conv2d(dim, dim, 1, bias=False)
        self.agg_weights = tnn.Parameter(torch.randn(M, dim, dim) * 0.05)

    def forward(self, feats, xy):  # feats (H,W,dim), xy (N,2) [x,y]
        K, M, dim = self.K, self.M, self.dim
        r = (K - 1) // 2
        dyy, dxx = torch.meshgrid(
            torch.arange(-r, r + 1, dtype=torch.float32),
            torch.arange(-r, r + 1, dtype=torch.float32), indexing="ij")
        py = xy[:, 1, None] + dyy.reshape(-1)[None]
        px = xy[:, 0, None] + dxx.reshape(-1)[None]
        patch = t_bilinear(feats, py, px)  # (N, K*K, dim)
        p = patch.reshape(-1, K, K, dim).permute(0, 3, 1, 2)
        off = self.offset_conv(p).reshape(-1, M, 2)
        sy = xy[:, 1, None] + off[..., 0]
        sx = xy[:, 0, None] + off[..., 1]
        samp = t_bilinear(feats, sy, sx)  # (N, M, dim)
        w = self.sf_conv.weight.reshape(dim, dim)
        samp = F.selu(samp @ w.T)
        desc = torch.einsum("nmc,mcd->nd", samp, self.agg_weights)
        return F.normalize(desc, dim=-1)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


def test_aliked_parity(rng):
    from pyslam_tpu.models.aliked import AlikedNet, SDDH, aliked_from_torch

    tm = TAliked().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    kps = np.stack([rng.uniform(4, 90, 12), rng.uniform(4, 58, 12)],
                   axis=1).astype(np.float32)  # (N, 2) [x, y]
    with torch.no_grad():
        wf, ws = tm(torch.from_numpy(img))
        wd = tm.desc_head(wf, torch.from_numpy(kps))

    net_vars, head_vars = aliked_from_torch(tm.state_dict(), None)
    gf, gs = AlikedNet().apply(net_vars, jnp.asarray(img))
    gd = SDDH().apply(head_vars, gf, jnp.asarray(kps))

    assert np.allclose(np.asarray(gs), ws.numpy(), atol=2e-4), \
        np.abs(np.asarray(gs) - ws.numpy()).max()
    assert np.allclose(np.asarray(gf), wf.numpy(), atol=2e-3), \
        np.abs(np.asarray(gf) - wf.numpy()).max()
    assert np.allclose(np.asarray(gd), wd.numpy(), atol=2e-3), \
        np.abs(np.asarray(gd) - wd.numpy()).max()


def test_aliked_extractor_and_tracker(rng):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("ALIKED")
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    img[30:60, 40:80] += 80
    f1 = tracker.detectAndCompute(img)
    assert np.asarray(f1.desc).shape[1] == 128
    assert np.asarray(f1.valid).any()
    idx1, idx2 = tracker.match(f1, f1)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9
