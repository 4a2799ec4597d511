"""DISK + R2D2 torch-twin converter parity and extractor contracts."""

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


# ------------------------------------------------------------------ R2D2 twin
class TQuadL2NetConfCFS(tnn.Module):
    """naver/r2d2 Quad_L2Net_ConfCFS with the official ops.N key layout."""

    def __init__(self, dim=128, mchan=4):
        super().__init__()
        self.ops = tnn.ModuleList()
        self.dilation = 1

        def add(outd, ind, k=3, stride=1, bn=True, relu=True):
            d = self.dilation
            self.ops.append(tnn.Conv2d(ind, outd, k,
                                       padding=((k - 1) * d) // 2, dilation=d))
            if bn:
                self.ops.append(tnn.BatchNorm2d(outd, affine=False))
            if relu:
                self.ops.append(tnn.ReLU())
            self.dilation *= stride

        add(8 * mchan, 3)
        add(8 * mchan, 8 * mchan)
        add(16 * mchan, 8 * mchan, stride=2)
        add(16 * mchan, 16 * mchan)
        add(32 * mchan, 16 * mchan, stride=2)
        add(32 * mchan, 32 * mchan)
        add(32 * mchan, 32 * mchan, k=2, stride=2, relu=False)
        add(32 * mchan, 32 * mchan, k=2, stride=2, relu=False)
        add(dim, 32 * mchan, k=2, stride=2, bn=False, relu=False)
        self.clf = tnn.Conv2d(dim, 2, kernel_size=1)
        self.sal = tnn.Conv2d(dim, 1, kernel_size=1)

    def forward(self, x):
        for op in self.ops:
            x = op(x)
        desc = F.normalize(x, p=2, dim=1)
        urel = self.clf(x ** 2)
        rel = F.softmax(urel, dim=1)[:, 1]
        urep = self.sal(x ** 2)[:, 0]
        sp = F.softplus(urep)
        rep = sp / (1 + sp)
        return desc, rel, rep


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


def test_r2d2_parity(rng):
    from pyslam_tpu.models.r2d2 import R2D2Net, r2d2_from_torch

    tm = TQuadL2NetConfCFS().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    x = rng.normal(0, 1, (1, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        wd, wrel, wrep = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    net = R2D2Net()
    variables = r2d2_from_torch(tm.state_dict(), None)
    gd, grel, grep = net.apply(variables, jnp.asarray(x))
    assert np.allclose(np.asarray(gd).transpose(0, 3, 1, 2), wd.numpy(),
                       atol=1e-4)
    assert np.allclose(np.asarray(grel), wrel.numpy(), atol=1e-4)
    assert np.allclose(np.asarray(grep), wrep.numpy(), atol=1e-4)


def test_r2d2_extractor(rng):
    from pyslam_tpu.models.r2d2 import R2D2Extractor

    ext = R2D2Extractor(num_features=256)
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    img[30:60, 40:80] += 80
    fd = ext(img)
    assert np.asarray(fd.xy).shape == (256, 2)
    assert np.asarray(fd.desc).shape == (256, 128)
    assert np.asarray(fd.valid).any()


# ------------------------------------------------------------------ DISK twin
class TConvBlock(tnn.Module):
    def __init__(self, cin, cout, gate=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 5, padding=2)
        self.gate = gate
        if gate:
            self.prelu = tnn.PReLU(cout)
            self.norm = tnn.InstanceNorm2d(cout)

    def forward(self, x):
        x = self.conv(x)
        if self.gate:
            x = self.norm(self.prelu(x))
        return x


class TDiskUnet(tnn.Module):
    def __init__(self):
        super().__init__()
        down = [16, 32, 64, 64, 64]
        up = [64, 64, 129]
        blocks = []
        cin = 3
        for ch in down:
            blocks.append(TConvBlock(cin, ch))
            cin = ch
        self.path_down = tnn.ModuleList(blocks)
        ups = []
        bottom = down[-1]
        for i, ch in enumerate(up):
            skip = down[-2 - i]
            ups.append(TConvBlock(bottom + skip, ch, gate=(i < len(up) - 1)))
            bottom = ch
        self.path_up = tnn.ModuleList(ups)

    def forward(self, x):
        skips = []
        for i, blk in enumerate(self.path_down):
            if i > 0:
                x = F.avg_pool2d(x, 2)
            x = blk(x)
            skips.append(x)
        for i, blk in enumerate(self.path_up):
            skip = skips[len(self.path_down) - 2 - i]
            x = F.interpolate(x, size=skip.shape[-2:], mode="nearest")
            x = blk(torch.cat([x, skip], dim=1))
        return x[:, :128], x[:, 128]


def test_disk_parity(rng):
    from pyslam_tpu.models.disk import DiskUNet, disk_from_torch

    tm = TDiskUnet().eval()
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        wdesc, wheat = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    variables = disk_from_torch(tm.state_dict(), None)
    gdesc, gheat = DiskUNet().apply(variables, jnp.asarray(x))
    assert np.allclose(np.asarray(gdesc).transpose(0, 3, 1, 2),
                       wdesc.numpy(), atol=1e-4), \
        np.abs(np.asarray(gdesc).transpose(0, 3, 1, 2) - wdesc.numpy()).max()
    assert np.allclose(np.asarray(gheat), wheat.numpy(), atol=1e-4)


def test_disk_extractor_and_tracker(rng):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("DISK")
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    img[30:60, 40:80] += 80
    f1 = tracker.detectAndCompute(img)
    assert np.asarray(f1.desc).shape[1] == 128
    idx1, idx2 = tracker.match(f1, f1)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9
