"""ResNet / CosPlace / EigenPlaces / DeepLabv3 torch-twin converter parity.

torchvision is not in this image, so the twins below replicate its module
graph and state_dict naming exactly (torchvision/models/resnet.py and
segmentation/deeplabv3.py); random weights — the function composition and
key mapping are what's under test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pyslam_tpu.models.resnet import ResNet, resnet_from_torch  # noqa: E402


# ------------------------------------------------- torchvision-naming twins
class TBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, dilation,
                                dilation=dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class TResNet(tnn.Module):
    """torchvision resnet trunk (no avgpool/fc)."""

    def __init__(self, block, layers, dilate=(False, False, False)):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(block, 64, layers[0])
        self.layer2 = self._make(block, 128, layers[1], 2, dilate[0])
        self.layer3 = self._make(block, 256, layers[2], 2, dilate[1])
        self.layer4 = self._make(block, 512, layers[3], 2, dilate[2])

    def _make(self, block, planes, blocks, stride=1, dilate=False):
        downsample = None
        prev_dil = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                           stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample, prev_dil)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, dilation=self.dilation))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


@pytest.fixture
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


@pytest.mark.parametrize("arch,block,layers,dilate", [
    ("resnet18", TBasicBlock, (2, 2, 2, 2), (False, False, False)),
    ("resnet50", TBottleneck, (3, 4, 6, 3), (False, True, True)),
])
def test_resnet_parity(rng, arch, block, layers, dilate):
    tm = TResNet(block, layers, dilate).eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    x = rng.normal(0, 1, (1, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = resnet_from_torch(tm.state_dict())
    got = np.asarray(ResNet(arch=arch, dilate=dilate).apply(
        {"params": params}, jnp.asarray(x)))
    assert got.transpose(0, 3, 1, 2).shape == want.shape
    assert np.allclose(got.transpose(0, 3, 1, 2), want, atol=2e-3), \
        np.abs(got.transpose(0, 3, 1, 2) - want).max()


# --------------------------------------------------------- CosPlace twin
class TGeM(tnn.Module):
    def __init__(self):
        super().__init__()
        self.p = tnn.Parameter(torch.ones(1) * 3.0)

    def forward(self, x):
        return F.avg_pool2d(x.clamp(min=1e-6).pow(self.p),
                            (x.size(-2), x.size(-1))).pow(1.0 / self.p)


class TL2Norm(tnn.Module):
    def forward(self, x):
        return F.normalize(x, p=2, dim=1)


class TCosPlace(tnn.Module):
    """gmberton/CosPlace GeoLocalizationNet with Sequential backbone keys."""

    def __init__(self, out_dim=128):
        super().__init__()
        trunk = TResNet(TBasicBlock, (2, 2, 2, 2))
        self.backbone = tnn.Sequential(
            trunk.conv1, trunk.bn1, tnn.ReLU(), trunk.maxpool,
            trunk.layer1, trunk.layer2, trunk.layer3, trunk.layer4)
        self.aggregation = tnn.Sequential(
            TL2Norm(), TGeM(), tnn.Flatten(), tnn.Linear(512, out_dim),
            TL2Norm())

    def forward(self, x):
        return self.aggregation(self.backbone(x))


def test_cosplace_parity(rng):
    from pyslam_tpu.models.cosplace import GeoLocalizationNet, cosplace_from_torch

    tm = TCosPlace(out_dim=128).eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
        tm.aggregation[1].p.fill_(2.7)
    x = rng.normal(0, 1, (1, 96, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    variables, arch, out_dim = cosplace_from_torch(tm.state_dict())
    assert arch == "resnet18" and out_dim == 128
    got = np.asarray(GeoLocalizationNet(arch=arch, out_dim=out_dim).apply(
        variables, jnp.asarray(x)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)


# --------------------------------------------------------- DeepLabv3 twin
class TASPPConv(tnn.Sequential):
    def __init__(self, cin, cout, dilation):
        super().__init__(
            tnn.Conv2d(cin, cout, 3, padding=dilation, dilation=dilation,
                       bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU())


class TASPPPooling(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.mods = tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1),
            tnn.Conv2d(cin, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU())

    def forward(self, x):
        y = self.mods(x)
        return F.interpolate(y, size=x.shape[-2:], mode="nearest")

    # emulate torchvision key layout (convs.4.0/1/2 are the inner modules)
    def state_dict(self, *a, **kw):
        sd = self.mods.state_dict(*a, **kw)
        return {k: v for k, v in sd.items()}


class TASPP(tnn.Module):
    def __init__(self, cin, cout=256, rates=(12, 24, 36)):
        super().__init__()
        mods = [tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False),
                               tnn.BatchNorm2d(cout), tnn.ReLU())]
        for r in rates:
            mods.append(TASPPConv(cin, cout, r))
        mods.append(TASPPPooling(cin, cout))
        self.convs = tnn.ModuleList(mods)
        self.project = tnn.Sequential(
            tnn.Conv2d(5 * cout, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        res = [m(x) for m in self.convs]
        return self.project(torch.cat(res, dim=1))


class TDeepLabV3(tnn.Module):
    def __init__(self, num_classes=21):
        super().__init__()
        self.backbone = TResNet(TBottleneck, (3, 4, 6, 3),
                                (False, True, True))
        self.classifier = tnn.Sequential(
            TASPP(2048),
            tnn.Conv2d(256, 256, 3, padding=1, bias=False),
            tnn.BatchNorm2d(256), tnn.ReLU(),
            tnn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        f = self.backbone(x)
        y = self.classifier(f)
        return F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                             align_corners=False)


def _torchvision_aspp_keys(sd):
    """Rename our pooling twin's 'convs.4.mods.N' to torchvision 'convs.4.N'."""
    return {k.replace("convs.4.mods.", "convs.4."): v for k, v in sd.items()}


def test_deeplabv3_parity(rng):
    from pyslam_tpu.models.deeplabv3 import DeepLabV3, deeplabv3_from_torch

    tm = TDeepLabV3(num_classes=7).eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    sd = _torchvision_aspp_keys(tm.state_dict())
    variables = deeplabv3_from_torch(sd, num_classes=7)
    got = np.asarray(DeepLabV3(num_classes=7).apply(variables, jnp.asarray(x)))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    # the image-pooling branch differs (broadcast == nearest here since the
    # pooled map is 1x1 — identical); tolerance covers bilinear accumulation
    assert np.allclose(got, want, atol=5e-3), np.abs(got - want).max()


def test_deeplab_segmenter_interface(rng):
    from pyslam_tpu.models.deeplabv3 import DeepLabV3Segmenter

    seg = DeepLabV3Segmenter(num_classes=5)
    img = rng.uniform(0, 255, (50, 70, 3)).astype(np.float32)
    out = seg.infer(img)
    assert out["labels"].shape == (50, 70)
    assert out["probs"].shape == (50, 70, 5)
    assert np.allclose(out["probs"].sum(-1), 1.0, atol=1e-4)


def test_cosplace_loop_detector_wiring(rng):
    """COSPLACE global-descriptor type builds and produces unit vectors."""
    from pyslam_tpu.loop_closing.loop_closing import (
        GlobalDescriptorType, LoopDetector, LoopDetectorConfig)

    cfg = LoopDetectorConfig(
        global_descriptor_type=GlobalDescriptorType.COSPLACE)
    det = LoopDetector(cfg)
    assert det.score_based
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)

    class _F:
        img_vpr = img
        des = np.zeros((8, 256), np.int8)
        valid = np.ones(8, bool)

    _, g = det.describe_frame(_F())
    assert np.isfinite(g).all() and abs(np.linalg.norm(g) - 1.0) < 1e-3
