"""Patch-descriptor family (HardNet/SOSNet/L2Net/TFeat): oriented patch
extraction parity vs cv2.warpAffine, and torch-twin converter parity
(random weights — the function composition is what's under test, as in
test_model_convert.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pyslam_tpu.ops.patches import extract_oriented_patches  # noqa: E402
from pyslam_tpu.models.patch_descriptors import (  # noqa: E402
    HardNet, L2Net, SOSNet, TFeat, PatchDescriptorExtractor,
    hardnet_from_torch, l2net_from_torch, sosnet_from_torch, tfeat_from_torch,
)


@pytest.fixture
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


# ------------------------------------------------------------ patch sampling
def test_patch_extraction_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    N = 16
    xys = np.stack([rng.uniform(20, 140, N), rng.uniform(20, 100, N)], 1)
    sizes = rng.uniform(8, 31, N)
    angles = rng.uniform(0, 360, N)
    angles[::4] = -1.0  # unoriented keypoints

    got = np.asarray(extract_oriented_patches(
        jnp.asarray(img), jnp.asarray(xys), jnp.asarray(sizes),
        jnp.asarray(angles), patch_size=32, mag_factor=3.0))

    import math
    for i in range(N):
        x, y = xys[i]
        scale = 3.0 * sizes[i] / 32
        a = math.radians(angles[i])
        cos = math.cos(a) if a >= 0 else 1.0
        sin = math.sin(a) if a >= 0 else 0.0
        sc, ss = scale * cos, scale * sin
        M = np.array([[sc, -ss, (-sc + ss) * 16 + x],
                      [ss, sc, (-ss - sc) * 16 + y]], np.float32)
        want = cv2.warpAffine(
            img, M, (32, 32),
            flags=cv2.WARP_INVERSE_MAP + cv2.INTER_LINEAR + cv2.WARP_FILL_OUTLIERS)
        # interiors must agree to bilinear precision; borders may differ by
        # one fill pixel, so compare the central 30x30
        assert np.allclose(got[i][1:-1, 1:-1], want[1:-1, 1:-1], atol=2e-2), i


# ------------------------------------------------------------- torch twins
def _l2net_backbone_torch(bias, affine, eps):
    layers = []
    specs = [(1, 32, 3, 1, 1), (32, 32, 3, 1, 1), (32, 64, 3, 2, 1),
             (64, 64, 3, 1, 1), (64, 128, 3, 2, 1), (128, 128, 3, 1, 1)]
    for cin, cout, k, s, p in specs:
        layers += [tnn.Conv2d(cin, cout, k, stride=s, padding=p, bias=bias),
                   tnn.BatchNorm2d(cout, affine=affine, eps=eps), tnn.ReLU()]
    layers += [tnn.Dropout(0.1), tnn.Conv2d(128, 128, 8, bias=bias),
               tnn.BatchNorm2d(128, affine=affine, eps=eps)]
    return tnn.Sequential(*layers)


class _TorchHardNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = _l2net_backbone_torch(False, False, 1e-5)

    def forward(self, x):
        flat = x.view(x.size(0), -1)
        mp = torch.mean(flat, dim=1)
        sp = torch.std(flat, dim=1) + 1e-7
        x = (x - mp.view(-1, 1, 1, 1)) / sp.view(-1, 1, 1, 1)
        d = self.features(x).view(x.size(0), -1)
        return d / torch.sqrt((d * d).sum(1, keepdim=True) + 1e-10)


class _TorchL2Net(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = _l2net_backbone_torch(True, True, 1e-10)

    def forward(self, x):
        flat = x.view(x.size(0), -1)
        mp = torch.mean(flat, dim=1)
        sp = torch.std(flat, dim=1) + 1e-7
        x = (x - mp.view(-1, 1, 1, 1)) / sp.view(-1, 1, 1, 1)
        d = self.features(x).view(x.size(0), -1)
        return d / torch.sqrt((d * d).sum(1, keepdim=True) + 1e-10)


class _TorchSOSNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.inorm = tnn.InstanceNorm2d(1, affine=False)
        self.features = _l2net_backbone_torch(False, False, 1e-5)

    def forward(self, x):
        d = self.features(self.inorm(x)).view(x.size(0), -1)
        return d / torch.sqrt((d * d).sum(1, keepdim=True) + 1e-10)


class _TorchTFeat(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.InstanceNorm2d(1, affine=False),
            tnn.Conv2d(1, 32, 7), tnn.Tanh(), tnn.MaxPool2d(2),
            tnn.Conv2d(32, 64, 6), tnn.Tanh())
        self.classifier = tnn.Sequential(tnn.Linear(64 * 8 * 8, 128), tnn.Tanh())

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.view(x.size(0), -1))


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


CASES = [
    (_TorchHardNet, HardNet, hardnet_from_torch),
    (_TorchL2Net, L2Net, l2net_from_torch),
    (_TorchSOSNet, SOSNet, sosnet_from_torch),
    (_TorchTFeat, TFeat, tfeat_from_torch),
]


@pytest.mark.parametrize("torch_cls,flax_cls,converter", CASES)
def test_patch_descriptor_torch_parity(rng, torch_cls, flax_cls, converter):
    tm = torch_cls().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    patches = rng.uniform(0, 255, (8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(patches)[:, None]).numpy()
    variables = converter(tm.state_dict())
    got = np.asarray(flax_cls().apply(variables, jnp.asarray(patches)))
    assert got.shape == want.shape == (8, 128)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_sosnet_official_prefix(rng):
    """Official SOSNet checkpoints use 'layers.' as the Sequential name."""
    tm = _TorchSOSNet().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    sd = {k.replace("features.", "layers."): v for k, v in tm.state_dict().items()}
    patches = rng.uniform(0, 255, (4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(patches)[:, None]).numpy()
    got = np.asarray(SOSNet().apply(sosnet_from_torch(sd), jnp.asarray(patches)))
    assert np.allclose(got, want, atol=1e-4)


def test_extractor_end_to_end(rng):
    ext = PatchDescriptorExtractor("HARDNET")
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    xys = np.stack([rng.uniform(20, 140, 50), rng.uniform(20, 100, 50)], 1)
    sizes = np.full(50, 31.0, np.float32)
    angles = rng.uniform(0, 360, 50).astype(np.float32)
    des = ext.compute(img, xys, sizes, angles)
    assert des.shape == (50, 128)
    assert np.allclose(np.linalg.norm(des, axis=1), 1.0, atol=1e-3)
    # determinism + zero-keypoint path
    des2 = ext.compute(img, xys, sizes, angles)
    assert np.allclose(des, des2)
    assert ext.compute(img, np.zeros((0, 2)), np.zeros(0), np.zeros(0)).shape \
        == (0, 128)


def test_orb2_hardnet_tracker_preset(rng):
    """ORB2 detector + HardNet descriptors end-to-end: self-match returns
    identity-heavy correspondences."""
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("ORB2_HARDNET")
    img = (rng.uniform(0, 255, (240, 320))).astype(np.float32)
    # add structure so FAST fires
    img[60:120, 80:160] += 80
    img[140:180, 200:260] -= 60
    f1 = tracker.detectAndCompute(img)
    assert np.asarray(f1.desc).shape[1] == 128
    idx1, idx2 = tracker.match(f1, f1)
    valid = np.asarray(f1.valid)
    n_valid = int(valid.sum())
    assert n_valid > 20
    # self-matching must be (almost) the identity on valid keypoints
    agree = np.mean(idx1 == idx2) if len(idx1) else 0.0
    assert agree > 0.9, (n_valid, len(idx1), agree)
