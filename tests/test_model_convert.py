"""Torch->flax converter parity: build torch twins of the published
SuperPoint / XFeat architectures with RANDOM weights, convert the state_dict,
and assert the flax forward reproduces the torch forward.  This proves that
when a user supplies the official checkpoint, the converted model computes
the same function as upstream (no egress in CI, so random weights stand in
for the real ones — the function composition is what's under test)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# --------------------------------------------------------- torch twin models
class TorchSuperPoint(tnn.Module):
    """MagicLeap SuperPointNet (same layer names as the official release)."""

    def __init__(self):
        super().__init__()
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        self.relu = tnn.ReLU(inplace=True)
        self.pool = tnn.MaxPool2d(kernel_size=2, stride=2)
        self.conv1a = tnn.Conv2d(1, c1, 3, 1, 1)
        self.conv1b = tnn.Conv2d(c1, c1, 3, 1, 1)
        self.conv2a = tnn.Conv2d(c1, c2, 3, 1, 1)
        self.conv2b = tnn.Conv2d(c2, c2, 3, 1, 1)
        self.conv3a = tnn.Conv2d(c2, c3, 3, 1, 1)
        self.conv3b = tnn.Conv2d(c3, c3, 3, 1, 1)
        self.conv4a = tnn.Conv2d(c3, c4, 3, 1, 1)
        self.conv4b = tnn.Conv2d(c4, c4, 3, 1, 1)
        self.convPa = tnn.Conv2d(c4, c5, 3, 1, 1)
        self.convPb = tnn.Conv2d(c5, 65, 1, 1, 0)
        self.convDa = tnn.Conv2d(c4, c5, 3, 1, 1)
        self.convDb = tnn.Conv2d(c5, d1, 1, 1, 0)

    def forward(self, x):
        x = self.relu(self.conv1a(x))
        x = self.relu(self.conv1b(x))
        x = self.pool(x)
        x = self.relu(self.conv2a(x))
        x = self.relu(self.conv2b(x))
        x = self.pool(x)
        x = self.relu(self.conv3a(x))
        x = self.relu(self.conv3b(x))
        x = self.pool(x)
        x = self.relu(self.conv4a(x))
        x = self.relu(self.conv4b(x))
        semi = self.convPb(self.relu(self.convPa(x)))
        desc = self.convDb(self.relu(self.convDa(x)))
        return semi, desc


class TorchBasicLayer(tnn.Module):
    def __init__(self, cin, cout, kernel_size=3, stride=1, padding=1):
        super().__init__()
        self.layer = tnn.Sequential(
            tnn.Conv2d(cin, cout, kernel_size, padding=padding, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(cout, affine=False),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.layer(x)


class TorchXFeat(tnn.Module):
    """Public XFeatModel (accelerated_features), extraction path only."""

    def __init__(self):
        super().__init__()
        self.norm = tnn.InstanceNorm2d(1)
        self.skip1 = tnn.Sequential(
            tnn.AvgPool2d(4, stride=4), tnn.Conv2d(1, 24, 1, stride=1, padding=0)
        )
        self.block1 = tnn.Sequential(
            TorchBasicLayer(1, 4, stride=1),
            TorchBasicLayer(4, 8, stride=2),
            TorchBasicLayer(8, 8, stride=1),
            TorchBasicLayer(8, 24, stride=2),
        )
        self.block2 = tnn.Sequential(
            TorchBasicLayer(24, 24, stride=1), TorchBasicLayer(24, 24, stride=1)
        )
        self.block3 = tnn.Sequential(
            TorchBasicLayer(24, 64, stride=2),
            TorchBasicLayer(64, 64, stride=1),
            TorchBasicLayer(64, 64, 1, padding=0),
        )
        self.block4 = tnn.Sequential(
            TorchBasicLayer(64, 64, stride=2),
            TorchBasicLayer(64, 64, stride=1),
            TorchBasicLayer(64, 64, stride=1),
        )
        self.block5 = tnn.Sequential(
            TorchBasicLayer(64, 128, stride=2),
            TorchBasicLayer(128, 128, stride=1),
            TorchBasicLayer(128, 128, stride=1),
            TorchBasicLayer(128, 64, 1, padding=0),
        )
        self.block_fusion = tnn.Sequential(
            TorchBasicLayer(64, 64, stride=1),
            TorchBasicLayer(64, 64, stride=1),
            tnn.Conv2d(64, 64, 1, padding=0),
        )
        self.heatmap_head = tnn.Sequential(
            TorchBasicLayer(64, 64, 1, padding=0),
            TorchBasicLayer(64, 64, 1, padding=0),
            tnn.Conv2d(64, 1, 1),
            tnn.Sigmoid(),
        )
        self.keypoint_head = tnn.Sequential(
            TorchBasicLayer(64, 64, 1, padding=0),
            TorchBasicLayer(64, 64, 1, padding=0),
            TorchBasicLayer(64, 64, 1, padding=0),
            tnn.Conv2d(64, 65, 1),
        )

    def _unfold2d(self, x, ws=2):
        B, C, H, W = x.shape
        x = x.unfold(2, ws, ws).unfold(3, ws, ws).reshape(
            B, C, H // ws, W // ws, ws ** 2
        )
        return x.permute(0, 1, 4, 2, 3).reshape(B, -1, H // ws, W // ws)

    def forward(self, x):
        x = self.norm(x)
        x1 = self.block1(x)
        x2 = self.block2(x1 + self.skip1(x))
        x3 = self.block3(x2)
        x4 = self.block4(x3)
        x5 = self.block5(x4)
        x4 = F.interpolate(x4, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        x5 = F.interpolate(x5, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        feats = self.block_fusion(x3 + x4 + x5)
        heatmap = self.heatmap_head(feats)
        keypoints = self.keypoint_head(self._unfold2d(x, ws=8))
        return feats, keypoints, heatmap


# -------------------------------------------------------------------- tests
def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()


def test_superpoint_torch_parity(rng):
    import jax.numpy as jnp

    from pyslam_tpu.models.superpoint import SuperPointExtractor
    from pyslam_tpu.models.torch_convert import superpoint_from_torch

    tm = TorchSuperPoint()
    _randomize(tm, 0)

    ex = SuperPointExtractor(num_features=100)
    ex.params = superpoint_from_torch(tm.state_dict(), ex.params)

    img = rng.uniform(0, 1, (64, 96)).astype(np.float32)
    with torch.no_grad():
        semi_t, desc_t = tm(torch.from_numpy(img)[None, None])
    semi_j, desc_j = ex.net.apply(ex.params, jnp.asarray(img)[..., None])

    np.testing.assert_allclose(
        np.asarray(semi_j), semi_t[0].permute(1, 2, 0).numpy(), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(desc_j), desc_t[0].permute(1, 2, 0).numpy(), atol=3e-3
    )


def test_xfeat_torch_parity(rng):
    import jax.numpy as jnp

    from pyslam_tpu.models.torch_convert import xfeat_from_torch
    from pyslam_tpu.models.xfeat import XFeatExtractor

    tm = TorchXFeat()
    _randomize(tm, 1)

    ex = XFeatExtractor(num_features=100)
    ex.variables = xfeat_from_torch(tm.state_dict(), ex.variables)

    img = rng.uniform(0, 1, (64, 96)).astype(np.float32)
    with torch.no_grad():
        feats_t, kpts_t, heat_t = tm(torch.from_numpy(img)[None, None])
    feats_j, kpts_j, heat_j = ex.net.apply(
        ex.variables, jnp.asarray(img)[None, ..., None]
    )

    np.testing.assert_allclose(
        np.asarray(feats_j[0]), feats_t[0].permute(1, 2, 0).numpy(), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(kpts_j[0]), kpts_t[0].permute(1, 2, 0).numpy(), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(heat_j[0]), heat_t[0].permute(1, 2, 0).numpy(), atol=3e-3
    )


def test_npz_roundtrip(tmp_path):
    from pyslam_tpu.models.torch_convert import (
        load_variables_npz, save_variables_npz,
    )
    from pyslam_tpu.models.xfeat import XFeatExtractor

    ex = XFeatExtractor(num_features=50)
    p = str(tmp_path / "xfeat.npz")
    save_variables_npz(p, ex.variables)
    loaded = load_variables_npz(p, ex.variables)
    flat_a = dict(np.load(p))
    assert len(flat_a) > 40
    # trees identical
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(ex.variables), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xfeat_extractor_end_to_end(rng):
    """The full jitted extract path runs with converted weights and returns
    unit-norm descriptors at detected keypoints."""
    from pyslam_tpu.models.torch_convert import xfeat_from_torch
    from pyslam_tpu.models.xfeat import XFeatExtractor

    tm = TorchXFeat()
    _randomize(tm, 2)
    ex = XFeatExtractor(num_features=200)
    ex.variables = xfeat_from_torch(tm.state_dict(), ex.variables)

    img = (rng.uniform(0, 255, (128, 160))).astype(np.float32)
    feats = ex(img)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 0
    d = np.asarray(feats.desc)[valid]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
