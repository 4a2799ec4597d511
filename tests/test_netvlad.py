"""NetVLAD (VGG16-conv5 + NetVLAD pooling): torch-twin conversion parity and
descriptor behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pyslam_tpu.models.netvlad import (  # noqa: E402
    VGG16_CONV_CHANNELS, NetVLADExtractor,
)


class TorchNetVLAD(tnn.Module):
    """pytorch-NetVlad layout twin: ``encoder`` = torchvision VGG16 features
    cropped at conv5_3 (ReLU included), ``pool`` with centroids + 1x1 conv."""

    def __init__(self, num_clusters=8, dim=512):
        super().__init__()
        layers = []
        cin = 3
        for i, c in enumerate(VGG16_CONV_CHANNELS):
            layers.append(tnn.Conv2d(cin, c, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            if i in (1, 3, 6, 9):
                layers.append(tnn.MaxPool2d(2, 2))
            cin = c
        self.encoder = tnn.Sequential(*layers)
        self.pool = tnn.Module()
        self.pool.conv = tnn.Conv2d(dim, num_clusters, 1, bias=False)
        self.pool.centroids = tnn.Parameter(torch.randn(num_clusters, dim))

    def forward(self, x):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        f = self.encoder((x - mean) / std)            # (B,512,h,w)
        b, d, h, w = f.shape
        f = F.normalize(f, dim=1)
        a = F.softmax(self.pool.conv(f).reshape(b, -1, h * w), dim=1)  # (B,K,HW)
        fflat = f.reshape(b, d, h * w)
        sums = torch.einsum("bkn,bdn->bkd", a, fflat)
        counts = a.sum(-1)
        vlad = sums - counts[..., None] * self.pool.centroids[None]
        vlad = F.normalize(vlad, dim=2)
        v = vlad.reshape(b, -1)
        return F.normalize(v, dim=1)


def test_netvlad_torch_parity(rng):
    tm = TorchNetVLAD(num_clusters=8)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    tm.eval()

    from pyslam_tpu.models.torch_convert import netvlad_from_torch

    ex = NetVLADExtractor(num_clusters=8, input_hw=(64, 96))
    ex.params = netvlad_from_torch(tm.state_dict(), ex.params)

    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        v_t = tm(torch.from_numpy(img).permute(2, 0, 1)[None])[0].numpy()
    import jax.numpy as jnp

    v_j = np.asarray(ex._run(ex.params, jnp.asarray(img)))
    np.testing.assert_allclose(v_j, v_t, atol=2e-3)


def test_netvlad_extractor_descriptor_properties(rng):
    ex = NetVLADExtractor(num_clusters=4, input_hw=(64, 96))
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)  # gray input
    v = ex(img)
    assert v.shape == (4 * 512,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)
    # same image -> same descriptor; different image -> different
    v2 = ex(img)
    np.testing.assert_allclose(v, v2)
    v3 = ex(rng.uniform(0, 255, (120, 160)).astype(np.float32))
    assert np.abs(v - v3).max() > 1e-6
