"""LoFTR: backbone + linear-transformer torch-twin parity (official key
naming) and end-to-end matcher contract on a synthetic shifted pair."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pyslam_tpu.models.loftr import (  # noqa: E402
    LoFTRConfig, LoFTRMatcher, LoFTRNet, LocalFeatureTransformer,
    ResNetFPN_8_2, loftr_from_torch, sine_pos_encoding,
)


@pytest.fixture
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


# --------------------------------------------------------- torch twins
class TBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TResNetFPN82(tnn.Module):
    """zju3dv/LoFTR ResNetFPN_8_2 with the official attribute names."""

    def __init__(self, dims=(128, 196, 256)):
        super().__init__()
        d1, d2, d3 = dims
        self.conv1 = tnn.Conv2d(1, d1, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(d1)
        self.layer1 = tnn.Sequential(TBasic(d1, d1), TBasic(d1, d1))
        self.layer2 = tnn.Sequential(TBasic(d1, d2, 2), TBasic(d2, d2))
        self.layer3 = tnn.Sequential(TBasic(d2, d3, 2), TBasic(d3, d3))
        self.layer3_outconv = tnn.Conv2d(d3, d3, 1, bias=False)
        self.layer2_outconv = tnn.Conv2d(d2, d3, 1, bias=False)
        self.layer2_outconv2 = tnn.Sequential(
            tnn.Conv2d(d3, d3, 3, 1, 1, bias=False), tnn.BatchNorm2d(d3),
            tnn.LeakyReLU(), tnn.Conv2d(d3, d2, 3, 1, 1, bias=False))
        self.layer1_outconv = tnn.Conv2d(d1, d2, 1, bias=False)
        self.layer1_outconv2 = tnn.Sequential(
            tnn.Conv2d(d2, d2, 3, 1, 1, bias=False), tnn.BatchNorm2d(d2),
            tnn.LeakyReLU(), tnn.Conv2d(d2, d1, 3, 1, 1, bias=False))

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear",
                              align_corners=False)
        x2_out = self.layer2_outconv2(self.layer2_outconv(x2) + x3_2x)
        x2_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear",
                              align_corners=False)
        x1_out = self.layer1_outconv2(self.layer1_outconv(x1) + x2_2x)
        return x3_out, x1_out


class TLoFTREncoderLayer(tnn.Module):
    def __init__(self, d, nhead):
        super().__init__()
        self.dim = d // nhead
        self.nhead = nhead
        self.q_proj = tnn.Linear(d, d, bias=False)
        self.k_proj = tnn.Linear(d, d, bias=False)
        self.v_proj = tnn.Linear(d, d, bias=False)
        self.merge = tnn.Linear(d, d, bias=False)
        self.mlp = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                  tnn.ReLU(), tnn.Linear(2 * d, d, bias=False))
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, x, source):
        N = 1
        L, S = x.size(0), source.size(0)
        q = self.q_proj(x).view(L, self.nhead, self.dim)
        k = self.k_proj(source).view(S, self.nhead, self.dim)
        v = self.v_proj(source).view(S, self.nhead, self.dim)
        Q, K = F.elu(q) + 1, F.elu(k) + 1
        v_len = S
        vv = v / v_len
        KV = torch.einsum("shd,shv->hdv", K, vv)
        Z = 1.0 / (torch.einsum("lhd,hd->lh", Q, K.sum(0)) + 1e-6)
        m = torch.einsum("lhd,hdv,lh->lhv", Q, KV, Z) * v_len
        m = self.norm1(self.merge(m.reshape(L, -1)))
        m = self.norm2(self.mlp(torch.cat([x, m], -1)))
        return x + m


class TLocalFeatureTransformer(tnn.Module):
    def __init__(self, d, nhead, n_pairs):
        super().__init__()
        self.layer_names = ["self", "cross"] * n_pairs
        self.layers = tnn.ModuleList(
            [TLoFTREncoderLayer(d, nhead) for _ in self.layer_names])

    def forward(self, f0, f1):
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                f0 = layer(f0, f0)
                f1 = layer(f1, f1)
            else:
                f0 = layer(f0, f1)
                f1 = layer(f1, f0)
        return f0, f1


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


def test_backbone_parity(rng):
    dims = (16, 24, 32)
    tm = TResNetFPN82(dims).eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    x = rng.normal(0, 1, (1, 64, 64, 1)).astype(np.float32)
    with torch.no_grad():
        wc, wf = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    # build params through the full converter by including minimal other keys
    cfg = LoFTRConfig(img_hw=(64, 64), dims=dims, coarse_layers=1, heads=4,
                      max_matches=16)
    net = LoFTRNet(cfg)
    import jax

    template = net.init(jax.random.PRNGKey(0), jnp.zeros((64, 64)),
                        jnp.zeros((64, 64)))
    # complete the state dict with the transformer/fine keys from a twin
    tcoarse = TLocalFeatureTransformer(dims[2], 4, 1)
    tfine = TLocalFeatureTransformer(dims[0], 4, 1)
    sd.update({f"loftr_coarse.{k}": v for k, v in tcoarse.state_dict().items()})
    sd.update({f"loftr_fine.{k}": v for k, v in tfine.state_dict().items()})
    dp = tnn.Linear(dims[2], dims[0])
    mf = tnn.Linear(2 * dims[0], dims[0])
    sd.update({f"fine_preprocess.down_proj.{k}": v
               for k, v in dp.state_dict().items()})
    sd.update({f"fine_preprocess.merge_feat.{k}": v
               for k, v in mf.state_dict().items()})
    variables = loftr_from_torch(sd, template)

    gc, gf = ResNetFPN_8_2(dims).apply(
        {"params": variables["params"]["backbone"]},
        jnp.asarray(x))
    assert np.allclose(np.asarray(gc).transpose(0, 3, 1, 2), wc.numpy(),
                       atol=2e-3), \
        np.abs(np.asarray(gc).transpose(0, 3, 1, 2) - wc.numpy()).max()
    assert np.allclose(np.asarray(gf).transpose(0, 3, 1, 2), wf.numpy(),
                       atol=2e-3)


def test_transformer_parity(rng):
    d, heads, n_pairs = 32, 4, 2
    tm = TLocalFeatureTransformer(d, heads, n_pairs).eval()
    f0 = rng.normal(0, 1, (40, d)).astype(np.float32)
    f1 = rng.normal(0, 1, (40, d)).astype(np.float32)
    with torch.no_grad():
        w0, w1 = tm(torch.from_numpy(f0), torch.from_numpy(f1))
    sd = {f"loftr_coarse.{k}": v for k, v in tm.state_dict().items()}
    from pyslam_tpu.models.loftr import loftr_from_torch as _conv

    # reuse the enc-layer mapping via a tiny direct build
    params = {}
    for i in range(n_pairs):
        for j, nm in ((2 * i, f"self_{i}"), (2 * i + 1, f"cross_{i}")):
            pre = f"loftr_coarse.layers.{j}"
            params[nm] = {
                "q_proj": {"kernel": sd[f"{pre}.q_proj.weight"].numpy().T},
                "k_proj": {"kernel": sd[f"{pre}.k_proj.weight"].numpy().T},
                "v_proj": {"kernel": sd[f"{pre}.v_proj.weight"].numpy().T},
                "merge": {"kernel": sd[f"{pre}.merge.weight"].numpy().T},
                "mlp1": {"kernel": sd[f"{pre}.mlp.0.weight"].numpy().T},
                "mlp2": {"kernel": sd[f"{pre}.mlp.2.weight"].numpy().T},
                "norm1": {"scale": sd[f"{pre}.norm1.weight"].numpy(),
                          "bias": sd[f"{pre}.norm1.bias"].numpy()},
                "norm2": {"scale": sd[f"{pre}.norm2.weight"].numpy(),
                          "bias": sd[f"{pre}.norm2.bias"].numpy()},
            }
    g0, g1 = LocalFeatureTransformer(d, heads, n_pairs).apply(
        {"params": params}, jnp.asarray(f0), jnp.asarray(f1))
    assert np.allclose(np.asarray(g0), w0.numpy(), atol=1e-4)
    assert np.allclose(np.asarray(g1), w1.numpy(), atol=1e-4)


def test_loftr_matcher_contract(rng):
    cfg = LoFTRConfig(img_hw=(64, 96), dims=(16, 24, 32), coarse_layers=1,
                      heads=4, conf_threshold=0.0, max_matches=64)
    m = LoFTRMatcher(cfg)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    img[20:40, 30:60] += 90
    xy1, xy2, conf = m.match_pair(img, img)
    assert xy1.shape == xy2.shape and xy1.shape[1] == 2
    if len(xy1):  # self-match: positions must agree to fine-window accuracy
        assert np.median(np.abs(xy1 - xy2)) <= 4.0
