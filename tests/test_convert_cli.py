"""Checkpoint conversion CLI: registry listing + hardnet round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _hardnet_torch():
    """HardNet-layout torch module (features Sequential, bias-free convs,
    affine-free BN) — the official checkpoint shape."""
    layers = []
    cin = 1
    spec = [(32, 3, 1, 1), (32, 3, 1, 1), (64, 3, 2, 1), (64, 3, 1, 1),
            (128, 3, 2, 1), (128, 3, 1, 1), (128, 8, 1, 0)]
    for co, k, s, p in spec:
        layers.append(tnn.Conv2d(cin, co, k, stride=s, padding=p, bias=False))
        layers.append(tnn.BatchNorm2d(co, affine=False))
        layers.append(tnn.ReLU())
        cin = co
    m = tnn.Module()
    m.features = tnn.Sequential(*layers)
    return m


def test_cli_list(capsys):
    from pyslam_tpu.tools.convert_checkpoint import main

    main(["--list"])
    out = capsys.readouterr().out
    for name in ("superpoint", "aliked", "dust3r", "hardnet", "netvlad"):
        assert name in out


def test_hardnet_roundtrip(tmp_path):
    import jax.numpy as jnp

    from pyslam_tpu.models.patch_descriptors import HardNet
    from pyslam_tpu.models.torch_convert import load_variables_npz
    from pyslam_tpu.tools.convert_checkpoint import convert

    tm = _hardnet_torch().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_var.fill_(1.5)
    pth = str(tmp_path / "hardnet.pth")
    torch.save(tm.state_dict(), pth)
    npz = str(tmp_path / "hardnet.npz")
    convert("hardnet", pth, npz)

    net = HardNet()
    patches = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 32, 32)).astype(np.float32))
    tpl = net.init(__import__("jax").random.PRNGKey(0), patches)
    variables = load_variables_npz(npz, tpl)
    d = np.asarray(net.apply(variables, patches))
    assert d.shape == (2, 128)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # converted BN stats must differ from the random-init template output
    d0 = np.asarray(net.apply(tpl, patches))
    assert not np.allclose(d, d0)
