"""LightGlue-class matcher: torch-twin conversion parity + functional
matching behavior (descriptor permutation recovery after identity-shaping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyslam_tpu.models.lightglue import LightGlueMatcher, LightGlueNet


class _FD:
    def __init__(self, desc, xy, valid):
        self.desc, self.xy, self.valid = desc, xy, valid


def test_lightglue_runs_and_shapes(rng):
    m = LightGlueMatcher(layers=2, input_dim=64, dim=64)
    n = 48
    f0 = _FD(rng.normal(size=(n, 64)).astype(np.float32),
             rng.uniform(0, 640, (n, 2)).astype(np.float32),
             np.ones((n,), bool))
    f1 = _FD(rng.normal(size=(n, 64)).astype(np.float32),
             rng.uniform(0, 640, (n, 2)).astype(np.float32),
             np.ones((n,), bool))
    idx, conf = m.match(f0, f1)
    assert idx.shape == (n,) and conf.shape == (n,)
    assert idx.max() < n


def test_lightglue_identical_descriptors_match_identity(rng):
    """With shared input/final projections, identical descriptor sets should
    match mostly to themselves under a permutation (the dual-softmax sharply
    prefers the duplicate) even at random weights."""
    m = LightGlueMatcher(layers=2, input_dim=64, dim=64, threshold=0.0)
    n = 40
    d = rng.normal(size=(n, 64)).astype(np.float32) * 3.0
    xy = rng.uniform(100, 500, (n, 2)).astype(np.float32)
    perm = rng.permutation(n)
    f0 = _FD(d, xy, np.ones((n,), bool))
    f1 = _FD(d[perm], xy[perm], np.ones((n,), bool))
    idx, conf = m.match(f0, f1)
    # row i should match to position of i in perm
    want = np.empty(n, int)
    want[perm] = np.arange(n)
    agree = (idx == want[np.arange(n)]).mean() if False else (
        np.mean([idx[i] == np.nonzero(perm == i)[0][0] for i in range(n)])
    )
    assert agree > 0.8, f"only {agree:.0%} of duplicates matched"


def test_lightglue_torch_twin_parity(rng):
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    dim, heads, layers, n = 64, 4, 2, 16
    hd = dim // heads

    net = LightGlueNet(dim=dim, layers=layers, heads=heads, input_dim=dim)
    params = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((n, dim)), jnp.zeros((n, 2)), jnp.ones((n,), bool),
        jnp.zeros((n, dim)), jnp.zeros((n, 2)), jnp.ones((n,), bool),
    )

    # build a torch state_dict with EXACTLY the flax tree's dotted names
    from pyslam_tpu.models.torch_convert import flatten_tree, generic_from_torch

    g = torch.Generator().manual_seed(3)
    sd = {}
    for path, arr in flatten_tree(dict(params)).items():
        name = path.replace("params/", "").replace("/", ".")
        if path.endswith("/kernel"):
            t = torch.randn(arr.T.shape, generator=g) * 0.2
            sd[name.replace(".kernel", ".weight")] = t
        elif path.endswith("/scale"):
            sd[name.replace(".scale", ".weight")] = torch.randn(arr.shape, generator=g) * 0.1 + 1.0
        elif path.endswith("/bias"):
            sd[name] = torch.randn(arr.shape, generator=g) * 0.1
        else:
            sd[name] = torch.randn(arr.shape, generator=g)

    conv = generic_from_torch(sd, params)
    # converted kernels are the transposed torch weights
    flat = flatten_tree(dict(conv))
    k = "params/layer_0/self_attn/to_q/kernel"
    np.testing.assert_allclose(
        flat[k], sd["layer_0.self_attn.to_q.weight"].numpy().T
    )
    # and the graph runs with them
    d0 = jnp.asarray(rng.normal(size=(n, dim)), jnp.float32)
    xy = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    scores, sim = net.apply(conv, d0, xy, jnp.ones((n,), bool), d0, xy,
                            jnp.ones((n,), bool))
    assert np.isfinite(np.asarray(scores)).all()


def test_lightglue_tracker_preset_wiring(rng):
    """XFEAT_LIGHTGLUE preset builds and the match path runs end-to-end
    (match QUALITY needs converted official weights; this validates the
    plumbing with random init)."""
    from pyslam_tpu.features.tracker import (
        FeatureTrackerConfigs, feature_tracker_factory,
    )

    t = feature_tracker_factory(FeatureTrackerConfigs.get("XFEAT_LIGHTGLUE"))
    assert hasattr(t.matcher, "match_features")
    img = rng.uniform(0, 255, (128, 160)).astype(np.float32)
    f1 = t.detectAndCompute(img)
    f2 = t.detectAndCompute(img)
    i1, i2 = t.match(f1, f2)
    assert i1.ndim == 1 and i2.ndim == 1 and len(i1) == len(i2)
