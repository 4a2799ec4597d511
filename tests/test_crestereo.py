"""CREStereo-class cascaded recurrent stereo: shape/finite contract and
in-framework trainability (gradient step reduces EPE on a tiny shifted
pair, like the RAFT test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyslam_tpu.models.crestereo import CREStereo, CREStereoConfig, CREStereoNet


def _pair(rng, h=32, w=48, disp=3):
    right = rng.uniform(0, 1, (h, w)).astype(np.float32)
    left = np.roll(right, disp, axis=1)  # left shifted right by disp
    return left, right


def test_infer_contract():
    rng = np.random.default_rng(0)
    left, right = _pair(rng, 40, 56)
    m = CREStereo(CREStereoConfig(iters_coarse=2, iters_fine=2))
    disp = m.infer(left, right)
    assert disp.shape == left.shape
    assert np.isfinite(disp).all()
    assert (disp >= 0).all()


def test_training_reduces_epe():
    rng = np.random.default_rng(1)
    cfg = CREStereoConfig(feat_dim=32, hidden_dim=32, groups=2,
                          iters_coarse=2, iters_fine=2, max_disp=16.0)
    net = CREStereoNet(cfg)
    left, right = _pair(rng, 32, 48, disp=4)
    gt = np.full((32, 48), 4.0, np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(left),
                      jnp.asarray(right))

    def loss_fn(p):
        d = net.apply(p, jnp.asarray(left), jnp.asarray(right))
        return jnp.abs(d - gt).mean()

    l0 = float(loss_fn(params))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    lr = 2e-3
    for _ in range(12):
        l, g = grad_fn(params)
        params = jax.tree.map(lambda p, gg: p - lr * gg, params, g)
    l1 = float(loss_fn(params))
    assert np.isfinite(l1)
    assert l1 < l0 * 0.9, (l0, l1)


def test_factory_with_checkpoint(tmp_path):
    from pyslam_tpu.depth_estimation.depth_estimator import (
        DepthEstimatorType, depth_estimator_factory, DepthEstimatorCREStereo,
        DepthEstimatorSgbm)
    from pyslam_tpu.models.crestereo import CREStereo
    from pyslam_tpu.models.torch_convert import save_variables_npz

    # zero-weights: falls back to SGM
    est = depth_estimator_factory(DepthEstimatorType.DEPTH_CRESTEREO_PYTORCH)
    assert isinstance(est, DepthEstimatorSgbm)
    # with a (saved) checkpoint: real CREStereo path
    m = CREStereo()
    m._ensure_params((240, 320))
    ckpt = str(tmp_path / "cre.npz")
    save_variables_npz(ckpt, m.params)
    est = depth_estimator_factory(DepthEstimatorType.DEPTH_CRESTEREO_PYTORCH,
                                  checkpoint=ckpt)
    assert isinstance(est, DepthEstimatorCREStereo)
