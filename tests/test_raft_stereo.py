"""RAFT-class recurrent stereo: shapes, correlation lookup math, and an
in-framework trainability check (a tiny model fit on synthetic stereo must
beat its initialization — the component is usable end-to-end in JAX, which
the reference's torch-inference-only wrappers are not)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyslam_tpu.models.raft_stereo import (
    RaftStereo, RaftStereoConfig, RaftStereoNet, convex_upsample,
    corr_pyramid, lookup,
)


def test_corr_lookup_peak(rng):
    """The correlation lookup must peak at the true disparity offset."""
    h, w, d = 8, 64, 16
    f = rng.normal(size=(h, w, d)).astype(np.float32)
    shift = 6
    f2 = np.roll(f, -shift, axis=1)  # right image content shifted left
    pyr = corr_pyramid(jnp.asarray(f), jnp.asarray(f2), levels=2)
    # at the true disparity, sampled center (r=0) equals the self-correlation
    feat = lookup(pyr, jnp.full((h, w), float(shift)), radius=2)
    # center sample of level 0 is index radius (=2)
    center = np.asarray(feat)[..., 2]
    wrong = np.asarray(
        lookup(pyr, jnp.zeros((h, w)), radius=2)
    )[..., 2]
    # away from the wrap region the true-disparity correlation dominates
    assert center[:, 8 : w - 8].mean() > wrong[:, 8 : w - 8].mean() + 1.0


def test_convex_upsample_constant():
    d = jnp.full((6, 8), 3.0)
    mask = jnp.zeros((6, 8, 144))
    up = np.asarray(convex_upsample(d, mask))
    assert up.shape == (24, 32)
    np.testing.assert_allclose(up, 12.0, rtol=1e-6)  # 3 * 4 (resolution scale)


TINY = RaftStereoConfig(
    feat_dim=32, hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=3,
    iters=4, max_disp=64.0,
)


def _stereo_pair(rng, h=48, w=64, disp=4.0):
    """Random texture with a constant integer disparity."""
    tex = rng.uniform(0, 1, (h, w + 16)).astype(np.float32)
    left = tex[:, 8 : 8 + w]
    right = tex[:, 8 - int(disp) : 8 - int(disp) + w]
    return left, right


def test_raft_stereo_shapes(rng):
    m = RaftStereo(TINY)
    left, right = _stereo_pair(rng)
    d = m.infer(left * 255, right * 255)
    assert d.shape == left.shape
    assert np.isfinite(d).all()


@pytest.mark.slow
def test_raft_stereo_trains(rng):
    """A few hundred Adam steps on one synthetic pair must drive EPE well
    below the random-init output (end-to-end differentiability check)."""
    import optax

    net = RaftStereoNet(TINY)
    left, right = _stereo_pair(rng, disp=4.0)
    gt = np.full(left.shape, 4.0, np.float32)
    lj, rj, gj = jnp.asarray(left), jnp.asarray(right), jnp.asarray(gt)

    params = net.init(jax.random.PRNGKey(0), lj, rj)
    tx = optax.adam(2e-3)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            _, outs = net.apply(p, lj, rj)
            # RAFT-style exponentially-weighted sequence loss
            gammas = 0.8 ** jnp.arange(len(outs) - 1, -1, -1)
            losses = jnp.stack([jnp.abs(o - gj).mean() for o in outs])
            return jnp.sum(gammas * losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state2 = tx.update(grads, state)
        return optax.apply_updates(params, updates), state2, loss

    _, outs0 = net.apply(params, lj, rj)
    epe0 = float(jnp.abs(outs0[-1] - gj).mean())
    for _ in range(120):
        params, state, loss = step(params, state)
    _, outs1 = net.apply(params, lj, rj)
    epe1 = float(jnp.abs(outs1[-1] - gj).mean())
    assert epe1 < 0.5 * epe0, (epe0, epe1)
    assert epe1 < 2.0, epe1
