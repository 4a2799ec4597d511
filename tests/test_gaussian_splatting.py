"""Gaussian splatting: rasterizer sanity + incremental integration quality."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.ops import gaussian_splatting as gs


def _single_gaussian(xyz, color=1.0, scale=-2.0, cap=8):
    g = gs.Gaussians(
        means=jnp.zeros((cap, 3)),
        log_scales=jnp.full((cap, 3), -10.0),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (cap, 1)),
        opacity_logit=jnp.full((cap,), -10.0),
        colors=jnp.zeros((cap, 1)),
        valid=jnp.zeros((cap,), bool),
    )
    return g._replace(
        means=g.means.at[0].set(jnp.asarray(xyz)),
        log_scales=g.log_scales.at[0].set(scale),
        opacity_logit=g.opacity_logit.at[0].set(4.0),  # ~0.98
        colors=g.colors.at[0].set(color),
        valid=g.valid.at[0].set(True),
    )


def test_rasterize_single_gaussian_center():
    h, w = 64, 64
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1]], np.float32)
    g = _single_gaussian([0.0, 0.0, 2.0])
    color, acc, depth = gs.rasterize(
        g, jnp.eye(4), jnp.asarray(K), h, w, k=8
    )
    color = np.asarray(color)[..., 0]
    # brightest at the projected center (32,32), dark at corners
    cy, cx = np.unravel_index(np.argmax(color), color.shape)
    assert abs(cy - 32) <= 1 and abs(cx - 32) <= 1
    assert color[0, 0] < 0.01
    # expected depth at center ~ 2 (weighted by alpha)
    acc = np.asarray(acc)
    d = np.asarray(depth)
    assert abs(d[cy, cx] / max(acc[cy, cx], 1e-6) - 2.0) < 0.05


def test_rasterize_depth_ordering():
    """A nearer opaque gaussian must occlude a farther one."""
    h, w = 64, 64
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1]], np.float32)
    g = _single_gaussian([0.0, 0.0, 2.0], color=1.0)  # near, bright
    g = g._replace(
        means=g.means.at[1].set(jnp.asarray([0.0, 0.0, 4.0])),
        log_scales=g.log_scales.at[1].set(-1.0),
        opacity_logit=g.opacity_logit.at[1].set(4.0),
        colors=g.colors.at[1].set(0.0),  # far, dark
        valid=g.valid.at[1].set(True),
    )
    color, acc, depth = gs.rasterize(g, jnp.eye(4), jnp.asarray(K), h, w, k=8)
    c = float(np.asarray(color)[32, 32, 0])
    assert c > 0.8, f"near gaussian should dominate, got {c}"


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.mark.slow
def test_gs_integrator_improves_rendering():
    from pyslam_tpu.dense.gaussian_splatting_integrator import (
        GaussianSplattingVolume,
    )

    ds = SyntheticDataset(
        num_frames=8, h=96, w=128, sensor_type=SensorType.RGBD,
        trajectory="line", step=0.15,
    )
    K = np.array(
        [[ds.fx, 0, ds.cx], [0, ds.fy, ds.cy], [0, 0, 1]], np.float32
    )
    vol = GaussianSplattingVolume(
        capacity=20_000, steps_per_kf=25, tile_k=32, seed_stride=3,
    )
    for i in range(0, 6):
        vol.integrate(ds.getDepth(i), ds.getImage(i), ds.poses[i], K)

    # render a held-out pose (frame 6) and compare to the real image
    Tcw = np.linalg.inv(ds.poses[6])
    color, acc, _ = vol.render(Tcw, K)
    rh, rw = vol.render_hw
    target = np.asarray(ds.getImage(6), np.float32)[:rh, :rw] / 255.0
    psnr = _psnr(color[..., 0], target)
    assert psnr > 16.0, f"held-out view PSNR {psnr:.1f} dB"

    # save / load round trip preserves the model
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "gs.npz")
        vol.save(p)
        vol2 = GaussianSplattingVolume(capacity=20_000, tile_k=32)
        vol2.load(p)
        c2, _, _ = vol2.render(Tcw, K)
        np.testing.assert_allclose(c2, color, atol=1e-5)

    pts, cols = vol.extract_point_cloud()
    assert len(pts) > 400
