"""(A)KAZE nonlinear scale space, detector, M-LDB/KAZE descriptors."""

import numpy as np
import pytest


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 50, (200, 260)).astype(np.float32)
    for (y, x, s, v) in ((40, 50, 20, 180), (110, 170, 26, 150),
                         (150, 60, 16, 200)):
        img[y:y + s, x:x + s] += v
    return np.clip(img, 0, 255)


def test_nonlinear_diffusion_smooths_noise_keeps_edges():
    import jax.numpy as jnp

    from pyslam_tpu.features.akaze import nonlinear_scale_space

    rng = np.random.default_rng(1)
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    noisy = img + rng.normal(0, 0.05, img.shape).astype(np.float32)
    stack, sigmas = nonlinear_scale_space(jnp.asarray(noisy), sublevels=3)
    out = np.asarray(stack[-1])
    # noise variance in the flat region shrinks a lot...
    assert out[10:50, 5:25].std() < 0.4 * noisy[10:50, 5:25].std()
    # ...but the edge contrast survives (anisotropic diffusion property)
    assert (out[:, 40:60].mean() - out[:, 5:25].mean()) > 0.8
    assert len(sigmas) == 3 and (np.diff(sigmas) > 0).all()


@pytest.mark.parametrize("preset,dim,is_bits", [("AKAZE", 486, True),
                                                ("KAZE", 64, False)])
def test_akaze_kaze_tracker(preset, dim, is_bits):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory(preset)
    img = _scene(2)
    fd = tracker.detectAndCompute(img)
    v = np.asarray(fd.valid)
    assert v.any()
    d = np.asarray(fd.desc)
    assert d.shape[1] == dim
    if is_bits:
        assert set(np.unique(d[v])) <= {0, 1}
    else:
        assert np.allclose(np.linalg.norm(d[v], axis=1), 1.0, atol=1e-4)
    # detector should fire near the block corners
    xy = np.asarray(fd.xy)[v]
    assert np.linalg.norm(xy - np.array([50.0, 40.0]), axis=1).min() < 12
    idx1, idx2 = tracker.match(fd, fd)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9


def test_akaze_shift_matching():
    from pyslam_tpu.features.akaze import AkazeExtractor

    ext = AkazeExtractor(num_features=100, descriptor="MLDB")
    img1 = _scene(3)
    img2 = np.roll(img1, 4, axis=1)
    f1, f2 = ext(img1), ext(img2)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    d1 = np.asarray(f1.desc)[v1]
    d2 = np.asarray(f2.desc)[v2]
    x1 = np.asarray(f1.xy)[v1]
    x2 = np.asarray(f2.xy)[v2]
    ham = (d1[:, None, :] != d2[None, :, :]).sum(-1)
    j = ham.argmin(1)
    err = np.linalg.norm(x2[j] - (x1 + np.array([4.0, 0.0])), axis=1)
    assert np.median(err) < 15.0, np.median(err)
