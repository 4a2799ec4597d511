"""GeoDesc / LogPolar / ContextDesc / LF-Net / DELF: contracts + behavior."""

import numpy as np
import pytest


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 128, (96, 128)).astype(np.float32)
    im[30:60, 40:80] += 100
    im[10:20, 90:110] += 80
    return np.clip(im, 0, 255)


def test_log_polar_sampling_rotation_shift():
    """Rotating the keypoint orientation cyclically shifts the columns."""
    import jax.numpy as jnp

    from pyslam_tpu.ops.patches import extract_log_polar_patches

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    xy = jnp.asarray([[32.0, 32.0]])
    size = jnp.asarray([12.0])
    P = 32
    p0 = np.asarray(extract_log_polar_patches(
        jnp.asarray(img), xy, size, jnp.asarray([0.0]), patch_size=P))
    shift_cols = 4
    ang = 360.0 * shift_cols / P
    p1 = np.asarray(extract_log_polar_patches(
        jnp.asarray(img), xy, size, jnp.asarray([ang]), patch_size=P))
    # p1 columns j should equal p0 columns (j + shift) mod P
    rolled = np.roll(p0[0], -shift_cols, axis=1)
    # boundary columns wrap through interpolation; compare the interior
    err = np.abs(p1[0][:, :-shift_cols] - rolled[:, :-shift_cols]).max()
    assert err < 1e-4, err


def test_geodesc_logpolar_patch_descriptors():
    import jax
    import jax.numpy as jnp

    from pyslam_tpu.models.patch_descriptors import (GeoDesc, LogPolarDesc,
                                                     PatchDescriptorExtractor)

    rng = np.random.default_rng(2)
    patches = jnp.asarray(rng.normal(0, 1, (4, 32, 32)).astype(np.float32))
    gd = GeoDesc()
    v = gd.init(jax.random.PRNGKey(0), patches)
    d = gd.apply(v, patches)
    assert d.shape == (4, 128)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4)
    d2, inter = gd.apply(v, patches, return_inter=True)
    assert inter.shape == (4, 8, 8, 128)
    lp = LogPolarDesc()
    v = lp.init(jax.random.PRNGKey(0), patches)
    d = lp.apply(v, patches)
    assert d.shape == (4, 128)

    for kind in ("GEODESC", "LOGPOLAR"):
        ext = PatchDescriptorExtractor(kind)
        img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
        out = ext.compute(img, np.array([[20.0, 20.0], [40.0, 30.0]]),
                          np.array([8.0, 12.0]), np.array([0.0, 45.0]))
        assert out.shape == (2, 128)
        assert np.isfinite(out).all()


def test_contextdesc_extractor(img):
    from pyslam_tpu.models.contextdesc import ContextDescExtractor

    ext = ContextDescExtractor()
    xys = np.array([[20.0, 30.0], [60.0, 45.0], [100.0, 15.0]])
    sizes = np.array([10.0, 14.0, 8.0])
    angles = np.array([0.0, 90.0, -1.0])
    d = ext.compute(img, xys, sizes, angles)
    assert d.shape == (3, 128)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # context dependence: moving OTHER keypoints changes this one's desc
    xys2 = xys.copy()
    xys2[1:] += 15.0
    d2 = ext.compute(img, xys2, sizes, angles)
    assert not np.allclose(d[0], d2[0])


def test_lfnet_extractor_and_tracker(img):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("LFNET")
    fd = tracker.detectAndCompute(img)
    assert np.asarray(fd.desc).shape == (1000, 256)
    assert np.asarray(fd.valid).any()
    assert (np.asarray(fd.size)[np.asarray(fd.valid)] > 0).all()
    idx1, idx2 = tracker.match(fd, fd)
    if len(idx1):
        assert (idx1 == idx2).mean() > 0.9


def test_delf_extractor_and_tracker(img):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("DELF")
    fd = tracker.detectAndCompute(img)
    assert np.asarray(fd.desc).shape == (1000, 40)
    assert np.asarray(fd.valid).any()
    d = np.asarray(fd.desc)[np.asarray(fd.valid)]
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)


def test_contextdesc_tracker_preset(img):
    from pyslam_tpu.features.tracker import feature_tracker_factory

    tracker = feature_tracker_factory("CONTEXTDESC")
    fd = tracker.detectAndCompute(img.astype(np.uint8))
    v = np.asarray(fd.valid)
    if v.any():
        d = np.asarray(fd.desc)[v]
        assert d.shape[1] == 128
        assert np.isfinite(d).all()


def test_geodesc_tracker_preset():
    from pyslam_tpu.features.tracker import feature_tracker_factory

    rng = np.random.default_rng(5)
    # ORB2's 8-level pyramid needs a realistically sized frame
    img = rng.uniform(0, 128, (240, 320)).astype(np.float32)
    img[60:140, 90:220] += 100
    img = np.clip(img, 0, 255)
    tracker = feature_tracker_factory("ORB2_GEODESC")
    fd = tracker.detectAndCompute(img)
    v = np.asarray(fd.valid)
    assert v.any()
    assert np.asarray(fd.desc).shape[1] == 128
