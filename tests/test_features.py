import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.orb2 import ORB2Extractor, level_quotas
from pyslam_tpu.ops import fast, hamming, matching, nms


def synth_image(rng, h=240, w=320, n_blobs=80):
    """Random rectangles on a gradient background: plenty of corners."""
    img = np.tile(np.linspace(40, 90, w, dtype=np.float32), (h, 1))
    for _ in range(n_blobs):
        y = rng.integers(20, h - 40)
        x = rng.integers(20, w - 40)
        bh = rng.integers(6, 24)
        bw = rng.integers(6, 24)
        img[y : y + bh, x : x + bw] = rng.uniform(120, 250)
    return img


def test_level_quotas_sum():
    q = level_quotas(2000, 8, 1.2)
    assert sum(q) == 2000
    assert all(q[i] >= q[i + 1] for i in range(len(q) - 1))


def test_fast_detects_rectangle_corners(rng):
    img = np.full((64, 64), 50.0, np.float32)
    img[24:40, 24:40] = 200.0
    score = np.asarray(fast.fast_score_map(jnp.asarray(img), 20.0))
    # corners of the square must respond
    assert score[24, 24] > 0 and score[24, 39] > 0
    assert score[39, 24] > 0 and score[39, 39] > 0
    # flat regions & straight edges must not
    assert score[32, 32] == 0  # inside
    assert score[24, 32] == 0  # mid-edge
    assert score[45, 45] == 0  # outside


def test_grid_topk_shapes(rng):
    score = jnp.asarray(rng.uniform(0, 1, (100, 140)).astype(np.float32))
    xy, vals, valid = nms.grid_topk_keypoints(score, cell=16, per_cell=4, max_out=64)
    assert xy.shape == (64, 2) and valid.shape == (64,)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert xy[:, 0].max() < 140 and xy[:, 1].max() < 100


def test_extractor_basic(rng):
    img = synth_image(rng)
    ext = ORB2Extractor(num_features=500, num_levels=4)
    feats = ext(img)
    assert feats.xy.shape == (500, 2)
    assert feats.desc.shape == (500, 256)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 200
    # coords within image bounds (level-0 scale)
    xy = np.asarray(feats.xy)[valid]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240


def test_extractor_translation_matching(rng):
    """Shifted image: descriptors must match and recover the displacement."""
    base = synth_image(rng, 256, 320)
    dx, dy = 7, 4
    img1 = base[: 240 - dy, : 300 - dx]
    img2 = base[dy:240, dx:300]

    ext = ORB2Extractor(num_features=400, num_levels=3)
    f1 = ext(img1)
    f2 = ext(img2)
    d = hamming.hamming_distance_matrix(f1.desc, f2.desc)
    idx, dist = matching.match_ratio_test(
        d, max_distance=64.0, ratio=0.8, valid_a=f1.valid, valid_b=f2.valid
    )
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 50
    # displacement consistency: kp1 - kp2 == (dx, dy) for true matches
    xy1 = np.asarray(f1.xy)[matched]
    xy2 = np.asarray(f2.xy)[idx[matched]]
    disp = xy1 - xy2
    err = np.abs(disp - np.array([dx, dy]))
    frac_good = (err.max(axis=1) < 2.0).mean()
    assert frac_good > 0.7, frac_good


def test_extractor_rotation_tolerance(rng):
    """Small in-plane rotation: steered BRIEF should still match."""
    import scipy.ndimage as ndi

    base = synth_image(rng, 256, 256)
    rot = ndi.rotate(base, 10.0, reshape=False, mode="nearest")
    ext = ORB2Extractor(num_features=400, num_levels=3)
    f1 = ext(base[32:224, 32:224])
    f2 = ext(rot[32:224, 32:224])
    d = hamming.hamming_distance_matrix(f1.desc, f2.desc)
    idx, _ = matching.match_ratio_test(
        d, max_distance=64.0, ratio=0.8, valid_a=f1.valid, valid_b=f2.valid
    )
    assert (np.asarray(idx) >= 0).sum() > 30


def test_pallas_fast_parity(rng):
    """Fused Pallas FAST+NMS (interpret mode on CPU) == XLA reference path."""
    from pyslam_tpu.ops import pallas_fast

    img = jnp.asarray(synth_image(rng, h=150, w=200), jnp.float32)
    ref = np.asarray(fast.nms3x3(fast.fast_score_map(img, 20.0)))
    got = np.asarray(
        pallas_fast.fast_score_map_pallas(img, 20.0, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_fast_band_boundaries(rng):
    """Corners sitting exactly on band boundaries must survive the halo'd
    banding (h chosen so corners land at rows around multiples of BAND)."""
    from pyslam_tpu.ops import pallas_fast

    h, w = 3 * pallas_fast.BAND + 17, 160
    img = np.full((h, w), 50.0, np.float32)
    for yc in (pallas_fast.BAND, 2 * pallas_fast.BAND - 1, 2 * pallas_fast.BAND):
        img[yc - 4 : yc + 4, 60:80] = 200.0
        img[yc - 4 : yc + 4, 100:120] = 220.0
    # noise breaks score ties: a perfectly flat rectangle yields equal corner
    # scores at adjacent pixels, which STRICT 3x3 NMS suppresses entirely
    img = img + rng.uniform(0.0, 2.0, (h, w)).astype(np.float32)
    img = jnp.asarray(img)
    ref = np.asarray(fast.nms3x3(fast.fast_score_map(img, 20.0)))
    got = np.asarray(
        pallas_fast.fast_score_map_pallas(img, 20.0, interpret=True)
    )
    assert ref.max() > 0  # the synthetic corners actually respond
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
