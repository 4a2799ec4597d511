"""Real-image sanity tests on KITTI frames shipped with the reference repo.

These use actual camera images (KITTI 06 frames 1 and 12, plus a stereo
left/right pair) to validate the feature engine + matcher + two-view geometry
beyond the synthetic renderer. Skipped when the assets aren't mounted.
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test images not mounted"
)


def _load(name):
    from pyslam_tpu.io.dataset import _imread_gray

    return _imread_gray(os.path.join(DATA, name))


@pytest.fixture(scope="module")
def extractor():
    from pyslam_tpu.features.orb2 import ORB2Extractor

    return ORB2Extractor(num_features=1000, num_levels=4)


def test_orb2_on_real_kitti_frame(extractor):
    feats = extractor(_load("kitti06-12.png"))
    valid = np.asarray(feats.valid)
    assert valid.sum() > 800, f"only {valid.sum()} keypoints on a real frame"
    xy = np.asarray(feats.xy)[valid]
    # keypoints spread over the image, not clustered in one corner
    assert xy[:, 0].std() > 150 and xy[:, 1].std() > 40
    # descriptors are not degenerate (bits are balanced-ish)
    desc = np.asarray(feats.desc)[valid]
    bit_mean = desc.mean()
    assert 0.3 < bit_mean < 0.7


def test_two_view_matching_real_kitti():
    """The two KITTI 06 test frames are ground-truth poses 12 and 16 (~5 m of
    forward travel; verified by scanning GT pose pairs for peak epipolar
    consistency).  Matching must produce enough matches AND most must satisfy
    the GROUND-TRUTH essential matrix — this measures true match precision,
    not self-consistency.  OpenCV ORB (2000 feats, 8 levels, same ratio test)
    scores 80 matches at 65% GT-precision on this pair; we assert >=100
    matches at >=50%."""
    import jax.numpy as jnp

    from pyslam_tpu.features.orb2 import ORB2Extractor
    from pyslam_tpu.ops import hamming, matching

    gt_path = "/root/reference/data/videos/kitti06/06.txt"
    if not os.path.isfile(gt_path):
        pytest.skip("KITTI 06 GT poses not mounted")
    P = np.loadtxt(gt_path).reshape(-1, 3, 4)

    def Twc(i):
        M = np.eye(4)
        M[:3] = P[i]
        return M

    T21 = np.linalg.inv(Twc(16)) @ Twc(12)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R

    ex = ORB2Extractor(num_features=2000, num_levels=8)
    f1 = ex(_load("kitti06-01.png"))
    f2 = ex(_load("kitti06-12.png"))
    d = hamming.hamming_distance_matrix(f1.desc, f2.desc).astype(jnp.float32)
    idx, _ = matching.match_ratio_test(
        d, 100.0, ratio=0.8, valid_a=f1.valid, valid_b=f2.valid
    )
    idx = np.asarray(idx)
    rows = np.nonzero(idx >= 0)[0]
    assert len(rows) >= 100, f"only {len(rows)} matches across ~5m of travel"

    fx, fy, cx, cy = 707.0912, 707.0912, 601.8873, 183.1104  # KITTI 04-12
    x1 = (np.asarray(f1.xy)[rows] - (cx, cy)) / (fx, fy)
    x2 = (np.asarray(f2.xy)[idx[rows]] - (cx, cy)) / (fx, fy)
    h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
    h2 = np.concatenate([x2, np.ones((len(x2), 1))], 1)
    Ex1 = h1 @ E_gt.T
    Etx2 = h2 @ E_gt
    sampson = np.sum(h2 * Ex1, 1) ** 2 / (
        Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    )
    precision = float((sampson < (3.0 / fx) ** 2).mean())
    assert precision >= 0.5, (
        f"GT-epipolar precision {precision:.2f} over {len(rows)} matches"
    )


def test_stereo_row_matching_real_pair(extractor):
    """Left/right KITTI pair: stereo matches must land on the same row with
    positive disparity."""
    import jax.numpy as jnp

    from pyslam_tpu.ops import hamming, matching

    fl = extractor(_load("kitti06-12.png"))
    fr = extractor(_load("kitti06-12-R.png"))
    d = hamming.hamming_distance_matrix(fl.desc, fr.desc).astype(jnp.float32)
    disp = jnp.asarray(fl.xy)[:, 0:1] - jnp.asarray(fr.xy)[None, :, 0]
    idx, dist = matching.row_stereo_match(
        d,
        jnp.asarray(fl.xy)[:, 1],
        jnp.asarray(fr.xy)[:, 1],
        disp,
        max_distance=64.0,
        row_tol=2.0,
        min_disp=0.5,
        max_disp=200.0,
        valid_a=fl.valid,
        valid_b=fr.valid,
    )
    idx = np.asarray(idx)
    rows = np.nonzero(idx >= 0)[0]
    assert len(rows) > 150, f"only {len(rows)} stereo matches"
    xl = np.asarray(fl.xy)[rows]
    xr = np.asarray(fr.xy)[idx[rows]]
    d_px = xl[:, 0] - xr[:, 0]
    assert np.all(np.abs(xl[:, 1] - xr[:, 1]) <= 2.0 + 1e-3)
    assert np.all(d_px > 0), "disparities must be positive"
