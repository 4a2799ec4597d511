import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import matching


def test_match_ratio_test_basic():
    # 3 A-features, 4 B-features; crafted distances
    d = jnp.asarray(
        [
            [1.0, 50.0, 60.0, 70.0],   # clear match -> 0
            [40.0, 42.0, 90.0, 95.0],  # ratio fails (40 vs 42)
            [80.0, 81.0, 5.0, 99.0],   # clear match -> 2
        ]
    )
    idx, dist = matching.match_ratio_test(d, max_distance=100.0, ratio=0.75)
    np.testing.assert_array_equal(np.asarray(idx), [0, -1, 2])
    assert float(dist[0]) == 1.0


def test_match_max_distance_gate():
    d = jnp.asarray([[120.0, 300.0]])
    idx, _ = matching.match_ratio_test(d, max_distance=100.0, ratio=0.9)
    assert int(idx[0]) == -1


def test_one_to_one_resolution():
    # both rows prefer column 0; only the closer row keeps it
    d = jnp.asarray(
        [
            [10.0, 200.0, 300.0],
            [5.0, 210.0, 320.0],
        ]
    )
    idx, _ = matching.match_ratio_test(d, max_distance=100.0, ratio=0.75)
    np.testing.assert_array_equal(np.asarray(idx), [-1, 0])


def test_valid_masks():
    d = jnp.asarray([[1.0, 2.0], [1.0, 2.0]])
    idx, _ = matching.match_ratio_test(
        d,
        max_distance=100.0,
        ratio=0.99,
        valid_a=jnp.asarray([True, False]),
        valid_b=jnp.asarray([False, True]),
    )
    # row 1 invalid; col 0 invalid -> row 0 must match col 1
    np.testing.assert_array_equal(np.asarray(idx), [1, -1])


def test_rotation_histogram_filter():
    n = 100
    ok = jnp.ones((n,), bool)
    # 90 matches consistent at ~10 deg rotation, 10 outliers at random rotations
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 360, n)
    b = np.where(np.arange(n) < 90, a - 10.0, rng.uniform(0, 360, n))
    kept = matching.rotation_histogram_filter(
        jnp.asarray(a), jnp.asarray(b), ok, num_bins=30, keep_top=3
    )
    kept = np.asarray(kept)
    assert kept[:90].all()
    # top-3-bins semantics keep stray outliers that share those bins; with 10
    # uniform outliers across 30 bins only a few can survive
    assert kept[90:].sum() <= 5


def test_row_stereo_match():
    # A at rows [0, 0, 5]; B at rows [0, 5]; disparities valid only for pairs
    d = jnp.asarray([[1.0, 1.0], [1.0, 1.0], [1.0, 1.0]], jnp.float32)
    rows_a = jnp.asarray([0.0, 0.0, 5.0])
    rows_b = jnp.asarray([0.0, 5.0])
    disp = jnp.asarray([[10.0, 10.0], [-5.0, 10.0], [10.0, 10.0]])
    idx, _ = matching.row_stereo_match(
        d, rows_a, rows_b, disp, max_distance=100.0, row_tol=2.0,
        min_disp=0.0, max_disp=100.0,
    )
    idx = np.asarray(idx)
    # row0: only col0 in-row & positive disp -> 0 (row1 has disp<0 for col0)
    assert idx[0] == 0 or idx[1] == 0
    assert idx[2] == 1
