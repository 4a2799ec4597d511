import numpy as np
import pytest

from pyslam_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_obs_graph_basic(lib):
    g = native.NativeObsGraph()
    assert g.add_observation(10, 1, 5)
    assert not g.add_observation(10, 1, 7)  # duplicate kf ignored
    assert g.add_observation(10, 2, 9)
    assert g.num_obs(10) == 2
    assert g.point_obs(10) == {1: 5, 2: 9}
    assert g.remove_observation(10, 1) == 5
    assert g.num_obs(10) == 1
    assert g.remove_observation(10, 1) == -1


def test_obs_graph_covisibility_matches_python(lib, rng):
    g = native.NativeObsGraph()
    py = {}  # pid -> {kid: idx}
    n_pts, n_kfs = 300, 20
    for pid in range(n_pts):
        for kid in rng.choice(n_kfs, rng.integers(1, 6), replace=False):
            g.add_observation(pid, int(kid), int(rng.integers(0, 100)))
            py.setdefault(pid, {})[int(kid)] = 1
    # covisibility of kf 3: count shared points over its point set
    pids3 = [p for p, obs in py.items() if 3 in obs]
    expected = {}
    for p in pids3:
        for kid in py[p]:
            if kid != 3:
                expected[kid] = expected.get(kid, 0) + 1
    got = g.covisibility_counts(np.asarray(pids3, np.int64), exclude_kid=3)
    assert got == expected
    assert set(g.points_seen_by(3).tolist()) == set(pids3)
    assert g.total_observations() == sum(len(o) for o in py.values())

    # remove a point entirely
    g.remove_point(pids3[0])
    assert g.num_obs(pids3[0]) == 0


def test_native_hamming_matches_numpy(lib, rng):
    a = rng.integers(0, 256, (40, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (50, 32), dtype=np.uint8)
    d = native.hamming_distance_matrix_cpu(a, b)
    expected = np.zeros((40, 50), np.int32)
    for i in range(40):
        expected[i] = np.unpackbits(np.bitwise_xor(a[i][None, :], b), axis=1).sum(1)
    np.testing.assert_array_equal(d, expected)
