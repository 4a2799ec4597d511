"""Fixed-shape policy helpers (utils/padding.py).

The TPU path pads hot per-frame arrays to session-fixed caps (one XLA compile
per graph per session) and cold paths to a coarse 4x ladder; the CPU test
path keeps fine power-of-two buckets.  These tests pin the helpers both ways.
"""

import numpy as np
import pytest

from pyslam_tpu.utils.padding import (
    bucket_size,
    cap_select,
    pad_bucket,
    pad_fixed,
    pow2,
    set_fixed_shape_policy,
)


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    set_fixed_shape_policy(None)


def test_pow2():
    assert pow2(1) == 64          # minimum
    assert pow2(64) == 64
    assert pow2(65) == 128
    assert pow2(2000) == 2048
    assert pow2(2048) == 2048


def test_bucket_size_cpu_policy_is_pow2():
    set_fixed_shape_policy(False)
    assert bucket_size(100) == 128
    assert bucket_size(1500) == 2048
    assert bucket_size(5000) == 8192


def test_bucket_size_ladder_on_accelerator_policy():
    set_fixed_shape_policy(True)
    # coarse 4x ladder: few distinct shapes per callsite per session
    assert bucket_size(100) == 256
    assert bucket_size(1500) == 4096
    assert bucket_size(5000) == 16384
    assert bucket_size(200000) == 262144
    # beyond the ladder top: falls back to pow2
    assert bucket_size(300000) == 2 ** 19
    # minimum is respected
    assert bucket_size(10, minimum=64) == 64


def test_pad_fixed_fixed_policy():
    set_fixed_shape_policy(True)
    arr = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, valid = pad_fixed(arr, 8, fill=-1.0)
    assert padded.shape == (8, 2)
    assert valid.sum() == 5
    assert (padded[5:] == -1.0).all()
    # rows beyond the cap are dropped (callers cap_select first)
    padded, valid = pad_fixed(np.arange(12).reshape(6, 2), 4)
    assert padded.shape == (4, 2)
    assert valid.all()


def test_pad_fixed_cpu_policy_buckets():
    set_fixed_shape_policy(False)
    arr = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, valid = pad_fixed(arr, 1024)
    # CPU: fine bucket (minimum 64), NOT the big cap
    assert padded.shape[0] == 64
    assert valid.sum() == 5


def test_cap_select_even_subsample():
    ids = np.arange(100)
    out = cap_select(ids, 10)
    assert len(out) == 10
    assert out[0] == 0 and out[-1] == 99
    assert (np.diff(out) > 0).all()
    # under cap: unchanged
    assert (cap_select(ids, 200) == ids).all()


def test_cap_select_by_score_keeps_best_in_order():
    ids = np.asarray([5, 9, 2, 7, 4])
    score = np.asarray([1.0, 10.0, 3.0, 8.0, 2.0])
    out = cap_select(ids, 2, score=score)
    # best two scores are ids 9 and 7, original order preserved
    assert list(out) == [9, 7]
