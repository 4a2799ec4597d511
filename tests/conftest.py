"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (pyslam_tpu.parallel) are validated on host CPU
devices; real-TPU benchmarking happens in bench.py, not the test suite.

Note: this container's sitecustomize imports jax at interpreter start (axon
TPU tunnel), so env vars are too late — we reconfigure via jax.config before
the first backend use instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import os

# signal CPU mode to pyslam_tpu's cache guard (jax itself is configured below)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests validate the math at float64 on CPU; the TPU production path is
# f32/bf16 (ops are dtype-polymorphic).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- stability
# The full suite compiles hundreds of XLA executables (every model family)
# in ONE process; letting them accumulate eventually segfaults the CPU
# backend (observed deterministically around the ~70th test file — address-
# space/map exhaustion, not Python-visible). Dropping JAX's compilation
# caches when the suite moves to a new test file bounds the growth; each
# file re-compiles only its own graphs.
_last_test_file = [None]


def pytest_runtest_setup(item):
    f = str(item.fspath)
    if _last_test_file[0] not in (None, f):
        import gc

        jax.clear_caches()
        gc.collect()
    _last_test_file[0] = f
