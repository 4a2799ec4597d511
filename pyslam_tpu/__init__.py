"""pyslam_tpu — a TPU-native (JAX/XLA/Pallas) Visual SLAM framework.

A from-scratch re-design of the capabilities of pySLAM (luigifreda/pyslam,
reference at /root/reference) for TPU hardware:

- All numeric kernels are fixed-shape, batched JAX computations (Pallas for the
  hot ops), driven by a host-side state machine.
- Feature extraction (ORB2-class FAST+rBRIEF), matching (MXU Hamming /cosine
  distance matrices + masked top-k), RANSAC (batched hypotheses via vmap),
  bundle adjustment (batched Levenberg-Marquardt with Schur complement in
  jax.lax), TSDF voxel hashing (gather/scatter over a flat table) all run
  on-device.
- The public Python API mirrors the reference surface (``Slam``, ``track()``,
  feature tracker configs, dataset factory, map save/load) so a pySLAM user can
  switch over.  See SURVEY.md for the layer-by-layer mapping.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: SLAM graphs are large (full frontend ~1e5
# HLO ops) and TPU compiles are expensive — cache them across processes.
try:  # pragma: no cover - depends on environment
    # TPU only: CPU executables cached from the remote-compile service carry
    # foreign machine features (SIGILL risk on load) — tests run cache-free.
    if "cpu" not in _os.environ.get("JAX_PLATFORMS", "tpu").lower():
        _cache_dir = _os.environ.get(
            "PYSLAM_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/pyslam_tpu_xla")
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # persist even small graphs: the frame loop compiles ~100 helper
        # graphs besides the big fused ones, and through the remote-compile
        # tunnel each recompile costs its full XLA time again (measured
        # 113 cache misses / 14 hits on a warm second run at the old 2.0 s
        # threshold — most of the warmup was sub-2s graphs)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:
    pass

from pyslam_tpu.config_parameters import Parameters  # noqa: F401
