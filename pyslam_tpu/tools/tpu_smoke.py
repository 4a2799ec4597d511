#!/usr/bin/env python3
"""Real-TPU integration smoke test + on-chip frontend stage profile.

The pytest suite deliberately runs on a virtual CPU mesh at float64
(tests/conftest.py); this tool is the complementary check the suite cannot
provide: the full ``Slam.track`` loop executed on the REAL TPU backend at
f32, asserting finite poses and zero tracking losses for both stereo and
RGBD sensors, plus an on-chip per-stage timing breakdown of the fused
frontend (pyramid+FAST+NMS+BRIEF extraction / MXU Hamming matching /
motion-only LM pose optimization) so the "is a Pallas Hamming kernel
needed?" question (SURVEY.md section 2.12) is answered with measurements,
not guesses.

Run: ``python -m pyslam_tpu.tools.tpu_smoke`` (exits nonzero on failure).
Reference behavior mirrored: main_slam.py tracking loop; the reference has
no automated on-hardware smoke (its CI is CPU-only) — this is stricter.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _run_slam(sensor: str, n_frames: int = 25) -> dict:
    import jax

    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam
    from pyslam_tpu.slam.tracking import TrackingState

    st = SensorType.STEREO if sensor == "stereo" else SensorType.RGBD
    ds = SyntheticDataset(num_frames=n_frames, sensor_type=st, trajectory="line")
    baseline = getattr(ds, "baseline", 0.2) or 0.2
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * baseline, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=800, num_levels=4)
    slam = Slam(cam, cfg, sensor_type=st)
    lost = 0
    for i in range(len(ds)):
        kw = dict(frame_id=i, timestamp=ds.getTimestamp(i))
        if st == SensorType.STEREO:
            slam.track(ds.getImage(i), img_right=ds.getImageRight(i), **kw)
        else:
            slam.track(ds.getImage(i), depth=ds.getDepth(i), **kw)
        if slam.tracking.state == TrackingState.LOST:
            lost += 1
    ts, poses = slam.get_final_trajectory()
    poses = np.asarray(poses)
    finite = bool(np.all(np.isfinite(poses)))
    ok = finite and lost == 0 and len(ts) >= n_frames - 2
    return {
        "sensor": sensor,
        "backend": jax.default_backend(),
        "frames": len(ts),
        "lost": lost,
        "finite_poses": finite,
        "ok": ok,
    }


def _profile_frontend_stages() -> list[tuple[str, float]]:
    """Per-stage on-chip timing of the fused frontend at KITTI scale.

    Stages are jitted separately here ONLY for attribution; production runs
    the single fused graph (pyslam_tpu/pipeline.py), whose total is also
    reported as ``fused_total`` so fusion wins stay visible.
    """
    import jax
    import jax.numpy as jnp

    from pyslam_tpu.features.orb2 import _extract_jit
    from pyslam_tpu.ops import hamming, matching
    from pyslam_tpu.pipeline import frontend_step

    rng = np.random.default_rng(0)
    h, w, M, N = 376, 1241, 2048, 2000
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    map_pos = jnp.asarray(np.concatenate(
        [rng.uniform(-10, 10, (M, 2)), rng.uniform(5, 40, (M, 1))], axis=1
    ).astype(np.float32))
    map_desc = jnp.asarray(rng.integers(0, 2, (M, 256)).astype(np.int8))
    map_valid = jnp.ones((M,), bool)
    Tcw = jnp.eye(4, jnp.float32)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                    jnp.float32)
    use_pallas = jax.default_backend() == "tpu"

    extract = jax.jit(lambda im: _extract_jit(im, N, 8, 1.2, 20.0, 16, 6,
                                              use_pallas))
    feats = extract(img)

    @jax.jit
    def match(md, fd):
        dm = hamming.hamming_distance_matrix(md, fd).astype(jnp.float32)
        return matching.match_ratio_test(dm, ratio=0.9, max_dist=100.0)

    def timeit(fn, *a, n=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    stages = [
        ("extract_orb2_2000f_8lvl", timeit(extract, img)),
        ("hamming_match_2048x2000", timeit(match, map_desc, feats.desc)),
        ("fused_total", timeit(
            frontend_step, img, map_pos, map_desc, map_valid, Tcw, K)),
    ]
    return sorted(stages, key=lambda kv: -kv[1])


def main() -> int:
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)
    results = [_run_slam("stereo"), _run_slam("rgbd")]
    for r in results:
        print(f"smoke {r['sensor']}: frames={r['frames']} lost={r['lost']} "
              f"finite={r['finite_poses']} ok={r['ok']}", file=sys.stderr)
    stages = _profile_frontend_stages()
    for name, ms in stages:
        print(f"stage {name}: {ms:.2f} ms", file=sys.stderr)
    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "backend": backend,
        "smoke": results,
        "stages_ms": {k: round(v, 3) for k, v in stages},
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
