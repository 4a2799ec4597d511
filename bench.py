#!/usr/bin/env python3
"""Benchmark: end-to-end SLAM frontend FPS on one TPU chip.

Measures the fused per-frame pipeline (ORB2 extraction at 2000 features over
8 pyramid levels on a KITTI-sized 376x1241 frame + MXU Hamming matching
against a 2048-point local map + 4x10 LM pose optimization) — the hot path of
``Tracking.track`` — amortized over a stream of frames with dispatches kept in
flight (how a real tracker runs: enqueue next frame while the last finishes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 60 FPS end-to-end target from BASELINE.md (the
reference publishes no FPS numbers; its Python pipeline is explicitly
non-real-time, pyslam tracking.py:990).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyslam_tpu.pipeline import frontend_step

    rng = np.random.default_rng(0)
    h, w = 376, 1241
    M = 2048
    K = jnp.asarray(
        [[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]], jnp.float32
    )
    map_pos = jnp.asarray(
        np.concatenate(
            [rng.uniform(-10, 10, (M, 2)), rng.uniform(5, 40, (M, 1))], 1
        ).astype(np.float32)
    )
    map_desc = jnp.asarray(rng.integers(0, 2, (M, 256)).astype(np.int8))
    map_valid = jnp.ones((M,), bool)
    Tcw = jnp.eye(4, dtype=jnp.float32)

    # frame stream: a few distinct images cycled (device-resident)
    frames = [
        jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        for _ in range(4)
    ]

    def step(img):
        feats, kp_match, Tcw_opt, n_inl = frontend_step(
            img, map_pos, map_desc, map_valid, Tcw, K
        )
        return Tcw_opt, n_inl

    t0 = time.time()
    out = step(frames[0])
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"compile: {compile_s:.1f}s", file=sys.stderr)

    # warmup
    for i in range(3):
        out = step(frames[i % 4])
    jax.block_until_ready(out)

    n_iters = 40
    t0 = time.time()
    outs = [step(frames[i % 4]) for i in range(n_iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / n_iters
    fps = 1.0 / dt
    print(f"frontend: {dt*1000:.2f} ms/frame = {fps:.1f} FPS", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "slam_frontend_fps_kitti_stereo_2000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
