#!/usr/bin/env python3
"""End-to-end stereo SLAM benchmark on one TPU chip.

Honest measurement of the BASELINE.md target ("end-to-end stereo SLAM FPS on
KITTI: extract + match + depth + TSDF"): runs the REAL ``Slam.track()`` on a
KITTI-sized (376x1241) synthetic stereo stream — fused stereo frame
construction (left+right ORB2 extraction at 2000 features/8 levels + row
stereo match + sparse depth), fused map tracking, keyframe creation, local
mapping (triangulation/fuse/LBA) amortized in-stream, plus per-keyframe TSDF
integration of the stereo depth.  Frames are pre-rendered so host rendering
cost is excluded; everything else (H2D, dispatch, readbacks, host
bookkeeping, back-end) is included in the steady-state timing.

Reports steady-state FPS over the timed window plus latency percentiles
(p50/p95 overall and p95 on keyframe frames — the latency spike the async
back-end must bound) and the separately-measured TSDF integration rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline against the 60 FPS end-to-end target from BASELINE.md (the
reference publishes no FPS numbers; its Python pipeline is explicitly
non-real-time, pyslam tracking.py:990).
"""

import json
import os
import sys
import time

import numpy as np

H, W = 376, 1241          # KITTI odometry frame
FX = 718.856
BASELINE_M = 0.54          # KITTI stereo baseline
N_FEATURES = 2000
N_LEVELS = 8
N_FRAMES = int(os.environ.get("BENCH_FRAMES", 120))
N_WARMUP = int(os.environ.get("BENCH_WARMUP", 18))
TARGET_FPS = 60.0
KF_DEBUG = os.environ.get("BENCH_KF_DEBUG", "") == "1"


class CompileCounter:
    """Counts XLA compiles via jax's own compile-log records; lets the bench
    assert ZERO steady-state recompilation (fixed-shape policy)."""

    def __init__(self):
        import logging

        self.events = []   # (wall_time, message)
        self.cache_hits = 0

        outer = self

        class H(logging.Handler):
            def emit(h, record):
                msg = record.getMessage()
                if "Compiling" in msg:
                    self.events.append((time.perf_counter(), msg.split("\n")[0]))
                if "Persistent compilation cache hit" in msg:
                    outer.cache_hits += 1

        self.handler = H()

    def install(self):
        import logging

        import jax

        jax.config.update("jax_log_compiles", True)
        jax.config.update("jax_explain_cache_misses", False)
        for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                     "jax._src.compiler", "jax._src.compilation_cache"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            lg.addHandler(self.handler)
            # keep the per-op "Finished tracing ..." WARNING spam (a side
            # effect of jax_log_compiles) out of stderr; our handler above
            # still records the "Compiling ..." events
            lg.propagate = False

    def count_since(self, t0: float) -> int:
        return sum(1 for t, _ in self.events if t >= t0)

    def since(self, t0: float):
        return [m for t, m in self.events if t >= t0]


def build_stream():
    from pyslam_tpu.io.dataset import SyntheticDataset, SyntheticWorld
    from pyslam_tpu.io.dataset_types import SensorType

    # world must outrun the trajectory: the line covers N_FRAMES*step meters
    # and the box world's far wall sits at z = extent*1.4 — keep >=30 m of
    # clearance or tracking legitimately collapses when the camera closes on
    # the wall (an input degeneracy, not a SLAM property to measure)
    extent = max(60.0, (N_FRAMES * 0.8 + 30.0) / 1.4)
    world = SyntheticWorld(n_points=16000, extent=extent,
                           depth_range=(4.0, 80.0))
    ds = SyntheticDataset(
        num_frames=N_FRAMES, h=H, w=W, fx=FX, baseline=BASELINE_M,
        trajectory="line", step=0.8, sensor_type=SensorType.STEREO,
        world=world,
    )
    import os
    cache = (f"/tmp/pyslam_tpu_bench_frames_{N_FRAMES}x{H}x{W}"
             f"_e{int(extent)}n16000.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        left, right, ts = z["left"], z["right"], z["ts"]
        frames = [(left[i], right[i], float(ts[i])) for i in range(N_FRAMES)]
        return ds, frames
    print(f"pre-rendering {N_FRAMES} stereo frames ...", file=sys.stderr)
    frames = [
        (ds.getImage(i), ds.getImageRight(i), ds.getTimestamp(i))
        for i in range(N_FRAMES)
    ]
    np.savez(
        cache,
        left=np.stack([f[0] for f in frames]).astype(np.uint8),
        right=np.stack([f[1] for f in frames]).astype(np.uint8),
        ts=np.asarray([f[2] for f in frames]),
    )
    return ds, frames


def build_slam(ds):
    from pyslam_tpu.dense.volumetric_integrator import (
        VolumetricIntegratorType,
        volumetric_integrator_factory,
    )
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    from pyslam_tpu.config_parameters import Parameters

    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=35.0,
    )
    cfg = FeatureTrackerConfig(num_features=N_FEATURES, num_levels=N_LEVELS)
    slam = Slam(cam, cfg, sensor_type=SensorType.STEREO)
    # stereo has no native dense depth: the integrator estimates it with the
    # on-device SGM matcher per keyframe (the "depth" part of the target)
    Parameters.kVolumetricIntegrationUseDepthEstimator = True
    Parameters.kVolumetricIntegrationDepthEstimatorType = "sgbm"
    Parameters.kVolumetricIntegrationDepthTruncOutdoor = 40.0
    integrator = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=cam,
        environment_type=type("E", (), {"name": "OUTDOOR"})(),
        voxel_size=0.2, sdf_trunc=0.6,
    )
    slam.set_volumetric_integrator(integrator)
    return slam, integrator


def bench_tsdf_rate(integrator, camera):
    """Standalone TSDF integration rate (KITTI-sized depth images)."""
    import jax

    rng = np.random.default_rng(3)
    depths = [
        np.clip(rng.uniform(4.0, 60.0, (H, W)), 0, None).astype(np.float32)
        for _ in range(3)
    ]
    inten = rng.uniform(0, 255, (H, W)).astype(np.float32)
    Twc = np.eye(4)
    vol = integrator.volume
    vol.integrate(depths[0], inten, Twc, camera.K)   # compile
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        vol.integrate(depths[i % 3], inten, Twc, camera.K)
    jax.block_until_ready(vol.table.tsdf)
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def eval_bench_ate(slam, ds):
    """ATE of the tracked trajectory vs the synthetic GT (VERDICT r4 ask #3:
    the bench must guard accuracy so FPS work can't silently spend it)."""
    from pyslam_tpu.evaluation.metrics import eval_ate

    ts, poses = slam.get_final_trajectory()
    gt_t = np.asarray([ds.getTimestamp(i) for i in range(len(ds))])
    gt_p = ds.poses[: len(ds), :3, 3]
    res = eval_ate(ts, poses[:, :3, 3], gt_t, gt_p, align=True,
                   with_scale=False)
    return float(res.rmse)


def bench_loop_closure(cc):
    """Second bench stage: a revisiting trajectory at the SAME KITTI-sized
    frame/feature config (so every graph reuses the main stage's compiles),
    with the DBOW3-class loop detector attached — detector + Sim3 + PGO +
    GBA correction costs land in the committed artifact (VERDICT r4 ask #7).
    Returns a dict of loop_* fields."""
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset, SyntheticWorld
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    n_frames = int(os.environ.get("BENCH_LOOP_FRAMES", 150))
    period = int(os.environ.get("BENCH_LOOP_PERIOD", 130))
    world = SyntheticWorld(n_points=16000, extent=30.0,
                           depth_range=(4.0, 80.0))
    ds = SyntheticDataset(
        num_frames=n_frames, h=H, w=W, fx=FX, baseline=BASELINE_M,
        trajectory="loop", period=period, sensor_type=SensorType.STEREO,
        world=world,
    )
    cache = (f"/tmp/pyslam_tpu_bench_loop_{n_frames}x{H}x{W}_p{period}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z["left"][i], z["right"][i], float(z["ts"][i]))
                  for i in range(n_frames)]
    else:
        print(f"pre-rendering {n_frames} loop frames ...", file=sys.stderr)
        frames = [(ds.getImage(i), ds.getImageRight(i), ds.getTimestamp(i))
                  for i in range(n_frames)]
        np.savez(cache,
                 left=np.stack([f[0] for f in frames]).astype(np.uint8),
                 right=np.stack([f[1] for f in frames]).astype(np.uint8),
                 ts=np.asarray([f[2] for f in frames]))

    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=35.0,
    )
    cfg = FeatureTrackerConfig(num_features=N_FEATURES, num_levels=N_LEVELS)
    slam = Slam(cam, cfg, loop_detector_config="DBOW3",
                sensor_type=SensorType.STEREO)

    lats = []
    t0_stage = time.perf_counter()
    for i, (l, r, ts) in enumerate(frames):
        nxt = None
        if i + 1 < n_frames:
            nl, nr, nts = frames[i + 1]
            nxt = {"img": nl, "img_right": nr, "frame_id": i + 1,
                   "timestamp": nts}
        t0 = time.perf_counter()
        slam.track(l, img_right=r, frame_id=i, timestamp=ts, next_input=nxt)
        lats.append(time.perf_counter() - t0)
    slam.finish()
    wall = time.perf_counter() - t0_stage
    lats_ms = np.asarray(lats[8:]) * 1e3
    ate = eval_bench_ate(slam, ds)
    n_closed = (slam.loop_closing.num_loops_closed
                if slam.loop_closing is not None else 0)
    print(
        f"loop stage: {n_frames / wall:.1f} FPS, {n_closed} loops closed, "
        f"ATE {ate:.3f} m, p95 {np.percentile(lats_ms, 95):.0f} ms, "
        f"max-frame {lats_ms.max():.0f} ms "
        f"(the correction-event latency spike)",
        file=sys.stderr,
    )
    return {
        "loop_fps": round(n_frames / wall, 2),
        "loop_num_closed": int(n_closed),
        "loop_ate_rmse_m": round(ate, 3),
        "loop_p95_ms": round(float(np.percentile(lats_ms, 95)), 1),
        "loop_max_frame_ms": round(float(lats_ms.max()), 1),
        "loop_n_tracked": len(slam.tracking.history.timestamps),
        "loop_n_frames": n_frames,
    }


def main():
    t_start = time.perf_counter()
    cc = CompileCounter()
    cc.install()
    ds, frames = build_stream()
    t_data_prep = time.perf_counter() - t_start
    t_fw0 = time.perf_counter()
    slam, integrator = build_slam(ds)
    t_fw_init = time.perf_counter() - t_fw0
    # compile the fallback-chain + LBA graph variants up front so the
    # steady-state window is compile-free by construction (asserted below)
    t0 = time.perf_counter()
    slam.prewarm()
    print(f"prewarm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if KF_DEBUG:
        from pyslam_tpu.config_parameters import Parameters

        Parameters.kLogKeyFrameDecision = True
    if os.environ.get("BENCH_PIPELINE_DEPTH"):
        from pyslam_tpu.config_parameters import Parameters

        Parameters.kTrackingPipelineDepth = int(
            os.environ["BENCH_PIPELINE_DEPTH"])
        print(f"ablation: pipeline depth = "
              f"{Parameters.kTrackingPipelineDepth}", file=sys.stderr)
    # ablation knobs for latency attribution (single device queue: back-end
    # dispatches serialize with the frame-critical graphs)
    if os.environ.get("BENCH_NO_TSDF") == "1":
        slam.volumetric_integrator = None
        slam.local_mapping.volumetric_integrator = None
        print("ablation: TSDF integration disabled", file=sys.stderr)
    if os.environ.get("BENCH_NO_LBA") == "1":
        slam.local_mapping._lba_dispatch = lambda kf, window_size=None: None
        print("ablation: LBA disabled", file=sys.stderr)
    if os.environ.get("BENCH_NO_BACKEND") == "1":
        slam.local_mapping.step_async = lambda: False
        slam.local_mapping.harvest = lambda: False
        print("ablation: entire back-end disabled", file=sys.stderr)

    from pyslam_tpu.utils.profiling import device_counters

    lats = []          # per-frame wall latency (timed window)
    kf_flags = []      # was a keyframe created on this frame?
    t_bench_0 = None
    n_kf_before = 0
    counters_0 = None

    t_frame0 = None
    for i, (img_l, img_r, ts) in enumerate(frames):
        if i == 0:
            t_frame0 = time.perf_counter()
        if i == N_WARMUP:
            t_bench_0 = time.perf_counter()
            counters_0 = device_counters.snapshot()
        # pipelined loop: hand the next frame to track() so its extraction
        # dispatch overlaps this frame's readback + host work
        nxt = None
        if i + 1 < len(frames):
            nl, nr, nts = frames[i + 1]
            nxt = {"img": nl, "img_right": nr, "frame_id": i + 1,
                   "timestamp": nts}
        t0 = time.perf_counter()
        slam.track(img_l, img_right=img_r, frame_id=i, timestamp=ts,
                   next_input=nxt)
        t1 = time.perf_counter()
        n_kf = slam.map.num_keyframes()
        if i >= N_WARMUP:
            lats.append(t1 - t0)
            kf_flags.append(n_kf > n_kf_before)
        n_kf_before = n_kf
        if i % 10 == 0 or (t1 - t0) > 5.0:
            print(
                f"  frame {i}: {1e3*(t1-t0):.0f}ms "
                f"(kfs={n_kf}, pts={slam.map.num_points()})",
                file=sys.stderr, flush=True,
            )
    t_bench_1 = time.perf_counter()
    counters_1 = device_counters.snapshot()
    slam.finish()
    t_drain = time.perf_counter() - t_bench_1

    n_timed = len(lats)
    n_disp = counters_1[0] - counters_0[0]
    n_read = counters_1[1] - counters_0[1]
    n_upl = counters_1[2] - counters_0[2]
    wall = t_bench_1 - t_bench_0 + t_drain  # include residual back-end drain
    fps = n_timed / wall
    lats_ms = np.asarray(lats) * 1e3
    kf_flags = np.asarray(kf_flags)
    p50 = float(np.percentile(lats_ms, 50))
    p95 = float(np.percentile(lats_ms, 95))
    kf_p95 = (
        float(np.percentile(lats_ms[kf_flags], 95)) if kf_flags.any() else -1.0
    )
    n_tracked = len(slam.tracking.history.timestamps)
    n_kfs = slam.map.num_keyframes()
    tsdf_n = integrator.volume.num_voxels()

    n_recompiles = cc.count_since(t_bench_0)
    print(
        f"steady-state: {fps:.1f} FPS over {n_timed} frames "
        f"(wall {wall:.2f}s incl. {t_drain*1e3:.0f}ms drain) | "
        f"latency p50 {p50:.1f}ms p95 {p95:.1f}ms kf-frame p95 {kf_p95:.1f}ms | "
        f"{n_tracked}/{N_FRAMES} tracked, {n_kfs} KFs, {tsdf_n} TSDF voxels | "
        f"{n_disp/max(n_timed,1):.1f} dispatches + {n_read/max(n_timed,1):.1f}"
        f" readbacks + {n_upl/max(n_timed,1):.1f} uploads per frame | "
        f"{n_recompiles} XLA compiles after warmup",
        file=sys.stderr,
    )
    if n_recompiles:
        for m in cc.since(t_bench_0)[:20]:
            print(f"  post-warmup compile: {m}", file=sys.stderr)
    if slam.timings() is not None:
        print(slam.timings_summary(), file=sys.stderr)

    # accuracy guard: the tracked trajectory's ATE vs synthetic GT.  The
    # ceiling makes FPS-for-accuracy trades (LBA iteration trims, TSDF band
    # caps, pipelined staleness) VISIBLE: spending accuracy fails the bench.
    ate_rmse = eval_bench_ate(slam, ds)
    ate_max = float(os.environ.get("BENCH_ATE_MAX", 3.0))
    print(f"trajectory ATE rmse: {ate_rmse:.3f} m "
          f"(ceiling {ate_max}) over {N_FRAMES * 0.8:.0f} m path",
          file=sys.stderr)

    tsdf_rate = bench_tsdf_rate(integrator, slam.camera)
    print(f"TSDF integration: {tsdf_rate:.1f} frames/s standalone",
          file=sys.stderr)

    loop_fields = {}
    if os.environ.get("BENCH_NO_LOOP_STAGE") != "1":
        loop_fields = bench_loop_closure(cc)

    print(
        json.dumps(
            {
                "metric": "slam_e2e_stereo_fps_kitti_sized_2000feat_tsdf",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                # evidence fields (VERDICT r03 #5: data, not prose)
                "p50_ms": round(p50, 1),
                "p95_ms": round(p95, 1),
                "kf_p95_ms": round(kf_p95, 1),
                "n_keyframes": n_kfs,
                "n_tracked": n_tracked,
                "n_frames": N_FRAMES,
                "ate_rmse_m": round(ate_rmse, 3),
                "ate_ceiling_m": ate_max,
                "dispatches_per_frame": round(n_disp / max(n_timed, 1), 2),
                "readbacks_per_frame": round(n_read / max(n_timed, 1), 2),
                "uploads_per_frame": round(n_upl / max(n_timed, 1), 2),
                "recompiles_after_warmup": n_recompiles,
                "warmup_seconds": round(t_bench_0 - t_frame0, 1),
                # startup split (VERDICT r4 weak #6): one-off synthetic data
                # rendering vs real framework construction cost
                "data_prep_seconds": round(t_data_prep, 1),
                "framework_init_seconds": round(t_fw_init, 1),
                "startup_seconds": round(t_frame0 - t_start, 1),
                "xla_cache_hits": cc.cache_hits,
                # every "Compiling ..." event that did not end in a
                # persistent-cache hit paid a real XLA compile
                "xla_cache_misses": max(0, len(cc.events) - cc.cache_hits),
                "tsdf_fps_standalone": round(tsdf_rate, 1),
                **loop_fields,
            }
        )
    )
    assert n_recompiles == 0, (
        f"fixed-shape policy violated: {n_recompiles} post-warmup compiles"
    )
    assert ate_rmse < ate_max, (
        f"accuracy guard tripped: ATE {ate_rmse:.3f} m >= {ate_max} m"
    )


if __name__ == "__main__":
    main()
