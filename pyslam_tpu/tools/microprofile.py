#!/usr/bin/env python3
"""Per-graph on-chip microprofile: RTT vs device-compute split.

For each hot per-frame graph (stereo extraction, fused tracking step, TSDF
integrate, SGM depth) measures:
  - ``single``: one dispatch + block_until_ready (includes tunnel RTT)
  - ``amortized``: N back-to-back dispatches, one block at the end — the
    device-compute cost per call with dispatch pipelining hiding the RTT

The gap between the two is what frame-loop pipelining (overlapping frame
N's readback with frame N+1's dispatch) can recover.  Results feed
PARITY.md's performance section; reference comparison point is SURVEY §3.1
(pySLAM's per-frame hot path has no accelerator round trips at all).

Run: ``python -m pyslam_tpu.tools.microprofile`` on a TPU host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 376, 1241
N_FEATURES = 2000
N_LEVELS = 8
# pipelined-dispatch depth: the axon tunnel misbehaves (INVALID_ARGUMENT on
# later ops) when ~20 un-harvested dispatches queue up, so keep this modest —
# it is also the realistic frame-loop pipelining depth (1-2 frames ahead)
REPS = 6


# TPU v5e single-chip public peaks: 394 TFLOP/s bf16 systolic array (f32
# programs sit under this same ceiling via decomposition) and ~819 GB/s HBM
# bandwidth.  MFU/roofline columns are computed against these.
V5E_PEAK_FLOPS = 394e12
V5E_HBM_BYTES_S = 819e9


def _timeit(dispatch, ready, reps=REPS):
    """(single_ms, amortized_ms): one blocking call vs pipelined calls."""
    out = dispatch()
    ready(out)                      # warm/compile
    t0 = time.perf_counter()
    out = dispatch()
    ready(out)
    single = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dispatch()
    ready(out)
    amort = (time.perf_counter() - t0) * 1e3 / reps
    return round(single, 2), round(amort, 2)


def _cost(jit_fn, *args, **kwargs):
    """FLOPs + bytes-accessed of the compiled executable
    (``Compiled.cost_analysis()`` — XLA's own static cost model)."""
    try:
        c = jit_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {
            "flops": float(c.get("flops", -1.0)),
            "bytes": float(c.get("bytes accessed", -1.0)),
        }
    except Exception as e:   # pragma: no cover - backend-dependent
        return {"error": repr(e)[:120]}


def _roofline(sec: dict, cost: dict) -> dict:
    """Attach achieved-FLOP/s, MFU vs v5e peak, and HBM-roofline columns to
    a timed section (amortized time = device compute with RTT hidden)."""
    t_s = sec.get("amortized", 0.0) / 1e3
    if "flops" in cost and cost["flops"] > 0 and t_s > 0:
        sec["gflops"] = round(cost["flops"] / 1e9, 3)
        sec["achieved_gflops_s"] = round(cost["flops"] / t_s / 1e9, 1)
        sec["mfu_pct_v5e_peak"] = round(
            100.0 * cost["flops"] / t_s / V5E_PEAK_FLOPS, 3)
    if "bytes" in cost and cost["bytes"] > 0 and t_s > 0:
        sec["bytes_mb"] = round(cost["bytes"] / 1e6, 1)
        sec["hbm_bw_pct_roofline"] = round(
            100.0 * (cost["bytes"] / t_s) / V5E_HBM_BYTES_S, 1)
    if "error" in cost:
        sec["cost_error"] = cost["error"]
    return sec


def _section(results, key, fn):
    try:
        results[key] = fn()
    except Exception as e:   # keep profiling the rest
        results[key] = {"error": repr(e)[:200]}
    print(f"## {key}: {json.dumps(results[key])}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}

    # 0. raw tunnel RTT: tiny transfer round trip
    one = jnp.zeros((1,), jnp.float32) + 1.0
    jax.block_until_ready(one)
    f = jax.jit(lambda x: x + 1.0)
    f(one).block_until_ready()
    _section(
        results, "rtt_tiny_add_readback_ms",
        lambda: dict(zip(("single", "amortized"),
                         _timeit(lambda: f(one), lambda o: np.asarray(o)))),
    )

    # 1. stereo ORB2 extraction (the Frame constructor's fused path)
    from pyslam_tpu.features.orb2 import ORB2Extractor

    rng = np.random.default_rng(0)
    img_l = rng.integers(0, 255, (H, W), dtype=np.uint8)
    img_r = np.roll(img_l, 7, axis=1)
    ex = ORB2Extractor(num_features=N_FEATURES, num_levels=N_LEVELS)
    from pyslam_tpu.features.orb2 import _extract_stereo_jit

    def run_stereo():
        return _extract_stereo_jit(
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.float32(388.0), jnp.float32(192.0),
            ex.num_features, ex.num_levels, ex.scale_factor,
            float(ex.fast_threshold), ex.cell, ex.per_cell,
            ex.use_pallas, 100.0, 2.0,
        )

    # NOTE: the stereo-extract section runs LAST — on the experimental axon
    # backend, timing this graph occasionally leaves the process's backend
    # poisoned (every later program fails with INVALID_ARGUMENT), so it must
    # not precede the other sections.  (The production frame loop is
    # unaffected: it interleaves extraction with readbacks every frame.)

    # 2. fused tracking step at session caps (2048 prev / 8192 map points)
    from pyslam_tpu.ops.fused_tracking import track_frame_fused_indexed

    N = N_FEATURES
    capk, capm, capstore = 2048, 8192, 16384
    kps = rng.uniform(0, 300, (N, 2)).astype(np.float32)
    levels = rng.integers(0, 8, (N,)).astype(np.int32)
    des = rng.integers(0, 2, (N, 256)).astype(np.int8)
    valid = np.ones((N,), bool)
    kps_ur = np.full((N,), -1.0, np.float32)
    pos = rng.uniform(-5, 5, (capstore, 3)).astype(np.float32)
    sdesc = rng.integers(0, 2, (capstore, 256)).astype(np.int8)
    normal = np.tile([0, 0, 1.0], (capstore, 1)).astype(np.float32)
    dmin = np.full((capstore,), 0.1, np.float32)
    dmax = np.full((capstore,), 50.0, np.float32)
    svalid = np.ones((capstore,), bool)
    idx_prev = np.arange(capk, dtype=np.int32) % capstore
    idx_map = np.arange(capm, dtype=np.int32) % capstore
    K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
    args = [
        jnp.asarray(kps), jnp.asarray(levels), jnp.asarray(des),
        jnp.asarray(valid), jnp.asarray(kps_ur),
        jnp.asarray(pos), jnp.asarray(sdesc), jnp.asarray(normal),
        jnp.asarray(dmin), jnp.asarray(dmax), jnp.asarray(svalid),
        jnp.asarray(idx_prev), jnp.asarray(idx_map),
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(K),
        jnp.asarray(np.array([0, W, 0, H], np.float32)),
        jnp.asarray((1.2 ** np.arange(8)).astype(np.float32)),
        jnp.asarray((1.2 ** (2 * np.arange(8))).astype(np.float32)),
        jnp.float32(388.0), jnp.float32(15.0), jnp.float32(30.0),
        jnp.float32(3.0), jnp.float32(50.0), jnp.float32(0.9),
    ]

    def run_fused():
        return track_frame_fused_indexed(*args, min_prev_matches=20)

    def _fused_sec():
        sec = dict(zip(("single", "amortized"),
                       _timeit(run_fused, lambda o: np.asarray(o))))
        return _roofline(sec, _cost(
            track_frame_fused_indexed, *args, min_prev_matches=20))

    _section(results, "fused_tracking_2048p_8192m_ms", _fused_sec)

    # 3. TSDF integrate (KITTI-sized depth).  Inputs are PRE-UPLOADED device
    # arrays: in the production pipeline depth comes from the on-device SGM
    # fast path and the table never leaves HBM, so per-call host->device
    # uploads must not be charged to the integrate graph (they dominated the
    # round-3 number: 253 ms "amortized" vs ~0.1 ms true chained cost).
    from pyslam_tpu.dense.tsdf import TSDFVolume

    vol = TSDFVolume(voxel_size=0.2, sdf_trunc=0.6, depth_trunc=40.0)
    depth_d = jnp.asarray(
        np.clip(rng.uniform(4, 60, (H, W)), 0, None).astype(np.float32))
    inten_d = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    Twc = jnp.asarray(np.eye(4, dtype=np.float32))
    jax.block_until_ready((depth_d, inten_d))

    def run_tsdf():
        vol.integrate(depth_d, inten_d, Twc, K)
        return vol.table.tsdf

    def _tsdf_sec():
        s, a = _timeit(run_tsdf, lambda o: jax.block_until_ready(o), reps=6)
        sec = {"single": s, "amortized": a,
               "stride": vol.stride, "capacity": vol.capacity}
        # graph cost = update generation + hash insert (the two jits the
        # integrate call chains)
        from pyslam_tpu.dense import tsdf as tsdf_mod
        from pyslam_tpu.ops import voxel_hash as vh

        Kd = jnp.asarray(K)
        upd = tsdf_mod.depth_to_voxel_updates(
            depth_d, inten_d, Twc, Kd, vol.voxel_size, vol.sdf_trunc,
            vol.depth_trunc, vol.stride, vol.band_steps, 0, 1)
        c1 = _cost(tsdf_mod.depth_to_voxel_updates, depth_d, inten_d, Twc,
                   Kd, vol.voxel_size, vol.sdf_trunc, vol.depth_trunc,
                   vol.stride, vol.band_steps, 0, 1)
        c2 = _cost(vh.insert_and_accumulate, vol.table, *upd)
        cost = {}
        if "flops" in c1 and "flops" in c2:
            cost = {"flops": c1["flops"] + c2["flops"],
                    "bytes": c1["bytes"] + c2["bytes"]}
        elif "error" in c1 or "error" in c2:
            cost = {"error": c1.get("error") or c2.get("error")}
        return _roofline(sec, cost)

    _section(results, "tsdf_integrate_kitti_frame_ms", _tsdf_sec)

    # 4. SGM stereo depth (volumetric integrator's depth provider)
    try:
        from pyslam_tpu.depth_estimation.sgm import sgm_disparity

        iml = jnp.asarray(img_l, jnp.float32)
        imr = jnp.asarray(img_r, jnp.float32)

        def run_sgm():
            # 64 = the production SgbmDepthEstimator default (max_disp=128
            # crashes the remote compile helper — program too large)
            return sgm_disparity(iml, imr, max_disp=64)

        single, amort = _timeit(run_sgm, lambda o: jax.block_until_ready(o),
                                reps=5)
        results["sgm_depth_64disp_ms"] = _roofline(
            {"single": single, "amortized": amort},
            _cost(sgm_disparity, iml, imr, max_disp=64))
    except Exception as e:   # pragma: no cover - informative fallback
        results["sgm_depth_64disp_ms"] = {"error": str(e)[:120]}
    print(f"## sgm_depth_64disp_ms: {json.dumps(results['sgm_depth_64disp_ms'])}",
          file=sys.stderr, flush=True)

    # 5. pose optimization alone (legacy path cost reference)
    from pyslam_tpu.ops import optim

    pts3d = rng.uniform(-5, 5, (capk, 3)).astype(np.float32)
    uv = rng.uniform(0, 300, (capk, 2)).astype(np.float32)
    ur = np.full((capk,), -1.0, np.float32)
    s2 = np.ones((capk,), np.float32)
    pvalid = np.ones((capk,), bool)

    def run_pose():
        return optim.pose_optimization(
            jnp.asarray(np.eye(4, dtype=np.float32)),
            jnp.asarray(pts3d), jnp.asarray(uv), jnp.asarray(ur),
            jnp.asarray(s2), jnp.asarray(pvalid), jnp.asarray(K), bf=388.0,
        )[0]

    def _pose_sec():
        sec = dict(zip(("single", "amortized"),
                       _timeit(run_pose, lambda o: np.asarray(o))))
        return _roofline(sec, _cost(
            optim.pose_optimization,
            jnp.asarray(np.eye(4, dtype=np.float32)),
            jnp.asarray(pts3d), jnp.asarray(uv), jnp.asarray(ur),
            jnp.asarray(s2), jnp.asarray(pvalid), jnp.asarray(K), bf=388.0))

    _section(results, "pose_opt_2048obs_ms", _pose_sec)

    # 6. back-end graphs (the ablation showed these dominate steady-state
    # frame latency: they serialize with the frontend on one device queue)
    from pyslam_tpu.ops import slam_matching

    def _tri_sec():
        B = 10
        kps1 = rng.uniform(0, 300, (N, 2)).astype(np.float32)
        lv1 = rng.integers(0, 8, (N,)).astype(np.int32)
        d1 = rng.integers(0, 2, (N, 256)).astype(np.int8)
        free1 = np.ones((N,), bool)
        kps2 = rng.uniform(0, 300, (B, N, 2)).astype(np.float32)
        lv2 = rng.integers(0, 8, (B, N)).astype(np.int32)
        d2 = rng.integers(0, 2, (B, N, 256)).astype(np.int8)
        free2 = np.ones((B, N), bool)
        F = rng.normal(size=(B, 3, 3)).astype(np.float32)
        ep = rng.uniform(0, 300, (B, 2)).astype(np.float32)
        s2l = (1.2 ** (2 * np.arange(8))).astype(np.float32)
        vm = slam_matching.epipolar_triangulation_match_batch

        def run():
            return vm(
                jnp.asarray(kps1), jnp.asarray(lv1), jnp.asarray(d1),
                jnp.asarray(free1), jnp.asarray(kps2), jnp.asarray(lv2),
                jnp.asarray(d2), jnp.asarray(free2), jnp.asarray(F),
                jnp.asarray(ep), jnp.asarray(s2l), 50.0,
            )[0]

        s, a = _timeit(run, lambda o: np.asarray(o))
        return _roofline({"single": s, "amortized": a}, _cost(
            vm,
            jnp.asarray(kps1), jnp.asarray(lv1), jnp.asarray(d1),
            jnp.asarray(free1), jnp.asarray(kps2), jnp.asarray(lv2),
            jnp.asarray(d2), jnp.asarray(free2), jnp.asarray(F),
            jnp.asarray(ep), jnp.asarray(s2l), 50.0))

    _section(results, "triangulation_10nbr_2000kp_ms", _tri_sec)

    def _fuse_sec():
        M = 8192
        pts = rng.uniform(-5, 5, (M, 3)).astype(np.float32)
        pdesc = rng.integers(0, 2, (M, 256)).astype(np.int8)
        pnorm = np.tile([0, 0, 1.0], (M, 1)).astype(np.float32)
        pmin = np.full((M,), 0.1, np.float32)
        pmax = np.full((M,), 50.0, np.float32)
        pval = np.ones((M,), bool)
        kps = rng.uniform(0, 300, (N, 2)).astype(np.float32)
        lv = rng.integers(0, 8, (N,)).astype(np.int32)
        d = rng.integers(0, 2, (N, 256)).astype(np.int8)
        val = np.ones((N,), bool)
        ur = np.full((N,), -1.0, np.float32)

        def run():
            return slam_matching.fuse_candidates(
                jnp.asarray(pts), jnp.asarray(pdesc), jnp.asarray(pnorm),
                jnp.asarray(pmin), jnp.asarray(pmax), jnp.asarray(pval),
                jnp.asarray(kps), jnp.asarray(lv), jnp.asarray(d),
                jnp.asarray(val), jnp.asarray(ur),
                jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(K),
                jnp.float32(388.0),
                jnp.asarray(np.array([0, W, 0, H], np.float32)),
                jnp.asarray((1.2 ** np.arange(8)).astype(np.float32)),
                jnp.asarray((1.2 ** (2 * np.arange(8))).astype(np.float32)),
                jnp.float32(50.0),
            )[0]

        s, a = _timeit(run, lambda o: np.asarray(o))
        return _roofline({"single": s, "amortized": a}, _cost(
            slam_matching.fuse_candidates,
            jnp.asarray(pts), jnp.asarray(pdesc), jnp.asarray(pnorm),
            jnp.asarray(pmin), jnp.asarray(pmax), jnp.asarray(pval),
            jnp.asarray(kps), jnp.asarray(lv), jnp.asarray(d),
            jnp.asarray(val), jnp.asarray(ur),
            jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(K),
            jnp.float32(388.0),
            jnp.asarray(np.array([0, W, 0, H], np.float32)),
            jnp.asarray((1.2 ** np.arange(8)).astype(np.float32)),
            jnp.asarray((1.2 ** (2 * np.arange(8))).astype(np.float32)),
            jnp.float32(50.0)))

    _section(results, "fuse_8192pts_2000kp_ms", _fuse_sec)

    def _lba_sec():
        from pyslam_tpu.ops import optim as _optim

        C, P, O = 56, 4096, 16384
        poses = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        points = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
        cam_idx = rng.integers(0, C, (O,)).astype(np.int32)
        pt_idx = rng.integers(0, P, (O,)).astype(np.int32)
        uv = rng.uniform(0, 300, (O, 2)).astype(np.float32)
        urs = np.full((O,), -1.0, np.float32)
        s2 = np.ones((O,), np.float32)
        valid = np.ones((O,), bool)
        fixed = np.zeros((C,), bool)
        fixed[0] = True
        prob = _optim.BAProblem(
            poses=jnp.asarray(poses), points=jnp.asarray(points),
            cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv), ur=jnp.asarray(urs),
            sigma2=jnp.asarray(s2), valid=jnp.asarray(valid),
            fixed=jnp.asarray(fixed), K=jnp.asarray(K),
            bf=jnp.asarray(388.0, jnp.float32),
        )

        def run():
            return _optim.bundle_adjust(prob, iters=3, return_state=True)[0]

        s, a = _timeit(run, lambda o: np.asarray(o))
        return _roofline(
            {"single": s, "amortized": a, "shape": [C, P, O], "iters": 3},
            _cost(_optim.bundle_adjust, prob, iters=3, return_state=True))

    _section(results, "lba_chunk_56c_4096p_16384o_3it_ms", _lba_sec)

    # LAST (see note above): stereo extraction
    def _stereo_sec():
        sec = dict(zip(("single", "amortized"), _timeit(
            run_stereo, lambda o: np.asarray(o[0]), reps=2)))
        return _roofline(sec, _cost(
            _extract_stereo_jit,
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.float32(388.0), jnp.float32(192.0),
            ex.num_features, ex.num_levels, ex.scale_factor,
            float(ex.fast_threshold), ex.cell, ex.per_cell,
            ex.use_pallas, 100.0, 2.0))

    _section(results, "stereo_extract_2000f_8lvl_ms", _stereo_sec)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
    sys.exit(0)
