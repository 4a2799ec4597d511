"""Tracking/back-end overlap + LBA interrupt protocol.

Reference behavior: local mapping runs on its own thread and tracking aborts
its LBA when a new keyframe is pending (pySLAM ``tracking.py:906-907``,
``optimizer_g2o.py:614-853`` abort flag, ``local_mapping.py:287-345``).  Here
the back-end advances one bounded slice per tracked frame and the LBA runs as
polled device chunks; these tests pin the interrupt/abort semantics and the
bounded per-frame work.
"""

import time

import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


def _make_slam(ds, sensor_type, num_features=400):
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=num_features, num_levels=4)
    return Slam(cam, cfg, sensor_type=sensor_type)


@pytest.fixture(scope="module")
def stereo_slam_with_kfs():
    """A short stereo run leaving a drained map with several keyframes."""
    ds = SyntheticDataset(
        num_frames=14, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    slam = _make_slam(ds, SensorType.STEREO)
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    slam.finish()
    assert slam.map.num_keyframes() >= 3
    return slam


def test_push_keyframe_sets_abort_with_lba_in_flight(stereo_slam_with_kfs):
    slam = stereo_slam_with_kfs
    lm = slam.local_mapping
    kf = slam.map.last_keyframe()

    lm._lba_dispatch(kf)
    assert lm._lba is not None, "LBA window should be dispatchable"
    assert not lm.opt_abort_flag
    lm.push_keyframe(kf)           # a pending keyframe interrupts the LBA
    assert lm.opt_abort_flag
    aborted_before = lm.lba_chunks_aborted
    # drain: the in-flight chunk finishes, remaining chunks are dropped,
    # the PARTIAL result is applied (reference: abort stops iterations early)
    while lm._lba is not None:
        lm._lba_poll(block=True)
    assert lm.lba_chunks_aborted == aborted_before + 1
    assert not lm.opt_abort_flag   # consumed
    # clean up the artificially queued duplicate keyframe
    lm.queue.clear()


def test_interrupt_before_dispatch_still_runs_first_chunk(stereo_slam_with_kfs):
    """g2o clears mbAbortBA at BA start (reference ``optimizer_g2o.py:648``):
    an interrupt raised BEFORE dispatch never skips the window's LBA — every
    keyframe gets at least one LM chunk; abort only stops further chunks."""
    slam = stereo_slam_with_kfs
    lm = slam.local_mapping
    kf = slam.map.last_keyframe()

    lm.interrupt_optimization()
    lm.queue.append(kf)            # keyframe pending
    lm._lba_dispatch(kf)
    assert lm._lba is not None, "first chunk must dispatch despite interrupt"
    assert not lm.opt_abort_flag, "abort flag is cleared at BA start"
    lm.queue.clear()
    while lm._lba is not None:
        lm._lba_poll(block=True)


def test_need_new_keyframe_interrupts_busy_backend(stereo_slam_with_kfs):
    """Interrupt protocol under the async back-end design:

    - an in-flight LBA alone does NOT block keyframe insertion (it is an
      abortable device job — ``push_keyframe`` raises the abort flag, the
      reference's tracking.py:906-907 semantics moved to the push); the
      decision is immediate;
    - a busy HOST job (keyframe mid-digestion) interrupts the back-end but
      does NOT block stereo insertion while the queue is short (reference
      ORB-SLAM NeedNewKeyFrame: making stereo wait for idleness starves the
      map on fast motion — the TPU bench lost tracking by frame 9 that way);
      a long queue (>= 3) does block."""
    slam = stereo_slam_with_kfs
    lm = slam.local_mapping
    tr = slam.tracking
    kf = slam.map.last_keyframe()

    # in-flight LBA, no host job: insertion allowed, push aborts the LBA
    lm._lba_dispatch(kf)
    assert not lm.is_idle()
    assert lm.accepts_keyframes()
    f_cur = tr.f_prev
    tr.num_inliers = 16            # > kNumMinPointsForNewKf
    tr.last_kf_frame_id = f_cur.id - 100
    saved_outliers = f_cur.outliers.copy()
    f_cur.outliers[:] = True       # no tracked close points -> need_close
    assert not lm.opt_abort_flag
    try:
        decision = tr.need_new_keyframe(f_cur)
    finally:
        f_cur.outliers[:] = saved_outliers
    assert decision, "in-flight LBA alone must not block insertion"
    lm.push_keyframe(kf)
    assert lm.opt_abort_flag, "push must interrupt the in-flight LBA"
    lm.queue.clear()
    while lm._lba is not None:
        lm._lba_poll(block=True)

    # busy HOST job: interrupt requested, insertion still allowed with a
    # short queue; a long queue blocks
    lm._job = kf
    lm._job_stage = 0
    try:
        f_cur.outliers[:] = True
        assert tr.need_new_keyframe(f_cur), (
            "stereo must insert past a busy host job while the queue is short"
        )
        assert lm.opt_abort_flag, "busy back-end must be interrupted"
        lm.queue.extend([kf, kf, kf])
        assert not tr.need_new_keyframe(f_cur), (
            "a 3-deep queue must block insertion"
        )
    finally:
        f_cur.outliers[:] = saved_outliers
        lm._job = None
        lm.queue.clear()
        lm.opt_abort_flag = False


def test_step_async_bounded_host_work():
    """Back-end host slices per frame are bounded by the wall-clock budget
    (kLocalMappingHostBudgetMs): with budget ~0, at most one slice runs per
    step_async call — track() makes two such calls per frame (harvest at
    frame start + step_async at frame end), so the per-frame bound is 2;
    the first slice of each call ALWAYS runs so progress is guaranteed."""
    from pyslam_tpu.config_parameters import Parameters

    ds = SyntheticDataset(
        num_frames=12, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    slam = _make_slam(ds, SensorType.STEREO)
    lm = slam.local_mapping

    calls = {"n": 0}
    orig = lm._advance_slice

    def counting_advance(block=False):
        calls["n"] += 1
        return orig(block=block)

    lm._advance_slice = counting_advance
    saved = Parameters.kLocalMappingHostBudgetMs
    Parameters.kLocalMappingHostBudgetMs = 0.0
    try:
        for i in range(len(ds)):
            calls["n"] = 0
            slam.track(
                ds.getImage(i), img_right=ds.getImageRight(i),
                frame_id=i, timestamp=ds.getTimestamp(i),
            )
            assert calls["n"] <= 2, (
                f"frame {i}: {calls['n']} host slices in one track() call "
                "with a zero budget (2 = harvest + step_async)"
            )
    finally:
        Parameters.kLocalMappingHostBudgetMs = saved


@pytest.mark.slow
def test_keyframe_frame_latency_bounded():
    """Under the TPU fixed-shape policy (forced on, with small caps so CPU
    compiles stay fast): after the first two keyframe cycles warmed every
    graph, (a) NO further XLA compiles happen, and (b) tracking-frame latency
    while the back-end digests a keyframe stays within a small multiple of a
    normal frame (the overlap the reference buys with its local-mapping
    thread)."""
    import logging

    import jax

    from pyslam_tpu.config_parameters import Parameters
    from pyslam_tpu.utils.padding import set_fixed_shape_policy

    compiles = []

    class _H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Compiling" in msg:
                compiles.append((time.perf_counter(), msg.split("\n")[0]))

    handler = _H()
    saved = (
        Parameters.kTrackLocalMapMaxPoints,
        Parameters.kLBAMaxCameras,
        Parameters.kLBAMaxPoints,
        Parameters.kLBAMaxObservations,
    )
    set_fixed_shape_policy(True)
    Parameters.kTrackLocalMapMaxPoints = 1024
    Parameters.kLBAMaxCameras = 24
    Parameters.kLBAMaxPoints = 1024
    Parameters.kLBAMaxObservations = 4096
    jax.config.update("jax_log_compiles", True)
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch"):
        logging.getLogger(name).addHandler(handler)
    try:
        ds = SyntheticDataset(
            num_frames=30, sensor_type=SensorType.STEREO, trajectory="line",
            step=0.4,
        )
        slam = _make_slam(ds, SensorType.STEREO)
        # the zero-post-warmup-compile contract includes prewarm (bench.py
        # calls it too): the legacy fallback chain only runs on weak fused
        # results, which the pipelined loop can first hit mid-run
        slam.prewarm()
        lats, busy, kf_counts, stamps = [], [], [], []
        for i in range(len(ds)):
            t0 = time.perf_counter()
            slam.track(
                ds.getImage(i), img_right=ds.getImageRight(i),
                frame_id=i, timestamp=ds.getTimestamp(i),
            )
            stamps.append(time.perf_counter())
            lats.append(stamps[-1] - t0)
            busy.append(not slam.local_mapping.is_idle())
            kf_counts.append(slam.map.num_keyframes())
        # warmup = up to the first frame where the back-end is IDLE with >= 3
        # keyframes in the map: by then the 3rd keyframe's full job — incl.
        # the first LBA dispatch and its chunk-transition variant — has
        # compiled every graph at its fixed shape
        kf_counts = np.asarray(kf_counts)
        busy_arr = np.asarray(busy)
        done = (~busy_arr) & (kf_counts >= 3)
        assert done.any(), "back-end never drained a 3-keyframe map"
        warm_end = int(np.argmax(done)) + 1
        assert warm_end < len(lats) - 4, "stream too short to leave warmup"
        t_warm = stamps[warm_end - 1]
        post = [m for t, m in compiles if t >= t_warm]
        assert not post, (
            f"{len(post)} XLA compiles after warmup under the fixed-shape "
            f"policy: {post[:5]}"
        )
        lats_w = np.asarray(lats[warm_end:])
        busy_w = np.asarray(busy[warm_end:])
        if busy_w.any() and (~busy_w).any():
            med_normal = np.median(lats_w[~busy_w])
            p95_busy = np.quantile(lats_w[busy_w], 0.95)
            # generous CPU-noise headroom; on TPU the bound is ~2x (bench.py
            # records the real keyframe-frame p95)
            assert p95_busy <= 6.0 * med_normal, (
                f"keyframe-frame p95 {p95_busy*1e3:.0f}ms vs normal median "
                f"{med_normal*1e3:.0f}ms"
            )
    finally:
        set_fixed_shape_policy(None)
        (
            Parameters.kTrackLocalMapMaxPoints,
            Parameters.kLBAMaxCameras,
            Parameters.kLBAMaxPoints,
            Parameters.kLBAMaxObservations,
        ) = saved
        jax.config.update("jax_log_compiles", False)
        for name in ("jax._src.interpreters.pxla", "jax._src.dispatch"):
            logging.getLogger(name).removeHandler(handler)


def test_large_window_ba_cadence():
    """kUseLargeWindowBA dispatches a wider-window BA every
    kEveryNumFramesLargeWindowBA processed keyframes (reference
    local_mapping.py:467-476 runs it on its own thread)."""
    from pyslam_tpu.config_parameters import Parameters

    ds = SyntheticDataset(
        num_frames=26, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.5,
    )
    slam = _make_slam(ds, SensorType.STEREO)
    lm = slam.local_mapping

    dispatches = []
    orig = lm._lba_dispatch

    def spy(kf, window_size=None):
        dispatches.append(window_size)
        orig(kf, window_size=window_size)

    lm._lba_dispatch = spy
    old = (Parameters.kUseLargeWindowBA,
           Parameters.kEveryNumFramesLargeWindowBA)
    Parameters.kUseLargeWindowBA = True
    Parameters.kEveryNumFramesLargeWindowBA = 2
    try:
        for i in range(len(ds)):
            slam.track(
                ds.getImage(i), img_right=ds.getImageRight(i),
                frame_id=i, timestamp=ds.getTimestamp(i),
            )
            # drain per frame: async LBA completion timing otherwise varies
            # with machine load, which perturbs keyframe cadence and makes
            # the large-BA dispatch count nondeterministic across runs
            slam.local_mapping.finish()
        slam.finish()
    finally:
        (Parameters.kUseLargeWindowBA,
         Parameters.kEveryNumFramesLargeWindowBA) = old
    assert lm._kf_count >= 5, f"only {lm._kf_count} keyframes processed"
    large = [w for w in dispatches if w is not None]
    # deferred cadence: ≥1 large BA once the map clears the >4-KF gate, and
    # roughly every-2-keyframes afterwards (slot-busy periods defer, never
    # skip); all large dispatches use the wide window
    assert len(large) >= max(1, (lm._kf_count - 5) // 2), (
        f"{len(large)} large-window BAs over {lm._kf_count} keyframes"
    )
    assert all(w == Parameters.kLargeBAWindowSize for w in large)
