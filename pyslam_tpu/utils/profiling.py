"""Per-stage timing + XLA trace profiling.

Reference capability: pySLAM's ad-hoc ``TimerFps`` instances per module
(seven named timers in ``tracking.py:220-228``, per-stage timers in
``local_mapping.py``) surfaced to the 2D plot drawer — plus the
TPU-native upgrade SURVEY §5 calls for: ``jax.profiler`` traces viewable
in TensorBoard/Perfetto and ``TraceAnnotation`` stage markers that land
inside the device timeline.
"""

from __future__ import annotations

import contextlib
import time

from pyslam_tpu.utils.timer import TimerFps


class StageTimings:
    """Named moving-average stage timers with one-line reporting.

    >>> t = StageTimings("tracking")
    >>> with t.stage("pose_opt"):
    ...     ...
    >>> t.report()   # {'pose_opt': {'last_ms': ..., 'avg_ms': ..., 'fps': ...}}
    """

    def __init__(self, name: str = "", window: int = 30):
        self.name = name
        self.timers: dict[str, TimerFps] = {}

    @contextlib.contextmanager
    def stage(self, stage_name: str):
        t = self.timers.get(stage_name)
        if t is None:
            t = self.timers[stage_name] = TimerFps(stage_name)
        t.start()
        try:
            yield t
        finally:
            t.refresh()

    def add_sample(self, stage_name: str, seconds: float):
        t = self.timers.get(stage_name)
        if t is None:
            t = self.timers[stage_name] = TimerFps(stage_name)
        t.elapsed = seconds
        t.moving_average.add(seconds)

    def report(self) -> dict:
        return {
            k: {
                "last_ms": 1000.0 * t.elapsed,
                "avg_ms": 1000.0 * t.moving_average.average(),
                "fps": t.fps,
                "calls": t.calls,
                "total_ms": 1000.0 * t.total,
            }
            for k, t in self.timers.items()
        }

    def summary(self) -> str:
        # avg over ALL calls x count: the attribution that matters when a
        # stage runs on only some frames (windowed averages hide counts)
        parts = [
            f"{k}={v['total_ms'] / max(v['calls'], 1):.1f}ms*{v['calls']}"
            for k, v in sorted(self.report().items())
        ]
        prefix = f"[{self.name}] " if self.name else ""
        return prefix + " ".join(parts)


class DeviceCounters:
    """Process-wide counters of device interactions on the managed hot
    paths (tracking/local-mapping/integrator dispatch sites increment
    these).  The bench divides by frames to report ``dispatches_per_frame``
    / ``readbacks_per_frame`` — the observability VERDICT r4 asked for: on a
    remote-attached TPU each dispatch pays tunnel marshalling and each
    readback a full RTT, so these two numbers bound the per-frame overhead
    floor."""

    def __init__(self):
        self.dispatches = 0   # compiled-graph launches
        self.readbacks = 0    # blocking device->host transfers
        self.uploads = 0      # explicit host->device payload transfers

    def snapshot(self) -> tuple[int, int, int]:
        return (self.dispatches, self.readbacks, self.uploads)

    def reset(self):
        self.dispatches = self.readbacks = self.uploads = 0


device_counters = DeviceCounters()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a ``jax.profiler`` trace (TensorBoard / Perfetto viewable).

    Usage: ``with device_trace('logs/trace'): ... run frames ...``
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Stage marker that shows up inside the device profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
