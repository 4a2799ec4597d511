"""2-frames-in-flight pipelined tracking (ops/fused_tracking.py
track_frame_fused_chained + Tracking._track_pipelined).

The pipelined mode trades one frame of result latency for overlap: frame
N's tracking graph is dispatched against frame N-1's DEVICE output and the
host harvests one frame behind.  These tests pin its contract:

- every frame is tracked (nothing dropped at mode entry/exit or at flush)
- the trajectory matches the depth-1 (same-frame readback) mode closely:
  the only semantic differences are a one-frame-stale motion velocity and
  local-map row set, both within the constant-velocity/covisibility
  assumptions the reference already makes (pySLAM tracking.py:1290-1308)
- a mid-stream flush (state save, finish) materializes the in-flight frame
"""

import numpy as np
import pytest

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from tests.test_slam_e2e import make_slam


def _run(ds, depth: int, pipelined_input: bool = True):
    old = Parameters.kTrackingPipelineDepth
    Parameters.kTrackingPipelineDepth = depth
    try:
        slam = make_slam(ds, SensorType.STEREO)
        n = len(ds)
        for i in range(n):
            nxt = None
            if pipelined_input and i + 1 < n:
                nxt = {
                    "img": ds.getImage(i + 1),
                    "img_right": ds.getImageRight(i + 1),
                    "frame_id": i + 1,
                    "timestamp": ds.getTimestamp(i + 1),
                }
            slam.track(
                ds.getImage(i), img_right=ds.getImageRight(i),
                frame_id=i, timestamp=ds.getTimestamp(i), next_input=nxt,
            )
        ts, poses = slam.get_final_trajectory()
        return slam, ts, poses
    finally:
        Parameters.kTrackingPipelineDepth = old


@pytest.mark.slow
def test_pipelined_matches_depth1():
    ds = SyntheticDataset(
        num_frames=32, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    slam1, ts1, poses1 = _run(ds, depth=1)
    slam2, ts2, poses2 = _run(ds, depth=2)

    # nothing dropped: the pipelined run tracks every frame the depth-1 run
    # tracks (the in-flight frame is flushed by get_final_trajectory)
    assert len(ts2) >= len(ts1) - 1, (len(ts1), len(ts2))
    assert len(ts2) >= 30

    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    gt_p = ds.poses[:, :3, 3]
    r1 = eval_ate(ts1, poses1[:, :3, 3], gt_t, gt_p, align=True,
                  with_scale=False)
    r2 = eval_ate(ts2, poses2[:, :3, 3], gt_t, gt_p, align=True,
                  with_scale=False)
    # same accuracy class as the synchronous mode (test_stereo_slam_synthetic
    # bound), and no silent degradation vs depth-1
    assert r2.rmse < 0.25, (r1, r2)
    assert r2.rmse < max(2.5 * r1.rmse, 0.08), (r1, r2)


@pytest.mark.slow
def test_pipelined_flush_midstream():
    """finish() mid-sequence materializes the in-flight frame; tracking
    continues cleanly afterwards."""
    ds = SyntheticDataset(
        num_frames=24, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    old = Parameters.kTrackingPipelineDepth
    Parameters.kTrackingPipelineDepth = 2
    try:
        slam = make_slam(ds, SensorType.STEREO)
        for i in range(12):
            slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                       frame_id=i, timestamp=ds.getTimestamp(i))
        slam.finish()   # flush: in-flight frame becomes real
        assert slam.tracking._pending is None
        n_hist = len(slam.tracking.history.timestamps)
        assert n_hist >= 10
        for i in range(12, 24):
            slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                       frame_id=i, timestamp=ds.getTimestamp(i))
        ts, poses = slam.get_final_trajectory()
        assert len(ts) >= 21
    finally:
        Parameters.kTrackingPipelineDepth = old
