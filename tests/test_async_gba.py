"""Concurrent GBA-then-correct protocol.

Reference: pySLAM runs the post-loop GBA in its own process while
tracking/mapping continue (``global_bundle_adjustment.py:184-310``), then
folds keyframes/points created during the solve into the corrected frame and
aborts a stale solve when a new loop arrives (``mbStopGBA``).  Here the solve
is chunked device work polled by ``LoopClosing.step`` (``slam/
global_bundle_adjustment.py`` :class:`AsyncGBA`); these tests pin the apply /
born-during-propagation / abort semantics.
"""

import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.global_bundle_adjustment import AsyncGBA
from pyslam_tpu.slam.slam import Slam


@pytest.fixture(scope="module")
def slam_ds():
    ds = SyntheticDataset(num_frames=16, sensor_type=SensorType.STEREO,
                          trajectory="line", step=0.45)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * ds.baseline,
                        depth_threshold=20.0)
    slam = Slam(cam, FeatureTrackerConfig(num_features=450, num_levels=3),
                sensor_type=SensorType.STEREO)
    for i in range(10):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    slam.local_mapping.finish()
    assert slam.map.num_keyframes() >= 3
    return slam, ds


def test_async_gba_chunked_apply(slam_ds):
    slam, _ = slam_ds
    gba = AsyncGBA(slam.camera, slam.feature_tracker)
    assert not gba.running
    gba.dispatch(slam.map, iters=9)
    assert gba.running

    polls = 0
    while gba.poll(block=True):
        polls += 1
    assert not gba.running
    assert gba.runs_completed == 1 and gba.runs_aborted == 0
    assert np.isfinite(gba.last_cost)
    assert polls >= 2, "the solve must run as multiple polled chunks"
    for kf in slam.map.keyframes.values():
        assert np.isfinite(kf.Tcw).all()
    alive = slam.map.points.alive_ids()
    assert np.isfinite(slam.map.points.pos[alive]).all()


def test_born_during_solve_propagates(slam_ds):
    """Keyframes/points created while the solve is in flight are corrected
    via spanning-tree / reference-keyframe composition: their pose RELATIVE
    to the snapshot parent is preserved through the apply."""
    slam, ds = slam_ds
    m = slam.map
    gba = AsyncGBA(slam.camera, slam.feature_tracker)
    gba.dispatch(m, iters=6)
    snapshot_kids = set(gba._state["kids"])
    snapshot_pids = set(int(p) for p in gba._state["pids"])

    # tracking continues during the solve -> new keyframes + points born
    for i in range(10, 16):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    slam.local_mapping.finish()
    born = [k for k in m.keyframe_order if k not in snapshot_kids]
    assert born, "no keyframes were created during the solve"

    # relative pose to the parent, captured just before the apply
    rel_before = {}
    for kid in born:
        kf = m.keyframes[kid]
        if kf.parent is not None and kf.parent in m.keyframes:
            rel_before[kid] = kf.Tcw @ np.linalg.inv(m.keyframes[kf.parent].Tcw)
    assert rel_before

    gba.finish()
    assert gba.runs_completed == 1

    for kid, T_rel in rel_before.items():
        kf = m.keyframes[kid]
        T_rel_after = kf.Tcw @ np.linalg.inv(m.keyframes[kf.parent].Tcw)
        np.testing.assert_allclose(T_rel_after, T_rel, atol=1e-5)

    born_pids = np.setdiff1d(
        m.points.alive_ids(), np.asarray(sorted(snapshot_pids))
    )
    assert np.isfinite(m.points.pos[born_pids]).all()


def test_abort_discards_stale_solve(slam_ds):
    slam, _ = slam_ds
    m = slam.map
    gba = AsyncGBA(slam.camera, slam.feature_tracker)
    poses_before = {k: kf.Tcw.copy() for k, kf in m.keyframes.items()}
    pos_before = m.points.pos[m.points.alive_ids()].copy()

    gba.dispatch(m, iters=12)
    gba.abort()                       # a new loop supersedes the solve
    while gba.poll(block=True):
        pass
    assert gba.runs_aborted == 1 and gba.runs_completed == 0
    for k, T in poses_before.items():
        np.testing.assert_array_equal(m.keyframes[k].Tcw, T)
    np.testing.assert_array_equal(
        m.points.pos[m.points.alive_ids()], pos_before
    )


def test_redispatch_supersedes(slam_ds):
    slam, _ = slam_ds
    gba = AsyncGBA(slam.camera, slam.feature_tracker)
    gba.dispatch(slam.map, iters=12)
    gba.dispatch(slam.map, iters=6)   # re-dispatch discards the first
    assert gba.runs_aborted == 1
    gba.finish()
    assert gba.runs_completed == 1


def test_loop_closing_owns_async_gba(slam_ds):
    """Slam wires the runner (Slam.GBA) and finish() drains it."""
    slam, _ = slam_ds
    cam = slam.camera
    s2 = Slam(cam, FeatureTrackerConfig(num_features=300, num_levels=3),
              loop_detector_config="DBOW3", sensor_type=SensorType.STEREO)
    assert s2.GBA is s2.loop_closing.gba
    s2.loop_closing.gba.dispatch(s2.map)      # <2 KFs: no-op
    assert not s2.GBA.running
    s2.finish()
