"""Concurrent ``Slam`` instances in one process must be fully isolated.

The reference runs N independent SLAM *processes* for evaluation
(``slam_evaluation_manager.py:314``); this framework's equivalent runs N
instances in one host process (one sequence per device).  Round-3 regression:
``KeyFrame._kid_counter`` was process-global, so interleaved instances got
interleaved kid sequences, silently changing point-freshness
(``first_kid >= kf.kid - 2``) and keyframe-culling-age behavior.  Kid
assignment now lives on ``Map`` (per-instance counter) — these tests pin
that isolation.
"""

import numpy as np

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


def _make(ds):
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    cfg = FeatureTrackerConfig(num_features=300, num_levels=4)
    return Slam(cam, cfg, sensor_type=SensorType.STEREO)


def _datasets():
    return [
        SyntheticDataset(num_frames=10, sensor_type=SensorType.STEREO,
                         trajectory="line", step=0.3),
        SyntheticDataset(num_frames=10, sensor_type=SensorType.STEREO,
                         trajectory="line", step=0.42),
    ]


def _signature(slam):
    slam.finish()
    ts, twc = slam.tracking.history.final_trajectory(slam.map)
    return {
        "kids": sorted(slam.map.keyframes),
        "n_points": slam.map.num_points(),
        "traj": np.asarray(twc),
    }


def _run_solo(ds):
    slam = _make(ds)
    for i in range(len(ds)):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
        # drain per frame: async LBA-chunk poll timing is wall-clock
        # dependent (same as the eval manager's deterministic mode) — this
        # test pins cross-instance ISOLATION, not async scheduling
        slam.local_mapping.finish()
    return _signature(slam)


def test_interleaved_instances_match_solo_runs():
    ds_a, ds_b = _datasets()
    solo_a = _run_solo(ds_a)
    solo_b = _run_solo(ds_b)

    sa, sb = _make(ds_a), _make(ds_b)
    for i in range(10):
        sa.track(ds_a.getImage(i), img_right=ds_a.getImageRight(i),
                 frame_id=i, timestamp=ds_a.getTimestamp(i))
        sa.local_mapping.finish()
        sb.track(ds_b.getImage(i), img_right=ds_b.getImageRight(i),
                 frame_id=i, timestamp=ds_b.getTimestamp(i))
        sb.local_mapping.finish()
    inter_a, inter_b = _signature(sa), _signature(sb)

    for solo, inter, name in ((solo_a, inter_a, "A"), (solo_b, inter_b, "B")):
        assert solo["kids"] == inter["kids"], (
            f"instance {name}: kid sequence changed under interleaving "
            f"(solo {solo['kids']} vs {inter['kids']})"
        )
        assert solo["n_points"] == inter["n_points"], (
            f"instance {name}: map size diverged under interleaving"
        )
        assert solo["traj"].shape == inter["traj"].shape
        np.testing.assert_allclose(
            solo["traj"], inter["traj"], atol=1e-9,
            err_msg=f"instance {name}: trajectory diverged under interleaving",
        )


def test_kids_are_per_map_sequential():
    ds_a, ds_b = _datasets()
    sa, sb = _make(ds_a), _make(ds_b)
    for i in range(6):
        sa.track(ds_a.getImage(i), img_right=ds_a.getImageRight(i),
                 frame_id=i, timestamp=ds_a.getTimestamp(i))
        sb.track(ds_b.getImage(i), img_right=ds_b.getImageRight(i),
                 frame_id=i, timestamp=ds_b.getTimestamp(i))
    for slam in (sa, sb):
        kids = [slam.map.keyframes[k].kid for k in slam.map.keyframe_order]
        assert kids == list(range(len(kids))), (
            f"kids not dense from 0 within one map: {kids}"
        )
