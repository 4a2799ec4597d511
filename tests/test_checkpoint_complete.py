"""Checkpoint completeness: loop-closing DB + volumetric state travel with
the saved system state; Slam.reset() clears everything.

Reference: ``slam.py:334-524`` saves/loads the loop detector DB (via task
messages, ``loop_detecting_process.py:170-187``) and the volumetric state
alongside map.json.
"""

import numpy as np
import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.slam.tracking import TrackingState


def _make(ds, n_feat=800):
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * 0.2, depth_threshold=20.0,
    )
    return Slam(
        cam, FeatureTrackerConfig(num_features=n_feat, num_levels=4),
        loop_detector_config="DBOW3", sensor_type=SensorType.RGBD,
    )


@pytest.fixture(scope="module")
def loop_dataset():
    return SyntheticDataset(
        num_frames=175, sensor_type=SensorType.RGBD, trajectory="loop",
        period=160,
    )


@pytest.mark.slow
def test_save_load_restores_loop_db_and_closes_loop(loop_dataset, tmp_path):
    """save -> load -> relocalize -> close a loop, with the DB RESTORED (the
    loaded session must not need to re-describe the old keyframes)."""
    ds = loop_dataset
    n_half = 100
    slam = _make(ds)
    for i in range(n_half):
        slam.track(ds.getImage(i), depth=ds.getDepth(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    slam.finish()
    lc0 = slam.loop_closing
    assert len(lc0.db.kf_gdes) >= 5, "loop DB should hold described keyframes"
    p = str(tmp_path / "state")
    slam.save_system_state(p)

    slam2 = _make(ds)
    slam2.load_system_state(p)
    lc1 = slam2.loop_closing
    # the DB was restored, not rebuilt
    assert set(lc1.db.kf_gdes) == set(lc0.db.kf_gdes)
    for kid in lc0.db.kf_gdes:
        np.testing.assert_allclose(
            lc1.db.kf_gdes[kid], lc0.db.kf_gdes[kid], atol=1e-6)
        np.testing.assert_array_equal(
            lc1.db.kf_words[kid], lc0.db.kf_words[kid])
    assert lc1.db.inverted.keys() == lc0.db.inverted.keys()
    # vocabulary word assignments stay consistent with the saved session
    v0 = lc0.detector.vocabulary
    v1 = lc1.detector.vocabulary
    if v0 is not None and getattr(v0, "seeded", False):
        if hasattr(v0, "level_nodes_for"):   # hierarchical tree vocabulary
            assert v1.checksum() == v0.checksum()
            np.testing.assert_array_equal(v1.centroids, v0.centroids)
        else:
            np.testing.assert_array_equal(v1.words_bits, v0.words_bits)
        assert lc1.detector._trained

    assert slam2.state == TrackingState.INIT_RELOCALIZE
    # continue the circle: relocalize into the loaded map, then close the loop
    for i in range(n_half, len(ds)):
        slam2.track(ds.getImage(i), depth=ds.getDepth(i),
                    frame_id=i, timestamp=ds.getTimestamp(i))
        if slam2.state == TrackingState.OK and i == n_half:
            pass
    slam2.finish()
    assert slam2.state == TrackingState.OK, "failed to relocalize+extend"
    assert slam2.loop_closing.num_loops_closed >= 1, (
        "loop not closed after reload (DB restored)"
    )


def test_reset_clears_loop_closing_and_volumetric():
    ds = SyntheticDataset(
        num_frames=10, sensor_type=SensorType.RGBD, trajectory="line",
        step=0.4,
    )
    slam = _make(ds, n_feat=400)
    from pyslam_tpu.dense.volumetric_integrator import (
        VolumetricIntegratorType, volumetric_integrator_factory,
    )

    integ = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=slam.camera)
    slam.set_volumetric_integrator(integ)
    for i in range(len(ds)):
        img = ds.getImage(i)
        depth = ds.getDepth(i)
        slam.track(img, depth=depth, frame_id=i,
                   timestamp=ds.getTimestamp(i))
        if slam.map.num_keyframes() and integ is not None:
            kf = slam.map.last_keyframe()
            integ.add_keyframe(kf, depth=np.where(depth > 0, depth, 0.0),
                               intensity=img)
            integ.run_all()
    slam.finish()
    assert len(slam.loop_closing.db.kf_gdes) > 0
    assert integ.volume.num_voxels() > 0

    slam.reset()
    assert len(slam.loop_closing.db.kf_gdes) == 0
    assert len(slam.loop_closing.db.inverted) == 0
    assert slam.loop_closing.consistency.prev_groups == []
    assert slam.loop_closing.num_loops_closed == 0
    assert integ.volume.num_voxels() == 0
    assert len(slam.local_mapping.queue) == 0
    assert slam.local_mapping._job is None and slam.local_mapping._lba is None


def test_volumetric_state_saved_with_system(tmp_path):
    ds = SyntheticDataset(
        num_frames=10, sensor_type=SensorType.RGBD, trajectory="line",
        step=0.4,
    )
    slam = _make(ds, n_feat=400)
    from pyslam_tpu.dense.volumetric_integrator import (
        VolumetricIntegratorType, volumetric_integrator_factory,
    )

    integ = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=slam.camera)
    slam.set_volumetric_integrator(integ)
    for i in range(len(ds)):
        img = ds.getImage(i)
        depth = ds.getDepth(i)
        slam.track(img, depth=depth, frame_id=i,
                   timestamp=ds.getTimestamp(i))
        if slam.map.num_keyframes():
            kf = slam.map.last_keyframe()
            integ.add_keyframe(kf, depth=np.where(depth > 0, depth, 0.0),
                               intensity=img)
            integ.run_all()
    n_vox = integ.volume.num_voxels()
    assert n_vox > 0
    p = str(tmp_path / "state")
    slam.save_system_state(p)

    slam2 = _make(ds, n_feat=400)
    integ2 = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=slam2.camera)
    slam2.set_volumetric_integrator(integ2)
    slam2.load_system_state(p)
    assert integ2.volume.num_voxels() == n_vox
    pts0, _ = integ.volume.extract_point_cloud()
    pts1, _ = integ2.volume.extract_point_cloud()
    np.testing.assert_allclose(
        np.sort(pts0, axis=0), np.sort(pts1, axis=0), atol=1e-9)
