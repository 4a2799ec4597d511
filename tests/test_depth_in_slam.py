"""Depth-estimator integration into the SLAM loop.

Reference behaviors: the MONOCULAR->RGBD front-end upgrade when a depth
estimator is configured (pySLAM ``main_slam.py:127-130,232-245``) and dense
depth estimated inside the volumetric integrator
(``config_parameters.py:356`` kVolumetricIntegrationUseDepthEstimator).
"""

import numpy as np
import pytest

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.depth_estimation.depth_estimator import (
    DepthEstimatorType,
    depth_estimator_factory,
)
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam


def _camera(ds):
    return PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )


def test_depth_estimator_upgrades_mono_to_rgbd():
    """A Slam constructed MONOCULAR with a depth estimator runs as RGBD:
    estimated per-frame depth seeds stereo-style map points from frame 0
    (no mono initialization baseline needed)."""
    ds = SyntheticDataset(
        num_frames=16, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    cam = _camera(ds)
    est = depth_estimator_factory(
        DepthEstimatorType.DEPTH_SGBM, camera=cam, max_disparity=64,
    )
    slam = Slam(
        cam, FeatureTrackerConfig(num_features=500, num_levels=4),
        sensor_type=SensorType.MONOCULAR, depth_estimator=est,
    )
    assert slam.sensor_type == SensorType.RGBD
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    slam.finish()
    assert slam.state.name == "OK"
    # RGBD-style immediate map: points exist from the first keyframe and
    # carry real depths (mono init would need baseline + E-matrix bootstrap)
    assert slam.map.num_points() > 100
    kf0 = slam.map.keyframes[slam.map.keyframe_order[0]]
    assert (kf0.depths > 0).sum() > 50, "estimated depth not attached"
    ts, poses = slam.get_final_trajectory()
    assert len(ts) >= len(ds) - 1
    # metric scale comes from the stereo-SGM depth: trajectory length must
    # match GT without scale alignment (pure mono cannot do this)
    gt = ds.poses[:, :3, 3]
    est_len = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1).sum()
    gt_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert abs(est_len - gt_len) / gt_len < 0.25, (est_len, gt_len)


def test_stereo_tsdf_through_integrator_depth_provider():
    """Stereo (no native dense depth) + TSDF: the integrator's SGM provider
    fills the volume through the full Slam.track -> local-mapping handoff
    pipeline (no manual add_keyframe)."""
    ds = SyntheticDataset(
        num_frames=12, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    cam = _camera(ds)
    slam = Slam(
        cam, FeatureTrackerConfig(num_features=500, num_levels=4),
        sensor_type=SensorType.STEREO,
    )
    from pyslam_tpu.dense.volumetric_integrator import (
        VolumetricIntegratorType,
        volumetric_integrator_factory,
    )

    old = (Parameters.kVolumetricIntegrationUseDepthEstimator,
           Parameters.kVolumetricIntegrationDepthEstimatorType)
    Parameters.kVolumetricIntegrationUseDepthEstimator = True
    Parameters.kVolumetricIntegrationDepthEstimatorType = "sgbm"
    try:
        integ = volumetric_integrator_factory(
            VolumetricIntegratorType.TSDF, camera=cam, voxel_size=0.3,
            sdf_trunc=0.9,
        )
    finally:
        (Parameters.kVolumetricIntegrationUseDepthEstimator,
         Parameters.kVolumetricIntegrationDepthEstimatorType) = old
    assert integ._depth_provider is not None
    slam.set_volumetric_integrator(integ)

    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    slam.finish()
    assert slam.map.num_keyframes() >= 1
    assert integ.volume.num_voxels() > 0, (
        "TSDF not populated through the stereo depth-provider path"
    )
    # snapshots keep enough data for rebuild(): either the cached depth or
    # (device fast path) the stereo pair to re-estimate it; rebuild must
    # repopulate the volume from scratch
    snap = next(iter(integ.snapshots.values()))
    assert snap.depth is not None or (
        snap.intensity is not None and snap.img_right is not None
    )
    # the provider's re-estimated depth itself must be sane (positive finite
    # values over a meaningful share of the image)
    d_est, _ = integ._depth_provider.infer(
        snap.intensity, img_right=snap.img_right
    )
    d_est = np.asarray(d_est)
    assert np.isfinite(d_est[d_est > 0]).all()
    assert (d_est > 0).mean() > 0.1, "re-estimated depth mostly invalid"
    n_before = integ.volume.num_voxels()
    # prove rebuild actually REPLAYS the snapshots: empty the volume first,
    # then rebuild must repopulate it (a silent no-op rebuild would leave the
    # pre-reset voxels and pass a >-than check by accident)
    integ.volume.reset()
    assert integ.volume.num_voxels() == 0
    integ.rebuild(slam.map)
    assert integ.volume.num_voxels() > 0.5 * n_before
