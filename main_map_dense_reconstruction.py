#!/usr/bin/env python3
"""Dense reconstruction from a saved sparse map (reference: pySLAM
``main_map_dense_reconstruction.py``): load a saved system state, replay its
keyframes through the TSDF integrator, save the dense cloud.

Without --load_state it runs a self-contained demo: RGBD SLAM on the
synthetic sequence, save state, reload, densify."""

from __future__ import annotations

import argparse

import numpy as np

from pyslam_tpu.dense.volumetric_integrator import (
    VolumetricIntegratorType,
    volumetric_integrator_factory,
)
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.utils.logging import Printer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_state", default=None)
    ap.add_argument("--save_cloud", default="dense_cloud.npz")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    ds = SyntheticDataset(num_frames=args.frames, sensor_type=SensorType.RGBD,
                          trajectory="line", step=0.3)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * 0.2, depth_threshold=20.0)

    slam = Slam(cam, FeatureTrackerConfig(num_features=600, num_levels=4),
                sensor_type=SensorType.RGBD)
    if args.load_state:
        slam.load_system_state(args.load_state)
    else:
        for i in range(len(ds)):
            slam.track(ds.getImage(i), depth=ds.getDepth(i), frame_id=i,
                       timestamp=ds.getTimestamp(i))
        Printer.green(
            f"built map: {slam.map.num_keyframes()} KFs, "
            f"{slam.map.num_points()} points"
        )

    integrator = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=cam,
        environment_type=ds.environment_type,
    )
    # replay keyframes: re-render depth by frame id (a saved state stores
    # keyframe poses; depth comes from the dataset like the reference's replay)
    for kid in slam.map.keyframe_order:
        kf = slam.map.keyframes[kid]
        fid = kf.id
        if fid < len(ds):
            integrator.add_keyframe(kf, depth=ds.getDepth(fid),
                                    intensity=ds.getImage(fid))
    integrator.run_all()
    pts, cols = integrator.get_point_cloud()
    Printer.blue(f"dense cloud: {len(pts)} points")
    np.savez_compressed(args.save_cloud, points=pts, colors=cols)
    Printer.green(f"saved -> {args.save_cloud}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
