#!/usr/bin/env python3
"""Depth estimation demo (reference: pySLAM ``main_depth_prediction.py``):
run a depth estimator over dataset frames, report error vs GT depth when
available."""

from __future__ import annotations

import argparse

import numpy as np

from pyslam_tpu.depth_estimation.depth_estimator import depth_estimator_factory
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.utils.logging import Printer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--estimator", default="sgbm")
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    ds = SyntheticDataset(num_frames=args.frames, sensor_type=SensorType.STEREO)
    ds_gt = SyntheticDataset(num_frames=args.frames, sensor_type=SensorType.RGBD)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        bf=ds.fx * ds.baseline)
    est = depth_estimator_factory(args.estimator, camera=cam, max_depth=45.0)

    for i in range(args.frames):
        depth, pts3d = est.infer(ds.getImage(i), ds.getImageRight(i))
        gt = np.asarray(ds_gt.getDepth(i))
        ok = (depth > 0) & (gt > 0) & (gt < 20)
        if ok.sum() > 10:
            rel = np.abs(depth[ok] - gt[ok]) / gt[ok]
            Printer.green(
                f"frame {i}: coverage={ok.mean()*100:.1f}% "
                f"median rel err={np.median(rel)*100:.1f}%"
            )
        else:
            Printer.yellow(f"frame {i}: no valid depth overlap")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
