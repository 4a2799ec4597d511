#!/usr/bin/env python3
"""Scene-from-views entry (reference: pySLAM ``main_scene_from_views.py``)."""

from __future__ import annotations

import argparse

import numpy as np

from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.scene_from_views.scene_from_views import scene_from_views_factory
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.utils.logging import Printer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default="geometric")
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--save", default="scene.npz")
    args = ap.parse_args()

    ds = SyntheticDataset(num_frames=args.views * 3,
                          sensor_type=SensorType.MONOCULAR,
                          trajectory="line", step=0.5)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy)
    images = [ds.getImage(i * 3) for i in range(args.views)]

    sfv = scene_from_views_factory(args.type, camera=cam)
    result = sfv.reconstruct(images)
    Printer.blue(
        f"reconstructed {len(result.points)} points over {len(result.poses)} "
        f"views (pairwise matches: {result.per_view_matches})"
    )
    np.savez_compressed(args.save, poses=result.poses, points=result.points)
    Printer.green(f"saved -> {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
