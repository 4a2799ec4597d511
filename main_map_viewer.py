#!/usr/bin/env python3
"""Map viewer entry (reference: pySLAM ``main_map_viewer.py``): load a saved
system state and render map/trajectory views to PNG (or rerun if present)."""

from __future__ import annotations

import argparse

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.viz.viewer3d import Viewer3D
from pyslam_tpu.utils.logging import Printer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("state", help="saved system-state folder (map.json inside)")
    ap.add_argument("--out", default="map_view.png")
    ap.add_argument("--html", default=None, metavar="PATH",
                    help="also export the standalone interactive HTML viewer")
    args = ap.parse_args()

    import json
    import os

    with open(os.path.join(args.state, "map.json")) as f:
        d = json.load(f)
    camera = PinholeCamera.from_json(d["camera"])
    slam = Slam(camera, FeatureTrackerConfig(),
                sensor_type=SensorType[d.get("sensor_type", "MONOCULAR")])
    slam.load_system_state(args.state)
    viewer = Viewer3D(backend="matplotlib", out_path=args.out)
    viewer.draw_map(slam)
    Printer.green(f"map view -> {args.out}")
    if args.html:
        viewer.export_html(slam, args.html)
        Printer.green(f"interactive viewer -> {args.html}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
