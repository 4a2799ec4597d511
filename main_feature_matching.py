#!/usr/bin/env python3
"""Feature extraction + matching demo (reference: pySLAM
``main_feature_matching.py``): extract with a configurable tracker preset,
match two images, report statistics; works on image files or the synthetic
dataset."""

from __future__ import annotations

import argparse

import numpy as np

from pyslam_tpu.features.tracker import FeatureTrackerConfig, feature_tracker_factory
from pyslam_tpu.utils.logging import Printer


def load_pair(args):
    if args.img1 and args.img2:
        from pyslam_tpu.io.dataset import _imread_gray

        return _imread_gray(args.img1), _imread_gray(args.img2)
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType

    ds = SyntheticDataset(num_frames=5, sensor_type=SensorType.MONOCULAR)
    return ds.getImage(0), ds.getImage(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img1", default=None)
    ap.add_argument("--img2", default=None)
    ap.add_argument("--features", default="ORB2")
    ap.add_argument("--num_features", type=int, default=1000)
    args = ap.parse_args()

    img1, img2 = load_pair(args)
    tracker = feature_tracker_factory(
        FeatureTrackerConfig(name=args.features, num_features=args.num_features,
                             num_levels=4)
    )
    f1 = tracker.detectAndCompute(img1)
    f2 = tracker.detectAndCompute(img2)
    i1, i2 = tracker.match(f1, f2)
    n1 = int(np.asarray(f1.valid).sum())
    n2 = int(np.asarray(f2.valid).sum())
    Printer.green(f"keypoints: {n1} / {n2}")
    Printer.green(f"matches: {len(i1)}")
    if len(i1):
        d = np.asarray(f2.xy)[i2] - np.asarray(f1.xy)[i1]
        Printer.blue(f"median displacement: {np.median(d, 0).round(2)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
