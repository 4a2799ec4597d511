#!/usr/bin/env python3
"""Semantic segmentation demo (reference: pySLAM
``main_semantic_image_segmentation.py``)."""

from __future__ import annotations

import argparse

import numpy as np

from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.semantics.semantic_segmentation import semantic_segmentation_factory
from pyslam_tpu.utils.logging import Printer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="intensity_bands")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    ds = SyntheticDataset(num_frames=args.frames, sensor_type=SensorType.MONOCULAR)
    seg = semantic_segmentation_factory(args.backend)
    for i in range(args.frames):
        out = seg.infer(ds.getImage(i))
        labs, counts = np.unique(out["labels"], return_counts=True)
        top = labs[np.argsort(-counts)][:5]
        Printer.green(f"frame {i}: {len(labs)} classes, top: {top.tolist()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
