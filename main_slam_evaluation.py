#!/usr/bin/env python3
"""Batch evaluation entry (reference: pySLAM ``main_slam_evaluation.py``).

    python main_slam_evaluation.py                    # built-in synthetic grid
    python main_slam_evaluation.py --config eval.json # custom grid
"""

from __future__ import annotations

import argparse

from pyslam_tpu.evaluation.manager import (
    EvalConfig,
    SlamEvaluationManager,
)
from pyslam_tpu.features.tracker import FeatureTrackerConfig


def default_config(num_frames: int, runs: int) -> EvalConfig:
    return EvalConfig(
        datasets=[
            {"type": "synthetic", "name": "synth_line_stereo",
             "sensor_type": "stereo", "trajectory": "line",
             "num_frames": num_frames},
            {"type": "synthetic", "name": "synth_line_rgbd",
             "sensor_type": "rgbd", "trajectory": "line",
             "num_frames": num_frames},
        ],
        presets={
            "orb2": FeatureTrackerConfig(num_features=600, num_levels=4),
        },
        runs_per_dataset=runs,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="json grid config")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--out", default="results/eval")
    args = ap.parse_args()

    cfg = EvalConfig.from_json(args.config) if args.config else default_config(
        args.frames, args.runs
    )
    mgr = SlamEvaluationManager(cfg, out_dir=args.out)
    mgr.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
