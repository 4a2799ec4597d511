#!/usr/bin/env python3
"""Full SLAM entry point (reference: pySLAM ``main_slam.py``).

Runs the complete pipeline — tracking, local mapping, loop closing,
optional volumetric integration and semantic mapping — over a configured or
synthetic dataset, writes trajectories, evaluates ATE, and optionally saves
the system state (map.json).

    python main_slam.py                               # synthetic stereo demo
    python main_slam.py --config config.yaml          # configured dataset
    python main_slam.py --sensor rgbd --frames 120 --loop_detector DBOW3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.features.tracker import FeatureTrackerConfig, FeatureTrackerConfigs
from pyslam_tpu.io.dataset_factory import dataset_factory
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.io.ground_truth import groundtruth_factory
from pyslam_tpu.io.trajectory_writer import TrajectoryWriter
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.utils.logging import Printer
from pyslam_tpu.utils.timer import TimerFps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--sensor", default="stereo", choices=["mono", "stereo", "rgbd"])
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--features", default="ORB2")
    ap.add_argument("--num_features", type=int, default=800)
    ap.add_argument("--loop_detector", default="DBOW3")
    ap.add_argument("--no_loop_closing", action="store_true")
    ap.add_argument("--volumetric", action="store_true",
                    help="run TSDF integration on keyframes (rgbd natively; "
                         "stereo/mono via the integrator's depth estimator)")
    ap.add_argument("--depth_estimator", default=None,
                    metavar="TYPE",
                    help="attach a depth estimator (e.g. sgbm, "
                         "depth_anything_v2): upgrades a monocular stream to "
                         "RGBD (reference main_slam.py:127-130) and provides "
                         "dense depth for --volumetric on stereo")
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--save_state", default=None, help="folder for map.json")
    ap.add_argument("--load_state", default=None)
    ap.add_argument("--save_trajectory", default=None)
    ap.add_argument("--trajectory_format", default="tum",
                    choices=["tum", "kitti", "euroc"])
    ap.add_argument("--headless", action="store_true", default=True)
    ap.add_argument("--viewer", action="store_true",
                    help="serve the live interactive 3D viewer (browser "
                         "orbit renderer + pause/step/save/GBA/reset/quit "
                         "controls consumed by this loop — the reference's "
                         "pangolin Viewer3D surface over localhost HTTP)")
    ap.add_argument("--viewer_port", type=int, default=8090)
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler device trace into LOGDIR "
                         "(TensorBoard/Perfetto viewable)")
    ap.add_argument("--print_timings", action="store_true",
                    help="print per-stage moving-average timings at the end")
    args = ap.parse_args()

    # ------------------------------------------------------------- dataset
    if args.config:
        from pyslam_tpu.config import Config

        cfg = Config(args.config)
        dataset = dataset_factory(cfg.dataset_settings)
        gt = groundtruth_factory(cfg.groundtruth_settings)
        camera = cfg.camera
        sensor = {"mono": SensorType.MONOCULAR, "stereo": SensorType.STEREO,
                  "rgbd": SensorType.RGBD}[cfg.sensor_type]
        tracker_cfg = FeatureTrackerConfigs.get(cfg.feature_tracker_config_name)
        tracker_cfg.num_features = cfg.num_features
        loop_cfg = cfg.loop_detection_config_name
    else:
        sensor = {"mono": SensorType.MONOCULAR, "stereo": SensorType.STEREO,
                  "rgbd": SensorType.RGBD}[args.sensor]
        dataset = dataset_factory(
            # period bounds the yaw rate (360/period deg per frame); faster
            # than ~3 deg/frame out-runs frame-to-frame matching on the
            # narrow-FOV synthetic renderer, for this framework AND the
            # reference's matcher geometry. 160 matches tests/test_loop_e2e.
            {"type": "synthetic", "num_frames": args.frames,
             "sensor_type": args.sensor, "trajectory": "loop",
             "period": max(args.frames - 15, 120)}
        )
        gt = groundtruth_factory({"type": "synthetic", "dataset": dataset})
        camera = PinholeCamera(
            dataset.w, dataset.h, dataset.fx, dataset.fy, dataset.cx, dataset.cy,
            fps=dataset.fps,
            bf=dataset.fx * getattr(dataset, "baseline", 0.2),
            depth_threshold=20.0,
        )
        import dataclasses

        try:  # resolve the preset so --features actually switches detectors
            tracker_cfg = dataclasses.replace(
                FeatureTrackerConfigs.get(args.features),
                num_features=args.num_features,
            )
            if tracker_cfg.detector_type.name in ("ORB2", "FAST"):
                tracker_cfg = dataclasses.replace(tracker_cfg, num_levels=4)
        except KeyError:
            tracker_cfg = FeatureTrackerConfig(
                name=args.features, num_features=args.num_features, num_levels=4
            )
        loop_cfg = args.loop_detector

    if args.no_loop_closing:
        loop_cfg = None

    depth_estimator = None
    if args.depth_estimator and sensor == SensorType.MONOCULAR:
        # MONOCULAR -> RGBD upgrade: per-frame estimated depth in the
        # front-end (reference main_slam.py:127-130,232-245)
        from pyslam_tpu.depth_estimation.depth_estimator import (
            depth_estimator_factory,
        )

        depth_estimator = depth_estimator_factory(
            args.depth_estimator, camera=camera
        )

    slam = Slam(camera, tracker_cfg, loop_detector_config=loop_cfg,
                sensor_type=sensor, depth_estimator=depth_estimator)

    if args.load_state:
        slam.load_system_state(args.load_state)

    integrator = None
    if args.volumetric:
        from pyslam_tpu.dense.volumetric_integrator import (
            VolumetricIntegratorType, volumetric_integrator_factory,
        )

        if sensor == SensorType.STEREO or (
            args.depth_estimator and sensor != SensorType.RGBD
        ):
            # no native dense depth: estimate it inside the integrator
            Parameters.kVolumetricIntegrationUseDepthEstimator = True
            if args.depth_estimator:
                Parameters.kVolumetricIntegrationDepthEstimatorType = (
                    args.depth_estimator
                )
        integrator = volumetric_integrator_factory(
            VolumetricIntegratorType.TSDF, camera=camera,
            environment_type=dataset.environment_type,
        )
        slam.set_volumetric_integrator(integrator)   # saved with the state
    semantic_mapping = None
    if args.semantics:
        from pyslam_tpu.semantics.semantic_mapping import semantic_mapping_factory

        semantic_mapping = semantic_mapping_factory(slam.map)
        # wire through the SLAM core: local mapping hands keyframes over and
        # applies per-class information weights in its BA
        # (kUseSemanticsInOptimization; reference optimizer_g2o.py:728-729)
        slam.set_semantic_mapping(semantic_mapping)

    viewer = None
    if args.viewer:
        from pyslam_tpu.viz.live_viewer import LiveViewer3D

        viewer = LiveViewer3D(port=args.viewer_port)
        Printer.cyan(f"live viewer: {viewer.url}")

    # ---------------------------------------------------------------- loop
    timer = TimerFps("frame")
    num_lost = 0

    profile_ctx = None
    if args.profile:
        from pyslam_tpu.utils.profiling import device_trace

        profile_ctx = device_trace(args.profile)
        profile_ctx.__enter__()
        Printer.cyan(f"profiling device trace -> {args.profile}")
    carry = None   # (i, img, img_right) read ahead for the pipelined loop
    for i in range(len(dataset)):
        if carry is not None and carry[0] == i:
            img, img_right_i = carry[1], carry[2]
        else:
            img, img_right_i = dataset.getImage(i), dataset.getImageRight(i)
        if img is None:
            break
        depth = dataset.getDepth(i)
        # pipelined loop: hand the next stereo frame to track() so its
        # extraction dispatch overlaps this frame's readback + host work
        nxt = None
        carry = None
        if i + 1 < len(dataset):
            n_img = dataset.getImage(i + 1)
            n_right = dataset.getImageRight(i + 1)
            carry = (i + 1, n_img, n_right)
            if n_img is not None and n_right is not None:
                nxt = {"img": n_img, "img_right": n_right,
                       "frame_id": i + 1,
                       "timestamp": dataset.getTimestamp(i + 1)}
        with timer:
            slam.track(
                img, img_right=img_right_i, depth=depth,
                frame_id=i, timestamp=dataset.getTimestamp(i),
                next_input=nxt,
            )
        if slam.state.name != "OK":
            num_lost += 1
        if i % 20 == 0:
            Printer.green(
                f"frame {i}/{len(dataset)}: state={slam.state.name} "
                f"kfs={slam.map.num_keyframes()} pts={slam.map.num_points()} "
                f"fps={timer.fps:.1f}"
            )
        if viewer is not None:
            # GUI controls driving the loop (reference main_slam.py:449-478)
            viewer.update(
                slam,
                status=(f"frame {i}/{len(dataset)} · {slam.state.name} · "
                        f"{slam.map.num_keyframes()} kfs · "
                        f"{slam.map.num_points()} pts · "
                        f"{timer.fps:.1f} fps"),
            )
            viewer.wait_if_paused()
            for req in viewer.take_requests():
                if req == "save":
                    out = args.save_state or "./saved_state"
                    slam.save_system_state(out)
                    Printer.green(f"[viewer] state saved -> {out}")
                elif req == "gba":
                    Printer.cyan("[viewer] running global BA ...")
                    slam.bundle_adjust()
                    viewer.update(slam, force=True)
                elif req == "reset":
                    Printer.orange("[viewer] resetting SLAM system")
                    slam.reset()

                    viewer.update(slam, force=True)
            if viewer.should_quit():
                Printer.orange("[viewer] quit requested")
                break

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        Printer.cyan(f"device trace saved: {args.profile}")
    if args.print_timings:
        Printer.cyan(slam.timings_summary())

    # -------------------------------------------------------------- outputs
    ts, poses = slam.get_final_trajectory()
    Printer.blue(
        f"done: {len(ts)} tracked frames, {slam.map.num_keyframes()} keyframes, "
        f"{slam.map.num_points()} points, {num_lost} lost frames"
    )
    if slam.loop_closing is not None:
        Printer.blue(f"loops closed: {slam.loop_closing.num_loops_closed}")

    if args.save_trajectory:
        with TrajectoryWriter(args.trajectory_format, args.save_trajectory) as tw:
            tw.write_full_trajectory(ts, poses)
        Printer.green(f"trajectory -> {args.save_trajectory}")

    metrics = {"num_frames": len(dataset), "num_tracked": len(ts),
               "num_lost": num_lost, "fps": timer.fps}
    if gt is not None and len(ts) > 3:
        res = eval_ate(ts, poses[:, :3, 3], gt.timestamps, gt.positions,
                       with_scale=(sensor == SensorType.MONOCULAR))
        Printer.blue(str(res))
        metrics["ate_rmse"] = res.rmse
        metrics["ate_max"] = res.max

    if args.save_state:
        slam.save_system_state(args.save_state)
        with open(os.path.join(args.save_state, "other_metrics_info.txt"), "w") as f:
            json.dump(metrics, f, indent=2)
    if integrator is not None:
        pts, cols = integrator.get_point_cloud()
        Printer.blue(f"dense map: {len(pts)} surface voxels")
    if viewer is not None:
        import sys
        import time

        viewer.update(slam, status="finished — press quit to exit",
                      force=True)
        if sys.stdin.isatty():   # interactive: keep the final map browsable
            Printer.cyan(f"viewer live at {viewer.url} (quit to exit)")
            while not viewer.should_quit():
                time.sleep(0.2)
        viewer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
