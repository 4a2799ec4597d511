"""Slam facade: the framework's main user-facing class.

Reference surface: pySLAM ``pyslam/slam/slam.py:105-636`` — ``Slam(camera,
feature_tracker_config, loop_detector_config, ..., sensor_type)`` with
``track()``, ``save_system_state()``, ``load_system_state()``,
``get_final_trajectory()``, ``bundle_adjust()``, ``reset()``.

Scheduling: the reference runs local mapping / loop closing / GBA on threads
and processes to escape the GIL.  Here the host drives everything in one
process: ``track()`` runs the front-end graph, then drains the local-mapping
queue (whose heavy stages are async-dispatched device work), then services
loop closing.  JAX's async dispatch gives the same overlap without pickled
queues.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.features.tracker import (
    FeatureTrackerConfig,
    feature_tracker_factory,
)
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.local_mapping import LocalMapping
from pyslam_tpu.slam.map import Map
from pyslam_tpu.slam.map_serialization import map_from_json, map_to_json
from pyslam_tpu.slam.tracking import Tracking, TrackingState
from pyslam_tpu.utils.logging import Printer


class Slam:
    def __init__(
        self,
        camera: PinholeCamera,
        feature_tracker_config: FeatureTrackerConfig | str = "ORB2",
        loop_detector_config=None,
        sensor_type: SensorType = SensorType.MONOCULAR,
        environment_type=None,
        config=None,
        headless: bool = True,
    ):
        self.camera = camera
        self.sensor_type = sensor_type
        self.feature_tracker_config = (
            feature_tracker_config
            if isinstance(feature_tracker_config, FeatureTrackerConfig)
            else None
        )
        self.feature_tracker = feature_tracker_factory(feature_tracker_config)
        # seed the session descriptor-distance gates from the descriptor's
        # reference acceptance distance (reference FeatureInfo.
        # max_descriptor_distance, feature_types.py:152+, consumed session-
        # wide via Parameters in the reference too). ORB keeps 100/50.
        from pyslam_tpu.features.types import FEATURE_INFO

        info = FEATURE_INFO.get(self.feature_tracker.config.descriptor_type)
        if info is not None:
            Parameters.kMaxDescriptorDistance = float(info.max_distance)
            Parameters.kMaxOrbDistanceSearchByReproj = 0.5 * float(info.max_distance)
        self.map = Map()
        self.local_mapping = LocalMapping(
            self.map, camera, sensor_type, self.feature_tracker
        )
        self.tracking = Tracking(
            camera, self.feature_tracker, self.map, sensor_type, self.local_mapping
        )
        self.loop_closing = None
        self.GBA = None
        if loop_detector_config is not None and Parameters.kUseLoopClosing:
            from pyslam_tpu.loop_closing.loop_closing import LoopClosing

            self.loop_closing = LoopClosing(
                self.map, self.camera, self.feature_tracker, loop_detector_config,
                sensor_type=sensor_type,
            )
            self.local_mapping.loop_closing = self.loop_closing
            self.tracking.relocalizer = self.loop_closing.relocalizer

    # ------------------------------------------------------------------ api
    def track(self, img, img_right=None, depth=None, frame_id=0, timestamp=0.0):
        frame = self.tracking.track(
            img, img_right=img_right, depth=depth,
            frame_id=frame_id, timestamp=timestamp,
        )
        if self.tracking.reset_requested:
            Printer.yellow("Slam: resetting session (early tracking loss)")
            self.reset()
        # drain back-end work at keyframe granularity
        self.local_mapping.run_all()
        if self.loop_closing is not None:
            self.loop_closing.step()
        return frame

    @property
    def state(self) -> TrackingState:
        return self.tracking.state

    def timings(self) -> dict:
        """Per-stage moving-average timings of all modules (reference:
        the TimerFps instances surfaced to the plot drawer)."""
        out = {"tracking": self.tracking.timings.report(),
               "local_mapping": self.local_mapping.timings.report()}
        lc = getattr(self.loop_closing, "timings", None)
        if lc is not None:
            out["loop_closing"] = lc.report()
        return out

    def timings_summary(self) -> str:
        return "\n".join(
            f"[{mod}] " + " ".join(
                f"{k}={v['avg_ms']:.1f}ms" for k, v in sorted(st.items()))
            for mod, st in self.timings().items() if st)

    def reset(self):
        self.tracking.reset_requested = False
        self.map = Map()
        self.local_mapping.map = self.map
        self.tracking.map = self.map
        self.tracking.state = TrackingState.NO_IMAGES_YET
        self.tracking.initializer.reset()
        self.tracking.motion_model.reset()

    def get_final_trajectory(self):
        """(timestamps, Twc poses) re-anchored to optimized keyframes."""
        return self.tracking.history.final_trajectory(self.map)

    def get_keyframe_trajectory(self):
        ts, poses = [], []
        for kid in self.map.keyframe_order:
            kf = self.map.keyframes[kid]
            ts.append(kf.timestamp)
            poses.append(kf.Twc)
        return np.asarray(ts), np.asarray(poses)

    def bundle_adjust(self, iters: int = 15):
        """Full-map global BA (reference ``slam.py bundle_adjust``)."""
        from pyslam_tpu.slam.global_bundle_adjustment import global_bundle_adjustment

        return global_bundle_adjustment(
            self.map, self.camera, self.feature_tracker, iters=iters
        )

    # ------------------------------------------------------- state save/load
    def save_system_state(self, path: str):
        """Write map + configs to a folder with a single map.json (reference
        ``slam.py:334-398`` layout: map.json + config_info.json)."""
        os.makedirs(path, exist_ok=True)
        d = map_to_json(self.map)
        d["camera"] = self.camera.to_json()
        d["sensor_type"] = self.sensor_type.name
        if self.feature_tracker_config is not None:
            d["feature_tracker_config"] = self.feature_tracker_config.to_json()
        with open(os.path.join(path, "map.json"), "w") as f:
            json.dump(d, f)
        with open(os.path.join(path, "config_info.json"), "w") as f:
            json.dump(
                {
                    "sensor_type": self.sensor_type.name,
                    "num_keyframes": self.map.num_keyframes(),
                    "num_points": self.map.num_points(),
                },
                f,
                indent=2,
            )
        Printer.green(f"saved system state to {path}")

    def load_system_state(self, path: str):
        with open(os.path.join(path, "map.json")) as f:
            d = json.load(f)
        self.map = map_from_json(d, self.feature_tracker, self.camera)
        self.local_mapping.map = self.map
        self.tracking.map = self.map
        # relocalize into the loaded map and extend it (INIT_RELOCALIZE,
        # reference slam.py:400-524)
        self.tracking.state = TrackingState.INIT_RELOCALIZE
        self.tracking.kf_ref = self.map.last_keyframe()
        Printer.green(
            f"loaded system state from {path}: {self.map.num_keyframes()} KFs, "
            f"{self.map.num_points()} points"
        )
