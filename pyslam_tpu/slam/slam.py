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
        depth_estimator=None,
    ):
        self.camera = camera
        # depth-estimator upgrade (reference main_slam.py:127-130): with a
        # depth estimator attached, a MONOCULAR stream is tracked as RGBD —
        # per-frame estimated depth seeds stereo-style map points
        self.depth_estimator = depth_estimator
        if depth_estimator is not None and sensor_type == SensorType.MONOCULAR:
            Printer.yellow(
                "Slam: depth estimator attached — upgrading MONOCULAR to RGBD"
            )
            sensor_type = SensorType.RGBD
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
        self.volumetric_integrator = None
        self.GBA = None
        self._prefetched = None   # (frame_id, deferred Frame) pipeline slot
        self._last_input = None   # (frame_id, (img, img_right, depth))
        self.semantic_mapping = None   # attach via set_semantic_mapping()
        if loop_detector_config is not None and Parameters.kUseLoopClosing:
            from pyslam_tpu.loop_closing.loop_closing import LoopClosing

            self.loop_closing = LoopClosing(
                self.map, self.camera, self.feature_tracker, loop_detector_config,
                sensor_type=sensor_type,
            )
            self.local_mapping.loop_closing = self.loop_closing
            self.loop_closing.local_mapping = self.local_mapping
            self.tracking.relocalizer = self.loop_closing.relocalizer
            self.GBA = self.loop_closing.gba   # async post-loop GBA runner

    # ------------------------------------------------------------------ api
    def track(self, img, img_right=None, depth=None, frame_id=0,
              timestamp=0.0, next_input: dict | None = None):
        """Track one frame.  ``next_input`` (optional) pipelines the frame
        loop: a dict ``{img, img_right, frame_id, timestamp}`` for the NEXT
        frame whose feature extraction is dispatched right after this
        frame's tracking step — extraction N+1 then computes on-device while
        the host finishes frame N (readback, keyframe decision, back-end
        slices).  Warm per-frame wall time drops to ~max(host work, device
        work) + one tunnel round trip."""
        import time as _time

        _tl = os.environ.get("PYSLAM_FRAME_TIMELINE") == "1"
        _t0 = _time.perf_counter()
        if depth is None and self.depth_estimator is not None:
            # per-frame estimated depth (reference main_slam.py:232-245)
            depth, _ = self.depth_estimator.infer(img, img_right=img_right)
        # harvest back-end results that landed while the previous frame was
        # on the host (LBA chunks finished on device): tracking this frame
        # then sees the refined map — the same freshness the reference gets
        # from its mapping thread applying results mid-frame
        self.local_mapping.harvest()
        _t1 = _time.perf_counter()
        # consume a prefetched frame (extraction already in flight)
        pre = None
        if self._prefetched is not None:
            pf_id, pf_frame = self._prefetched
            self._prefetched = None
            if pf_id == frame_id:
                pre = pf_frame
        fired = []
        if next_input is not None and next_input.get("img_right") is not None:
            from pyslam_tpu.slam.frame import Frame

            def _prefetch():
                fired.append(True)
                ni = next_input
                f = Frame(
                    self.camera, ni["img"], img_right=ni.get("img_right"),
                    timestamp=ni.get("timestamp", 0.0),
                    feature_tracker=self.feature_tracker,
                    frame_id=ni["frame_id"], defer_features=True,
                )
                self._prefetched = (ni["frame_id"], f)

            self.tracking.on_fused_dispatched = _prefetch
        frame = self.tracking.track(
            img, img_right=img_right, depth=depth,
            frame_id=frame_id, timestamp=timestamp, frame=pre,
        )
        _t2 = _time.perf_counter()
        self.tracking.on_fused_dispatched = None
        if next_input is not None and next_input.get("img_right") is not None \
                and not fired:
            # fused path didn't run this frame: prefetch now so the next
            # frame still overlaps with the back-end work below
            _prefetch()
        if self.tracking.reset_requested:
            Printer.yellow("Slam: resetting session (early tracking loss)")
            self.reset()
        # a keyframe created this frame: snapshot its raw images for the
        # dense integrator and semantic mapper (frames don't retain full
        # images; both consume the snapshot when local mapping hands the
        # keyframe over).  In the pipelined frame loop (tracking runs one
        # frame behind the input stream) the new keyframe belongs to the
        # PREVIOUS call's input — one input snapshot is retained for that.
        vi = self.volumetric_integrator
        kf = self.tracking.kf_ref
        if kf is not None and (vi is not None or self.semantic_mapping is not None):
            imgs = None
            if kf.id == frame_id:
                imgs = (img, img_right, depth)
            elif self._last_input is not None and kf.id == self._last_input[0]:
                imgs = self._last_input[1]
            if imgs is not None:
                l_img, l_right, l_depth = imgs
                if vi is not None:
                    vi.offer_keyframe_data(
                        kf, intensity=l_img, img_right=l_right,
                        depth=None if l_depth is None
                        else np.where(np.asarray(l_depth) > 0, l_depth, 0.0),
                    )
                if self.semantic_mapping is not None:
                    self.semantic_mapping.offer_keyframe_image(kf.kid, l_img)
        self._last_input = (frame_id, (img, img_right, depth))
        # advance the back-end by one bounded slice: host stages interleave
        # one-per-frame, LBA chunks run on the device while tracking
        # continues (reference overlap: local mapping thread + abort flag)
        self.local_mapping.step_async()
        _t3 = _time.perf_counter()
        if self.loop_closing is not None:
            self.loop_closing.step()
        if vi is not None:
            vi.step()   # at most one snapshot integration dispatch per frame
        if self.semantic_mapping is not None:
            self.semantic_mapping.step()   # one segmentation per frame max
        if _tl:
            _t4 = _time.perf_counter()
            tt = self.tracking.timings.timers

            def _last(k):
                t = tt.get(k)
                return 1e3 * t.elapsed if t is not None else 0.0

            print(
                f"[tl] f{frame_id} lm_harvest={1e3*(_t1-_t0):.0f} "
                f"track={1e3*(_t2-_t1):.0f} "
                f"(disp={_last('track_dispatch'):.0f} "
                f"harv={_last('track_harvest'):.0f} "
                f"kf={_last('kf_decision'):.0f} "
                f"frame={_last('frame'):.0f}) "
                f"snap+step_async={1e3*(_t3-_t2):.0f} "
                f"lc+vi+sem={1e3*(_t4-_t3):.0f}",
                flush=True,
            )
        return frame

    def finish(self):
        """Drain all queued back-end work (call at sequence end before
        reading the final trajectory/map)."""
        self.tracking.flush_pipeline()
        self.local_mapping.finish()
        if self.loop_closing is not None:
            self.loop_closing.finish()
        if self.volumetric_integrator is not None:
            self.volumetric_integrator.run_all()
        if self.semantic_mapping is not None:
            self.semantic_mapping.run_all()

    def prewarm(self):
        """Compile every steady-state graph VARIANT that is not exercised by
        the first tracked frames: the legacy tracking fallback chain and both
        chunked-LBA variants (lam0 absent/threaded).  Calling this during a
        session's warmup phase makes ``recompiles_after_warmup == 0`` a hard
        invariant (asserted by bench.py)."""
        import jax
        import jax.numpy as jnp

        from pyslam_tpu.ops import optim
        from pyslam_tpu.utils.padding import fixed_shapes

        self.tracking.prewarm()
        if fixed_shapes():
            C = Parameters.kLBAMaxCameras
            P = Parameters.kLBAMaxPoints
            O = Parameters.kLBAMaxObservations
            rng = np.random.default_rng(0)
            fixed = np.zeros(C, bool)
            fixed[0] = True
            prob = optim.BAProblem(
                poses=jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                          (C, 1, 1))),
                points=jnp.asarray(rng.uniform(-5, 5, (P, 3)).astype(np.float32)),
                cam_idx=jnp.asarray((np.arange(O) % C).astype(np.int32)),
                pt_idx=jnp.asarray((np.arange(O) % P).astype(np.int32)),
                uv=jnp.asarray(rng.uniform(0, 200, (O, 2)).astype(np.float32)),
                ur=jnp.full((O,), -1.0, jnp.float32),
                sigma2=jnp.ones((O,), jnp.float32),
                valid=jnp.ones((O,), bool),
                fixed=jnp.asarray(fixed),
                K=jnp.asarray(self.camera.K, jnp.float32),
                bf=jnp.asarray(self.camera.bf, jnp.float32),
            )
            total = Parameters.kOptimizerLBAIterations
            chunk = max(2, (total + 1) // 2)
            r = optim.bundle_adjust(prob, iters=min(chunk, total),
                                    return_state=True)
            r2 = optim.bundle_adjust(prob, iters=chunk, lam0=r[3],
                                     return_state=True)
            jax.block_until_ready((r[0], r2[0]))

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
        # all-calls average x call count (windowed averages hide how OFTEN a
        # stage ran, which is the attribution that matters for stages that
        # only run on fallback/keyframe frames)
        return "\n".join(
            f"[{mod}] " + " ".join(
                f"{k}={v['total_ms'] / max(v['calls'], 1):.1f}ms*{v['calls']}"
                for k, v in sorted(st.items()))
            for mod, st in self.timings().items() if st)

    def set_volumetric_integrator(self, integrator):
        """Attach a dense integrator: receives keyframes from local mapping
        and is saved/loaded with the system state (reference slam.py holds
        volumetric_integrator the same way)."""
        self.volumetric_integrator = integrator
        self.local_mapping.volumetric_integrator = integrator

    def set_semantic_mapping(self, semantic_mapping):
        """Attach semantic mapping: local mapping hands each digested
        keyframe over AND uses per-class information weights in its BA
        (``kUseSemanticsInOptimization``) — the reference wires this in
        ``slam.py`` construction + ``optimizer_g2o.py:728-729``."""
        self.semantic_mapping = semantic_mapping
        self.local_mapping.semantic_mapping = semantic_mapping

    def reset(self):
        self.tracking.reset_requested = False
        self._prefetched = None
        self._last_input = None
        self.tracking._pending = None
        self.tracking._last_fused_out = None
        self.map = Map()
        self.local_mapping.map = self.map
        self.local_mapping.queue.clear()
        self.local_mapping._job = None
        self.local_mapping._tri_job = None
        self.local_mapping._fuse_job = None
        self.local_mapping._lba = None
        self.local_mapping.opt_abort_flag = False
        self.tracking.map = self.map
        self.tracking._store_cache = None
        self.tracking.state = TrackingState.NO_IMAGES_YET
        self.tracking.initializer.reset()
        self.tracking.motion_model.reset()
        if self.loop_closing is not None:
            self.loop_closing.reset()
        vi = getattr(self, "volumetric_integrator", None)
        if vi is not None:
            vi.reset()

    def get_final_trajectory(self):
        """(timestamps, Twc poses) re-anchored to optimized keyframes."""
        self.finish()   # drain queued back-end work first
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
        self.finish()
        from pyslam_tpu.slam.global_bundle_adjustment import global_bundle_adjustment

        return global_bundle_adjustment(
            self.map, self.camera, self.feature_tracker, iters=iters
        )

    # ------------------------------------------------------- state save/load
    def save_system_state(self, path: str, schema: str = "native"):
        """Write map + configs to a folder with a single map.json (reference
        ``slam.py:334-398`` layout: map.json + config_info.json).

        ``schema="native"`` writes the compact b64 SoA format;
        ``schema="reference"`` writes the reference's cross-core map.json
        (``pyslam/slam/map.py:945``) so the reference can load our maps."""
        self.finish()
        os.makedirs(path, exist_ok=True)
        if schema == "reference":
            from pyslam_tpu.slam.map_serialization_ref import (
                map_to_reference_json,
            )

            d = map_to_reference_json(
                self.map, self.camera, sensor_type=self.sensor_type,
                feature_tracker_config=self.feature_tracker_config,
            )
        else:
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
        # loop-closing DB + volumetric state travel with the map (reference
        # slam.py:334-398 saves both)
        if self.loop_closing is not None:
            self.loop_closing.save(path)
        vi = getattr(self, "volumetric_integrator", None)
        if vi is not None:
            vi.save(os.path.join(path, "volumetric_state.npz"))
        Printer.green(f"saved system state to {path}")

    def load_system_state(self, path: str):
        with open(os.path.join(path, "map.json")) as f:
            d = json.load(f)
        if d.get("format", "").startswith("pyslam_tpu_map"):
            self.map = map_from_json(d, self.feature_tracker, self.camera)
        else:
            # auto-detect the reference schema (cross-core map.json)
            from pyslam_tpu.slam.map_serialization_ref import (
                is_reference_schema,
                map_from_reference_json,
            )

            if not is_reference_schema(d):
                raise ValueError(f"unrecognized map.json schema in {path}")
            self.map = map_from_reference_json(
                d, self.feature_tracker, self.camera
            )
        self.local_mapping.map = self.map
        self.tracking.map = self.map
        self.tracking._store_cache = None
        if self.loop_closing is not None:
            self.loop_closing.map = self.map
            restored = self.loop_closing.load(path)
            if restored:
                Printer.green("loop-closing DB restored from saved state")
            else:
                # older save without DB state: rebuild descriptors lazily as
                # keyframes are revisited (detector re-describes on demand)
                self.loop_closing.reset()
        vi = getattr(self, "volumetric_integrator", None)
        if vi is not None and os.path.exists(
            os.path.join(path, "volumetric_state.npz")
        ):
            vi.load(os.path.join(path, "volumetric_state.npz"))
        # relocalize into the loaded map and extend it (INIT_RELOCALIZE,
        # reference slam.py:400-524)
        self.tracking.state = TrackingState.INIT_RELOCALIZE
        self.tracking.kf_ref = self.map.last_keyframe()
        Printer.green(
            f"loaded system state from {path}: {self.map.num_keyframes()} KFs, "
            f"{self.map.num_points()} points"
        )
