"""Map bootstrap (reference: pySLAM ``pyslam/slam/initializer.py:78-476``).

- Stereo/RGBD: immediate initialization — the first frame with enough
  depth-valid keypoints becomes the first keyframe, its depths become points.
- Monocular: hold a reference frame, match against incoming frames, estimate
  an essential matrix (batched RANSAC), recover pose, triangulate, normalize
  the median scene depth to 1 (the reference's scale normalization), and
  create the first two keyframes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.ops import epipolar, geometry, lie
from pyslam_tpu.slam.frame import Frame, KeyFrame
from pyslam_tpu.slam.map import Map
from pyslam_tpu.utils.padding import pad_bucket, pad_rows


@dataclass
class InitializerOutput:
    success: bool
    kf_ref: KeyFrame | None = None
    kf_cur: KeyFrame | None = None
    pids: np.ndarray | None = None


class Initializer:
    def __init__(self, sensor_type: SensorType, num_features: int = 2000):
        self.sensor_type = sensor_type
        # acceptance thresholds: the reference's absolute numbers
        # (kInitializerNumMinFeatures=100 etc., config_parameters.py:109-112)
        # assume a 2000-feature budget — scale them with the configured one
        s = num_features / 2000.0
        is_mono = sensor_type == SensorType.MONOCULAR
        self.min_features = max(
            20,
            int((Parameters.kInitializerNumMinFeatures if is_mono
                 else Parameters.kInitializerNumMinFeaturesStereo // 4) * s),
        )
        self.min_inliers = max(30, num_features // 20)      # essential inliers
        self.min_triangulated = max(
            20,
            int((Parameters.kInitializerNumMinTriangulatedPoints if is_mono
                 else Parameters.kInitializerNumMinTriangulatedPointsStereo)
                * s) // 2,
        )
        self.ref_frame: Frame | None = None
        self.num_failures = 0
        self._key = jax.random.PRNGKey(42)

    def reset(self):
        self.ref_frame = None
        self.num_failures = 0

    # ------------------------------------------------------------- stereo
    def try_initialize_stereo(self, f: Frame, slam_map: Map) -> InitializerOutput:
        good = (f.depths > 0) & f.valid
        if good.sum() < self.min_features:
            return InitializerOutput(False)
        kf = KeyFrame(f)
        slam_map.add_keyframe(kf)
        pts_w, idxs = f.unproject_keypoints(np.nonzero(good)[0])
        kf_points = slam_map.add_points_for_keyframe(kf, idxs, pts_w)
        slam_map.update_connections(kf)
        return InitializerOutput(True, kf_ref=kf, kf_cur=kf, pids=kf_points)

    # ---------------------------------------------------------------- mono
    def try_initialize_mono(self, f: Frame, slam_map: Map, tracker) -> InitializerOutput:
        if self.ref_frame is None or not self.ref_frame.valid.any():
            self.ref_frame = f
            return InitializerOutput(False)

        ref = self.ref_frame
        from pyslam_tpu.ops import hamming, matching as m_ops

        d = hamming.descriptor_distance_matrix(
            jnp.asarray(ref.des), jnp.asarray(f.des)
        ).astype(jnp.float32)
        idx2, _ = m_ops.match_ratio_test(
            d, Parameters.kMaxDescriptorDistance,
            ratio=Parameters.kInitializerFeatureMatchRatioTest,
            valid_a=jnp.asarray(ref.valid), valid_b=jnp.asarray(f.valid),
        )
        idx2 = np.asarray(idx2)
        i1 = np.nonzero(idx2 >= 0)[0]
        i2 = idx2[i1]
        if len(i1) < self.min_features:
            self._register_failure(f)
            return InitializerOutput(False)

        cam = f.camera
        xy1, pvalid = pad_bucket(np.asarray(cam.unproject_points(ref.kps[i1])))
        xy2 = pad_rows(np.asarray(cam.unproject_points(f.kps[i2])), len(pvalid))
        self._key, k = jax.random.split(self._key)
        th2 = (1.0 / cam.fx) ** 2 * 3.84
        E, mask, n_inl = epipolar.find_essential(
            k, jnp.asarray(xy1), jnp.asarray(xy2),
            jnp.asarray(pvalid), th2, 512,
        )
        if int(n_inl) < self.min_inliers:
            self._register_failure(f)
            return InitializerOutput(False)

        T21, front_mask = epipolar.recover_pose(E, jnp.asarray(xy1), jnp.asarray(xy2), mask)
        T21 = np.asarray(T21)
        good = np.array(mask & front_mask)
        if good.sum() < self.min_inliers:
            self._register_failure(f)
            return InitializerOutput(False)

        # triangulate inliers (host f64: TPU truncates jnp f64 to f32)
        T1 = jnp.eye(4)
        pts = geometry.triangulate_dlt_np(np.eye(4), T21, xy1, xy2)
        sig1 = pad_rows(
            ref.feature_tracker.sigma2[ref.levels[i1]] / cam.fx**2, len(pvalid), 1.0
        )
        sig2 = pad_rows(
            f.feature_tracker.sigma2[f.levels[i2]] / cam.fx**2, len(pvalid), 1.0
        )
        # keep every point passing depth+reprojection checks; parallax is used
        # only as a GLOBAL init-quality gate (ORB-SLAM style: enough
        # well-conditioned points must exist, but low-parallax points are kept
        # and refined/culled later)
        ok = np.array(
            geometry.triangulation_checks(
                jnp.asarray(pts), T1, jnp.asarray(T21),
                jnp.asarray(xy1), jnp.asarray(xy2),
                jnp.asarray(sig1), jnp.asarray(sig2),
                chi2_th=5.991,
                cos_max_parallax=1.1,  # disable per-point parallax gate
            )
        )
        ok_parallax = np.array(
            geometry.triangulation_checks(
                jnp.asarray(pts), T1, jnp.asarray(T21),
                jnp.asarray(xy1), jnp.asarray(xy2),
                jnp.asarray(sig1), jnp.asarray(sig2),
                chi2_th=5.991,
                cos_max_parallax=Parameters.kCosMaxParallax,
            )
        )
        n_real = len(i1)
        ok = ok & good & np.asarray(pvalid)
        ok_parallax = ok_parallax & good & np.asarray(pvalid)
        ok = ok[:n_real] if len(ok) > n_real else ok
        ok_parallax = ok_parallax[:n_real] if len(ok_parallax) > n_real else ok_parallax
        pts = pts[:n_real]
        if ok_parallax.sum() < self.min_triangulated:
            self._register_failure(f)
            return InitializerOutput(False)

        # scale normalization: median depth in ref frame -> 1
        depths = pts[ok][:, 2]
        med = float(np.median(depths))
        if med <= 0:
            self._register_failure(f)
            return InitializerOutput(False)
        pts_scaled = pts / med
        T21_scaled = T21.copy()
        T21_scaled[:3, 3] /= med

        ref.update_pose(np.eye(4))
        f.update_pose(T21_scaled)

        kf1 = KeyFrame(ref)
        kf2 = KeyFrame(f)
        slam_map.add_keyframe(kf1)
        slam_map.add_keyframe(kf2)
        sel = np.nonzero(ok)[0]
        pids = slam_map.add_points_for_keyframe(
            kf1, i1[sel], pts_scaled[sel], kf2=kf2, kp_idxs2=i2[sel]
        )
        slam_map.update_point_descriptors_and_normals(pids)
        slam_map.update_connections(kf2)
        slam_map.update_connections(kf1)
        return InitializerOutput(True, kf_ref=kf1, kf_cur=kf2, pids=pids)

    def _register_failure(self, f: Frame):
        self.num_failures += 1
        # advance the reference frame if too many failures (reference
        # initializer.py:146 failure handling).  Advancing too eagerly
        # resets the baseline, which starves parallax under forward motion.
        if self.num_failures % 10 == 0:
            self.ref_frame = f

    # --------------------------------------------------------------- entry
    def initialize(self, f: Frame, slam_map: Map, tracker=None) -> InitializerOutput:
        if self.sensor_type in (SensorType.STEREO, SensorType.RGBD):
            return self.try_initialize_stereo(f, slam_map)
        return self.try_initialize_mono(f, slam_map, tracker)
