"""Standalone visual odometry (reference: pySLAM
``pyslam/slam/visual_odometry.py:64-251`` ``VisualOdometryEducational``).

Per frame: extract features (jitted ORB2 pipeline), match against the
previous frame (MXU Hamming + ratio/one-to-one), estimate the relative pose
with batched-hypothesis RANSAC on the essential matrix + cheirality pose
recovery (replaces cv2.findEssentialMat/recoverPose), scale translation from
ground truth (monocular scale is unobservable), accumulate Twc.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.features.tracker import FeatureTracker
from pyslam_tpu.io.ground_truth import GroundTruth
from pyslam_tpu.ops import epipolar
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.utils.padding import pad_bucket, pad_rows


class VoState(enum.Enum):
    NO_IMAGES_YET = 0
    GOT_FIRST_IMAGE = 1


class VisualOdometry:
    def __init__(
        self,
        camera: PinholeCamera,
        feature_tracker: FeatureTracker,
        groundtruth: GroundTruth | None = None,
        ransac_threshold_px: float = 1.0,
        num_ransac_hypotheses: int = 512,
        min_matches: int = 30,
    ):
        self.camera = camera
        self.tracker = feature_tracker
        self.groundtruth = groundtruth
        self.state = VoState.NO_IMAGES_YET
        self.threshold2 = (ransac_threshold_px / camera.fx) ** 2
        self.num_hyp = num_ransac_hypotheses
        self.min_matches = min_matches

        self.cur_Twc = np.eye(4)
        self.poses = [np.eye(4)]
        self.timestamps = [0.0]
        self.prev_feats = None
        self.num_matches = 0
        self.num_inliers = 0
        self._key = jax.random.PRNGKey(0)
        self._frame_id = 0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def track(self, img, frame_id: int, timestamp: float = 0.0):
        feats = self.tracker.detectAndCompute(img)
        if self.state == VoState.NO_IMAGES_YET:
            self.prev_feats = feats
            self.state = VoState.GOT_FIRST_IMAGE
            self.timestamps[0] = timestamp
            self._frame_id = frame_id
            return self.cur_Twc

        i1, i2 = self.tracker.match(self.prev_feats, feats)
        self.num_matches = len(i1)
        if self.num_matches >= self.min_matches:
            uv1 = np.asarray(self.prev_feats.xy)[i1]
            uv2 = np.asarray(feats.xy)[i2]
            xy1, pvalid = pad_bucket(
                np.asarray(self.camera.unproject_points(self.camera.undistort_points(uv1)))
            )
            xy2 = pad_rows(
                np.asarray(self.camera.unproject_points(self.camera.undistort_points(uv2))),
                len(pvalid),
            )
            valid = jnp.asarray(pvalid)
            E, mask, n_inl = epipolar.find_essential(
                self._next_key(), jnp.asarray(xy1), jnp.asarray(xy2), valid,
                self.threshold2, self.num_hyp,
            )
            self.num_inliers = int(n_inl)
            if self.num_inliers >= 8:
                T21, _ = epipolar.recover_pose(E, jnp.asarray(xy1), jnp.asarray(xy2), mask)
                T21 = np.asarray(T21)
                # absolute scale from GT displacement (reference
                # visual_odometry_base.py:96); unit-norm fallback without GT
                scale = 1.0
                if self.groundtruth is not None:
                    Tw_prev, _ = self.groundtruth.pose_at(self.timestamps[-1])
                    Tw_cur, _ = self.groundtruth.pose_at(timestamp)
                    scale = float(np.linalg.norm(Tw_cur[:3, 3] - Tw_prev[:3, 3]))
                T12 = np.linalg.inv(T21)
                T12[:3, 3] *= scale
                self.cur_Twc = self.cur_Twc @ T12

        self.prev_feats = feats
        self.poses.append(self.cur_Twc.copy())
        self.timestamps.append(timestamp)
        self._frame_id = frame_id
        return self.cur_Twc

    @property
    def trajectory(self):
        return np.asarray([T[:3, 3] for T in self.poses])


# Backwards-compatible alias mirroring the reference class name
VisualOdometryEducational = VisualOdometry
