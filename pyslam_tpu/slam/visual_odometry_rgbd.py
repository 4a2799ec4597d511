"""RGBD visual odometry (reference: pySLAM
``pyslam/slam/visual_odometry_rgbd.py:116-259`` ``VisualOdometryRgbdTensor``).

Per frame: LK-track the previous frame's keypoints (pyramidal, jitted),
backproject with the previous depth map, estimate the relative pose with the
batched Gauss-Newton 3D-2D solver, optional RANSAC gating.  Absolute scale
comes from depth — no GT needed (unlike the monocular VO).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.ops import fast, lk, nms, optim
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.utils.padding import pad_bucket, pad_rows


class VisualOdometryRgbd:
    def __init__(self, camera: PinholeCamera, num_features: int = 600,
                 min_tracked: int = 50):
        self.camera = camera
        self.num_features = num_features
        self.min_tracked = min_tracked
        self.cur_Twc = np.eye(4)
        self.poses = [np.eye(4)]
        self.timestamps = [0.0]
        self.prev_img = None
        self.prev_depth = None
        self.prev_pts = None
        self.num_tracked = 0

    def _detect(self, img):
        score = fast.nms3x3(fast.fast_score_map(jnp.asarray(img, jnp.float32), 15.0))
        xy, _, valid = nms.grid_topk_keypoints(score, 16, 6, self.num_features)
        return np.asarray(xy)[np.asarray(valid)]

    def track(self, img, depth, frame_id: int, timestamp: float = 0.0):
        img = np.asarray(img, np.float32)
        depth = np.asarray(depth, np.float32)
        if self.prev_img is None:
            self.prev_img = img
            self.prev_depth = depth
            self.prev_pts = self._detect(img)
            self.timestamps[0] = timestamp
            return self.cur_Twc

        pts0 = self.prev_pts
        if len(pts0) < 10:
            pts0 = self._detect(self.prev_img)
        pts0p, valid0 = pad_bucket(pts0.astype(np.float32))
        pts1, ok, res = lk.lk_track_pyramidal(
            jnp.asarray(self.prev_img), jnp.asarray(img), jnp.asarray(pts0p)
        )
        pts1 = np.asarray(pts1)[: len(pts0)]
        ok = np.asarray(ok)[: len(pts0)] & (np.asarray(res)[: len(pts0)] < 12.0)

        # backproject with prev depth
        h, w = depth.shape
        xs = np.clip(np.round(pts0[:, 0]).astype(int), 0, w - 1)
        ys = np.clip(np.round(pts0[:, 1]).astype(int), 0, h - 1)
        z = self.prev_depth[ys, xs]
        ok &= z > 0.1
        self.num_tracked = int(ok.sum())
        if self.num_tracked >= self.min_tracked * 0.3:
            p3d_prev = np.asarray(
                self.camera.backproject_points(pts0[ok], z[ok])
            )
            xy1 = np.asarray(self.camera.unproject_points(pts1[ok]))
            # solve T_cur_prev: minimize reproj of prev-frame 3D in cur frame
            n = len(p3d_prev)
            p3dp, valid = pad_bucket(p3d_prev.astype(np.float32))
            m = len(valid)
            uvp = pad_rows(pts1[ok].astype(np.float32), m)
            sig = np.ones(m, np.float32)
            T_opt, inl, n_inl = optim.pose_optimization(
                jnp.eye(4, dtype=jnp.float32),
                jnp.asarray(p3dp),
                jnp.asarray(uvp),
                jnp.full((m,), -1.0, jnp.float32),
                jnp.asarray(sig),
                jnp.asarray(valid),
                jnp.asarray(self.camera.K, jnp.float32),
            )
            if int(n_inl) >= 10:
                T_cur_prev = np.asarray(T_opt)
                self.cur_Twc = self.cur_Twc @ np.linalg.inv(T_cur_prev)

        self.prev_img = img
        self.prev_depth = depth
        # re-detect to keep feature count healthy
        self.prev_pts = self._detect(img)
        self.poses.append(self.cur_Twc.copy())
        self.timestamps.append(timestamp)
        return self.cur_Twc

    @property
    def trajectory(self):
        return np.asarray([T[:3, 3] for T in self.poses])
