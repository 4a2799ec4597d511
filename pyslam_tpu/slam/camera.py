"""Camera models (reference: pySLAM ``pyslam/slam/camera.py``).

``PinholeCamera`` carries intrinsics, distortion, stereo baseline (bf) and the
depth thresholds the tracking front-end uses.  Projection math lives in
``pyslam_tpu.ops.geometry`` (jitted, batched); this class is the host-side
parameter holder with convenience methods accepting numpy or jax arrays.
"""

from __future__ import annotations

import enum

import numpy as np
import jax.numpy as jnp

from pyslam_tpu.ops import geometry


class CameraType(enum.Enum):
    PINHOLE = 0


class Camera:
    def __init__(self, width, height, fx, fy, cx, cy):
        self.width = int(width)
        self.height = int(height)
        self.fx, self.fy, self.cx, self.cy = float(fx), float(fy), float(cx), float(cy)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], np.float64
        )


class PinholeCamera(Camera):
    def __init__(
        self,
        width,
        height,
        fx,
        fy,
        cx,
        cy,
        D=None,
        fps: float = 30.0,
        bf: float = 0.0,
        depth_factor: float = 1.0,
        depth_threshold: float | None = None,
    ):
        super().__init__(width, height, fx, fy, cx, cy)
        self.type = CameraType.PINHOLE
        self.D = np.zeros(5) if D is None else np.asarray(D, np.float64).reshape(-1)[:5]
        if len(self.D) < 5:
            self.D = np.pad(self.D, (0, 5 - len(self.D)))
        self.fps = fps
        self.bf = float(bf)
        self.b = self.bf / self.fx if self.fx else 0.0
        self.depth_factor = depth_factor
        # close/far point threshold: bf * th / fx (ORB-SLAM ThDepth semantics)
        self.depth_threshold = (
            depth_threshold if depth_threshold is not None else (40.0 * self.b if bf else np.inf)
        )
        self.is_distorted = bool(np.any(self.D != 0.0))
        self.u_min, self.u_max = 0.0, float(width)
        self.v_min, self.v_max = 0.0, float(height)
        if self.is_distorted:
            self._init_undistorted_bounds()

    def _init_undistorted_bounds(self):
        corners = np.array(
            [
                [0, 0],
                [self.width, 0],
                [0, self.height],
                [self.width, self.height],
            ],
            np.float64,
        )
        und = np.asarray(self.undistort_points(corners))
        self.u_min = float(min(und[0, 0], und[2, 0]))
        self.u_max = float(max(und[1, 0], und[3, 0]))
        self.v_min = float(min(und[0, 1], und[1, 1]))
        self.v_max = float(max(und[2, 1], und[3, 1]))

    # ------------------------------------------------------------- helpers
    # These run in HOST orchestration code on small data-dependent shapes:
    # numpy, not jnp — an eager jnp op here is a device dispatch (and on the
    # remote-TPU tunnel, a fresh tiny executable per shape).  Device-side
    # code traces ops.geometry directly inside its jits.
    def undistort_points(self, uv):
        if not self.is_distorted:
            return np.asarray(uv, np.float32)
        return np.asarray(
            geometry.undistort_pixels(
                jnp.asarray(uv, jnp.float32),
                jnp.asarray(self.K, jnp.float32),
                jnp.asarray(self.D, jnp.float32),
            )
        )

    def unproject_points(self, uv):
        """Pixels -> normalized coords on z=1 plane (undistorted input)."""
        uv = np.asarray(uv, np.float32)
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return np.stack([x, y], axis=-1)

    def project_points(self, Tcw, pts_w):
        Tcw = np.asarray(Tcw, np.float32)
        pts_w = np.asarray(pts_w, np.float32)
        pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[..., 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        uv = pc[..., :2] / zs[..., None]
        uv = uv * np.array([self.fx, self.fy], np.float32) + np.array(
            [self.cx, self.cy], np.float32
        )
        return uv, z

    def backproject_points(self, uv, depth):
        uv = np.asarray(uv, np.float32)
        depth = np.asarray(depth, np.float32)
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return np.stack([x * depth, y * depth, depth], axis=-1)

    def is_in_image(self, uv, margin: float = 0.0):
        uv = np.asarray(uv)
        return (
            (uv[..., 0] >= self.u_min + margin)
            & (uv[..., 0] < self.u_max - margin)
            & (uv[..., 1] >= self.v_min + margin)
            & (uv[..., 1] < self.v_max - margin)
        )

    def to_json(self):
        return {
            "width": self.width,
            "height": self.height,
            "fx": self.fx,
            "fy": self.fy,
            "cx": self.cx,
            "cy": self.cy,
            "D": self.D.tolist(),
            "fps": self.fps,
            "bf": self.bf,
            "depth_factor": self.depth_factor,
            "depth_threshold": float(self.depth_threshold),
        }

    @staticmethod
    def from_json(d: dict) -> "PinholeCamera":
        return PinholeCamera(
            d["width"], d["height"], d["fx"], d["fy"], d["cx"], d["cy"],
            D=d.get("D"), fps=d.get("fps", 30.0), bf=d.get("bf", 0.0),
            depth_factor=d.get("depth_factor", 1.0),
            depth_threshold=d.get("depth_threshold"),
        )
