"""Ground-truth trajectory readers (reference: pySLAM ``io/ground_truth.py``).

Formats:
- KITTI: one ``r11 r12 r13 tx r21 ... tz`` 3x4 row-major pose per line
  (camera-to-world), timestamps in a separate ``times.txt``.
- TUM: ``timestamp tx ty tz qx qy qz qw`` per line.
- EuRoC: ``state_groundtruth_estimate0/data.csv`` ns-timestamped positions +
  quaternion (w, x, y, z order in the csv).

All readers produce (timestamps (T,), positions (T,3), quaternions (T,4 xyzw),
Twc (T,4,4)) in a GroundTruth object supporting nearest-timestamp lookup.
"""

from __future__ import annotations

import os

import numpy as np


def _quat_to_R(q):  # xyzw
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _R_to_quat(R):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s, 0.25 * s]
        )
    i = np.argmax(np.diag(R))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[3] = (R[k, j] - R[j, k]) / s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    return q


class GroundTruth:
    def __init__(self, timestamps, Twc):
        self.timestamps = np.asarray(timestamps, float)
        self.Twc = np.asarray(Twc, float)

    @property
    def positions(self):
        return self.Twc[:, :3, 3]

    def __len__(self):
        return len(self.timestamps)

    def pose_at(self, t: float):
        """Nearest-timestamp pose (no interpolation — matches the evaluation
        association tolerance approach)."""
        i = int(np.argmin(np.abs(self.timestamps - t)))
        return self.Twc[i], self.timestamps[i]

    def trajectory_scale(self, i: int) -> float:
        """Per-frame GT displacement norm (used for mono scale in VO,
        reference ``visual_odometry_base.py:96``)."""
        if i <= 0 or i >= len(self):
            return 0.0
        return float(
            np.linalg.norm(self.Twc[i, :3, 3] - self.Twc[i - 1, :3, 3])
        )


def read_kitti_poses(pose_file: str, times_file: str | None = None) -> GroundTruth:
    data = np.loadtxt(pose_file).reshape(-1, 3, 4)
    T = np.tile(np.eye(4), (len(data), 1, 1))
    T[:, :3, :] = data
    if times_file and os.path.exists(times_file):
        ts = np.loadtxt(times_file)
    else:
        ts = np.arange(len(data)) / 10.0
    return GroundTruth(ts, T)


def read_tum_trajectory(path: str) -> GroundTruth:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.replace(",", " ").split()])
    rows = np.asarray(rows)
    ts = rows[:, 0]
    T = np.tile(np.eye(4), (len(rows), 1, 1))
    T[:, :3, 3] = rows[:, 1:4]
    for i in range(len(rows)):
        T[i, :3, :3] = _quat_to_R(rows[i, 4:8])
    return GroundTruth(ts, T)


def read_euroc_csv(path: str) -> GroundTruth:
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            rows.append([float(x) for x in line.strip().split(",")[:8]])
    rows = np.asarray(rows)
    ts = rows[:, 0] * 1e-9
    T = np.tile(np.eye(4), (len(rows), 1, 1))
    T[:, :3, 3] = rows[:, 1:4]
    for i in range(len(rows)):
        w, x, y, z = rows[i, 4:8]
        T[i, :3, :3] = _quat_to_R([x, y, z, w])
    return GroundTruth(ts, T)


def groundtruth_factory(settings: dict) -> GroundTruth | None:
    """Dispatch on ``type`` like the reference's groundtruth_factory."""
    gt_type = settings.get("type", None)
    if gt_type in (None, "none"):
        return None
    if gt_type == "kitti":
        return read_kitti_poses(settings["path"], settings.get("times_path"))
    if gt_type == "tum":
        return read_tum_trajectory(settings["path"])
    if gt_type == "euroc":
        return read_euroc_csv(settings["path"])
    if gt_type == "synthetic":
        ds = settings["dataset"]
        return GroundTruth(
            np.array([ds.getTimestamp(i) for i in range(len(ds))]), ds.poses
        )
    raise ValueError(f"unknown groundtruth type {gt_type}")
