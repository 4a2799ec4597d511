"""Dataset loaders: KITTI / TUM / EuRoC / ICL-NUIM / folder / video / synthetic.

Host-side analog of the reference's dataset classes (pySLAM
``pyslam/io/dataset.py:51-1642``) with the same iteration surface:
``dataset.getImage(i)``, ``getImageRight(i)``, ``getDepth(i)``,
``getTimestamp(i)``, ``num_frames``, ``sensor_type``.  Image decoding uses
PIL (no OpenCV dependency); all loaders return float32 grayscale (H, W) in
[0, 255] plus optional color.

The SYNTHETIC dataset renders a deterministic blob-textured 3D world along a
parametric camera trajectory with exact ground truth — the framework's
fixture for end-to-end SLAM tests (the reference relies on real datasets on
disk; we need hermetic CI).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import numpy as np

from pyslam_tpu.io.dataset_types import DatasetEnvironmentType, DatasetType, SensorType


def _imread_gray(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("L", "I;16", "I"):
        img = img.convert("L")
    arr = np.asarray(img)
    return arr.astype(np.float32)


def _imread_color(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _imread_depth_png(path: str, depth_factor: float) -> np.ndarray:
    from PIL import Image

    arr = np.asarray(Image.open(path)).astype(np.float32)
    return arr / depth_factor


class DatasetBase:
    sensor_type: SensorType = SensorType.MONOCULAR
    environment_type: DatasetEnvironmentType = DatasetEnvironmentType.OUTDOOR
    num_frames: int = 0
    fps: float = 30.0
    depth_factor: float = 1.0

    def getImage(self, i: int) -> np.ndarray | None:
        raise NotImplementedError

    def getImageColor(self, i: int) -> np.ndarray | None:
        return None

    def getImageRight(self, i: int) -> np.ndarray | None:
        return None

    def getDepth(self, i: int) -> np.ndarray | None:
        return None

    def getTimestamp(self, i: int) -> float:
        return i / self.fps

    def isOk(self) -> bool:
        return True

    def __len__(self) -> int:
        return self.num_frames

    def __iter__(self):
        for i in range(self.num_frames):
            yield i, self.getImage(i), self.getImageRight(i), self.getDepth(i), self.getTimestamp(i)


class KittiDataset(DatasetBase):
    """KITTI odometry: ``sequences/NN/image_0`` (left) / ``image_1`` (right),
    ``times.txt`` (reference KittiDataset, pySLAM ``io/dataset.py``)."""

    def __init__(self, base_path: str, sequence: str, sensor_type=SensorType.STEREO):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.OUTDOOR
        seq_dir = os.path.join(base_path, "sequences", sequence)
        self.left = sorted(glob.glob(os.path.join(seq_dir, "image_0", "*.png")))
        self.right = sorted(glob.glob(os.path.join(seq_dir, "image_1", "*.png")))
        self.num_frames = len(self.left)
        times_file = os.path.join(seq_dir, "times.txt")
        if os.path.exists(times_file):
            self.timestamps = np.loadtxt(times_file)
        else:
            self.timestamps = np.arange(self.num_frames) / 10.0
        self.fps = 10.0

    def getImage(self, i):
        return _imread_gray(self.left[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.left[i]) if i < self.num_frames else None

    def getImageRight(self, i):
        if self.sensor_type == SensorType.STEREO and i < len(self.right):
            return _imread_gray(self.right[i])
        return None

    def getTimestamp(self, i):
        return float(self.timestamps[i])


class TumDataset(DatasetBase):
    """TUM RGBD: ``rgb.txt`` / ``depth.txt`` with timestamp filename pairs,
    associated by nearest timestamp (reference TumDataset + associate logic)."""

    def __init__(self, base_path: str, sequence: str, associations: str | None = None,
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        self.depth_factor = 5000.0
        self.seq_dir = os.path.join(base_path, sequence)
        rgb_list = self._read_file_list(os.path.join(self.seq_dir, "rgb.txt"))
        depth_list = self._read_file_list(os.path.join(self.seq_dir, "depth.txt"))
        pairs = self._associate(rgb_list, depth_list, max_dt=0.08)
        self.rgb_files = [rgb_list[a] for a, b in pairs]
        self.depth_files = [depth_list[b] for a, b in pairs]
        self.timestamps = np.array([a for a, b in pairs])
        self.num_frames = len(pairs)
        self.fps = 30.0

    @staticmethod
    def _read_file_list(path: str) -> dict:
        out = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                out[float(parts[0])] = parts[1]
        return out

    @staticmethod
    def _associate(a: dict, b: dict, max_dt: float):
        """Greedy nearest-timestamp association (same algorithm as the TUM
        benchmark's associate.py used by the reference)."""
        pairs = []
        b_keys = sorted(b.keys())
        used = set()
        for ta in sorted(a.keys()):
            best, best_dt = None, max_dt
            import bisect

            i = bisect.bisect_left(b_keys, ta)
            for j in (i - 1, i, i + 1):
                if 0 <= j < len(b_keys) and b_keys[j] not in used:
                    dt = abs(b_keys[j] - ta)
                    if dt < best_dt:
                        best, best_dt = b_keys[j], dt
            if best is not None:
                used.add(best)
                pairs.append((ta, best))
        return pairs

    def getImage(self, i):
        return _imread_gray(os.path.join(self.seq_dir, self.rgb_files[i]))

    def getImageColor(self, i):
        return _imread_color(os.path.join(self.seq_dir, self.rgb_files[i]))

    def getDepth(self, i):
        return _imread_depth_png(
            os.path.join(self.seq_dir, self.depth_files[i]), self.depth_factor
        )

    def getTimestamp(self, i):
        return float(self.timestamps[i])


class EurocDataset(DatasetBase):
    """EuRoC MAV: ``mav0/cam0/data`` + ``cam1/data``, timestamps from csv."""

    def __init__(self, base_path: str, sequence: str, sensor_type=SensorType.STEREO):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        seq = os.path.join(base_path, sequence, "mav0")
        self.left = sorted(glob.glob(os.path.join(seq, "cam0", "data", "*.png")))
        self.right = sorted(glob.glob(os.path.join(seq, "cam1", "data", "*.png")))
        self.num_frames = len(self.left)
        self.timestamps = np.array(
            [float(os.path.splitext(os.path.basename(p))[0]) * 1e-9 for p in self.left]
        )
        self.fps = 20.0

    def getImage(self, i):
        return _imread_gray(self.left[i])

    def getImageRight(self, i):
        if self.sensor_type == SensorType.STEREO and i < len(self.right):
            return _imread_gray(self.right[i])
        return None

    def getTimestamp(self, i):
        return float(self.timestamps[i])


class IclNuimDataset(TumDataset):
    """ICL-NUIM in TUM-compatible layout (reference treats it the same)."""

    def __init__(self, base_path, sequence, **kw):
        super().__init__(base_path, sequence, **kw)
        self.depth_factor = 5000.0


class FolderDataset(DatasetBase):
    """Glob a folder of images (reference FolderDataset)."""

    def __init__(self, path: str, pattern: str = "*.png", fps: float = 30.0,
                 sensor_type=SensorType.MONOCULAR):
        self.sensor_type = sensor_type
        self.files = sorted(glob.glob(os.path.join(path, pattern)))
        self.num_frames = len(self.files)
        self.fps = fps

    def getImage(self, i):
        return _imread_gray(self.files[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.files[i]) if i < self.num_frames else None


class VideoDataset(DatasetBase):
    """Video file via imageio/ffmpeg when available (reference VideoDataset)."""

    def __init__(self, path: str, fps: float = 30.0, sensor_type=SensorType.MONOCULAR):
        self.sensor_type = sensor_type
        self.fps = fps
        try:
            import imageio.v3 as iio

            self._frames = iio.imread(path)  # (T,H,W,3)
            self.num_frames = len(self._frames)
        except Exception as e:  # pragma: no cover - environment dependent
            raise RuntimeError(f"video decoding unavailable: {e}")

    def getImage(self, i):
        f = self._frames[i]
        return (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).astype(
            np.float32
        )


class ReplicaDataset(DatasetBase):
    """Replica (NICE-SLAM export layout): ``results/frameNNNNNN.jpg`` +
    ``results/depthNNNNNN.png`` (depth factor 6553.5), ``traj.txt`` GT poses
    (reference ReplicaDataset, pySLAM ``io/dataset.py``)."""

    def __init__(self, base_path: str, sequence: str = "",
                 sensor_type=SensorType.RGBD, depth_factor: float = 6553.5):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        root = os.path.join(base_path, sequence) if sequence else base_path
        res = os.path.join(root, "results")
        self.rgb = sorted(
            glob.glob(os.path.join(res, "frame*.jpg"))
            + glob.glob(os.path.join(res, "frame*.png"))
        )
        self.depth = sorted(glob.glob(os.path.join(res, "depth*.png")))
        self.num_frames = len(self.rgb)
        self.depth_factor = depth_factor
        self.fps = 30.0

    def getImage(self, i):
        return _imread_gray(self.rgb[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.rgb[i]) if i < self.num_frames else None

    def getDepth(self, i):
        if self.sensor_type == SensorType.RGBD and i < len(self.depth):
            return _imread_depth_png(self.depth[i], self.depth_factor)
        return None


class TartanAirDataset(DatasetBase):
    """TartanAir: ``image_left/NNNNNN_left.png`` (+ ``image_right``),
    ``depth_left/NNNNNN_left_depth.npy`` (metric float32), ``pose_left.txt``
    (reference TartanAir handling in pySLAM's dataset factory)."""

    def __init__(self, base_path: str, sequence: str = "",
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.OUTDOOR
        root = os.path.join(base_path, sequence) if sequence else base_path
        self.left = sorted(glob.glob(os.path.join(root, "image_left", "*.png")))
        self.right = sorted(glob.glob(os.path.join(root, "image_right", "*.png")))
        self.depths = sorted(glob.glob(os.path.join(root, "depth_left", "*.npy")))
        self.num_frames = len(self.left)
        self.fps = 10.0

    def getImage(self, i):
        return _imread_gray(self.left[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.left[i]) if i < self.num_frames else None

    def getImageRight(self, i):
        if self.sensor_type == SensorType.STEREO and i < len(self.right):
            return _imread_gray(self.right[i])
        return None

    def getDepth(self, i):
        if self.sensor_type == SensorType.RGBD and i < len(self.depths):
            return np.load(self.depths[i]).astype(np.float32)
        return None


class ScanNetDataset(DatasetBase):
    """ScanNet (exported): ``color/N.jpg`` + ``depth/N.png`` in millimeters
    (factor 1000); frames indexed by integer filename."""

    def __init__(self, base_path: str, sequence: str = "",
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        root = os.path.join(base_path, sequence) if sequence else base_path

        def by_index(paths):
            return sorted(
                paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0])
            )

        self.rgb = by_index(
            glob.glob(os.path.join(root, "color", "*.jpg"))
            + glob.glob(os.path.join(root, "color", "*.png"))
        )
        self.depth = by_index(glob.glob(os.path.join(root, "depth", "*.png")))
        self.num_frames = len(self.rgb)
        self.depth_factor = 1000.0
        self.fps = 30.0

    def getImage(self, i):
        return _imread_gray(self.rgb[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.rgb[i]) if i < self.num_frames else None

    def getDepth(self, i):
        if self.sensor_type == SensorType.RGBD and i < len(self.depth):
            return _imread_depth_png(self.depth[i], self.depth_factor)
        return None


class SevenScenesDataset(DatasetBase):
    """7-Scenes: ``seq-XX/frame-NNNNNN.color.png`` + ``.depth.png``
    (millimeters; 65535 = invalid -> 0)."""

    def __init__(self, base_path: str, sequence: str = "seq-01",
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        root = os.path.join(base_path, sequence)
        self.rgb = sorted(glob.glob(os.path.join(root, "frame-*.color.png")))
        self.depth = sorted(glob.glob(os.path.join(root, "frame-*.depth.png")))
        self.num_frames = len(self.rgb)
        self.depth_factor = 1000.0
        self.fps = 30.0

    def getImage(self, i):
        return _imread_gray(self.rgb[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.rgb[i]) if i < self.num_frames else None

    def getDepth(self, i):
        if self.sensor_type == SensorType.RGBD and i < len(self.depth):
            d = _imread_depth_png(self.depth[i], self.depth_factor)
            return np.where(d >= 65.0, 0.0, d).astype(np.float32)
        return None


class NeuralRgbdDataset(DatasetBase):
    """Neural-RGBD: ``images/imgNNNN.png`` + ``depth/depthNNNN.png``
    (millimeters), optional ``poses.txt``."""

    def __init__(self, base_path: str, sequence: str = "",
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        root = os.path.join(base_path, sequence) if sequence else base_path
        self.rgb = sorted(glob.glob(os.path.join(root, "images", "img*.png")))
        self.depth = sorted(glob.glob(os.path.join(root, "depth", "depth*.png")))
        self.num_frames = len(self.rgb)
        self.depth_factor = 1000.0
        self.fps = 30.0

    def getImage(self, i):
        return _imread_gray(self.rgb[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.rgb[i]) if i < self.num_frames else None

    def getDepth(self, i):
        if self.sensor_type == SensorType.RGBD and i < len(self.depth):
            return _imread_depth_png(self.depth[i], self.depth_factor)
        return None


class LiveDataset(DatasetBase):
    """Live camera via OpenCV (reference LiveDataset). Frames are pulled on
    demand; ``num_frames`` is a soft cap for the main loop."""

    def __init__(self, camera_id: int = 0, num_frames: int = 10 ** 9,
                 fps: float = 30.0, sensor_type=SensorType.MONOCULAR):
        import cv2

        self.sensor_type = sensor_type
        self.cap = cv2.VideoCapture(camera_id)
        if not self.cap.isOpened():
            raise RuntimeError(f"cannot open camera {camera_id}")
        self.num_frames = num_frames
        self.fps = fps
        self._last = None

    def getImage(self, i):
        ok, frame = self.cap.read()
        if not ok:
            return None
        self._last = frame
        return (
            0.299 * frame[..., 2] + 0.587 * frame[..., 1] + 0.114 * frame[..., 0]
        ).astype(np.float32)

    def getImageColor(self, i):
        return self._last[..., ::-1] if self._last is not None else None

    def isOk(self):
        return self.cap.isOpened()


@dataclass
class SyntheticWorld:
    """Deterministic 3D blob world + camera trajectory for hermetic tests."""

    n_points: int = 3000
    extent: float = 30.0
    depth_range: tuple = (4.0, 40.0)
    seed: int = 7
    textured: bool = False   # per-blob sinusoid texture (see __post_init__)
    points: np.ndarray = field(init=False)
    intensities: np.ndarray = field(init=False)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        # Surface-dominated world: a box room (4 walls + floor + ceiling at
        # +-extent) textured with blobs, plus a sparse interior set for
        # close-range stereo parallax.  A purely volumetric cloud has severe
        # occlusion churn — every small viewpoint change flips z-buffer
        # winners, which destroys feature matchability across >2-3 frames
        # (measured 450 points -> 18 matches at 7 frames apart).
        e = self.extent
        h = e * 0.15
        n_wall = int(self.n_points * 0.8)
        n_int = self.n_points - n_wall
        u = rng.uniform(-e, e, (n_wall, 1))
        v = rng.uniform(-h, h, (n_wall, 1))
        face = rng.integers(0, 6, n_wall)
        pts = np.zeros((n_wall, 3))
        # walls: x=+-e, z=+-e + floor/ceiling y=+-h (z offset so trajectories
        # centered near z in [0, 2e*0.4] stay inside)
        zc = e * 0.4
        for i in range(n_wall):
            if face[i] == 0:
                pts[i] = [e, v[i, 0], u[i, 0] + zc]
            elif face[i] == 1:
                pts[i] = [-e, v[i, 0], u[i, 0] + zc]
            elif face[i] == 2:
                pts[i] = [u[i, 0], v[i, 0], e + zc]
            elif face[i] == 3:
                pts[i] = [u[i, 0], v[i, 0], -e + zc]
            elif face[i] == 4:
                pts[i] = [u[i, 0], h, rng.uniform(-e, e) + zc]
            else:
                pts[i] = [u[i, 0], -h, rng.uniform(-e, e) + zc]
        interior = np.stack(
            [
                rng.uniform(-e * 0.8, e * 0.8, n_int),
                rng.uniform(-h, h, n_int),
                rng.uniform(-e * 0.8, e * 0.8, n_int) + zc,
            ],
            axis=1,
        )
        self.points = np.concatenate([pts, interior], axis=0)
        self.intensities = rng.uniform(80, 255, self.n_points).astype(np.float32)
        self.radii = rng.uniform(1.5, 4.0, self.n_points).astype(np.float32)
        # per-blob intensity gradient: uniform-intensity blobs make every
        # corner look identical and break ratio-test matching
        self.gradients = rng.uniform(-6.0, 6.0, (self.n_points, 2)).astype(np.float32)
        if self.textured:
            # per-blob pseudo-random sinusoid texture: descriptor-DISTINCTIVE
            # interiors (a linear gradient alone leaves BRIEF patterns of
            # different blobs near-identical, which aliases loop-closure
            # guided matching into ~100% false correspondences on revisits)
            self.tex_freq = rng.uniform(0.3, 0.9, (self.n_points, 2)).astype(
                np.float32)
            self.tex_phase = rng.uniform(0, 2 * np.pi, (self.n_points, 2)).astype(
                np.float32)
            self.tex_amp = rng.uniform(15.0, 35.0, self.n_points).astype(
                np.float32)


class SyntheticDataset(DatasetBase):
    """Renders the blob world along a smooth trajectory with exact GT.

    Rendering: project world points, splat square blobs of per-point constant
    intensity (nearest wins by depth).  Produces FAST-trackable corners at
    blob corners, stereo pair via a horizontal baseline, and dense depth maps
    — enough to drive the full mono/stereo/RGBD SLAM stack hermetically.
    """

    def __init__(
        self,
        num_frames: int = 60,
        h: int = 240,
        w: int = 320,
        fx: float = 200.0,
        baseline: float = 0.2,
        trajectory: str = "arc",
        sensor_type=SensorType.STEREO,
        world: SyntheticWorld | None = None,
        step: float = 0.25,
        period: int | None = None,
        textured: bool = False,
    ):
        self.sensor_type = sensor_type
        self.num_frames = num_frames
        self.h, self.w = h, w
        self.fx = self.fy = fx
        self.cx, self.cy = w / 2.0, h / 2.0
        self.baseline = baseline
        self.fps = 10.0
        self.world = world or SyntheticWorld(textured=textured)
        self.step = step
        self.trajectory = trajectory
        # for "loop": revolution period in frames (default num_frames); with
        # period < num_frames the tail frames exactly revisit the start poses
        self.period = period or num_frames
        self.poses = self._make_trajectory()  # (T,4,4) Twc (camera->world)

    def _make_trajectory(self):
        poses = []
        for i in range(self.num_frames):
            if self.trajectory == "line":
                t = np.array([0.0, 0.0, i * self.step])
                yaw = 0.0
            elif self.trajectory == "arc":
                th = 0.004 * i * i * 0.1 + 0.01 * i
                radius = 60.0
                t = np.array(
                    [radius * (1 - np.cos(th * 0.3)), 0.0, radius * np.sin(th * 0.3)]
                )
                yaw = th * 0.3
            elif self.trajectory == "loop":
                th = 2 * np.pi * i / self.period
                radius = 12.0
                t = np.array([radius * np.sin(th), 0.0, radius * (1 - np.cos(th))])
                yaw = th
            else:
                raise ValueError(self.trajectory)
            c, s = np.cos(yaw), np.sin(yaw)
            Rwc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            T = np.eye(4)
            T[:3, :3] = Rwc
            T[:3, 3] = t
            poses.append(T)
        return np.stack(poses)

    @property
    def K(self):
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], np.float64
        )

    def groundtruth_Twc(self, i):
        return self.poses[i]

    def _render(self, Tcw):
        w_pts = self.world.points
        pc = (Tcw[:3, :3] @ w_pts.T).T + Tcw[:3, 3]
        z = pc[:, 2]
        vis = z > 2.0  # near clip: a too-close blob would cover the frame
        u = self.fx * pc[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fy * pc[:, 1] / np.where(vis, z, 1.0) + self.cy
        img = np.full((self.h, self.w), 30.0, np.float32)
        zbuf = np.full((self.h, self.w), np.inf, np.float32)
        order = np.argsort(-z)  # far to near: near overwrites
        for idx in order:
            if not vis[idx]:
                continue
            r = int(np.clip(round(self.world.radii[idx] * self.fx / (z[idx] * 5.0)), 1, 14))
            x0, y0 = int(round(u[idx])), int(round(v[idx]))
            if x0 + r < 0 or x0 - r >= self.w or y0 + r < 0 or y0 - r >= self.h:
                continue
            xa, xb = max(x0 - r, 0), min(x0 + r + 1, self.w)
            ya, yb = max(y0 - r, 0), min(y0 + r + 1, self.h)
            patch_z = zbuf[ya:yb, xa:xb]
            mask = patch_z > z[idx]
            gx, gy = self.world.gradients[idx]
            yy, xx = np.mgrid[ya - y0 : yb - y0, xa - x0 : xb - x0]
            vals = self.world.intensities[idx] + gx * xx + gy * yy
            if self.world.textured:
                fxt, fyt = self.world.tex_freq[idx]
                pxt, pyt = self.world.tex_phase[idx]
                vals = vals + self.world.tex_amp[idx] * (
                    np.sin(fxt * xx + pxt) * np.sin(fyt * yy + pyt)
                )
            vals = np.clip(vals, 40.0, 255.0).astype(np.float32)
            img[ya:yb, xa:xb][mask] = vals[mask]
            patch_z[mask] = z[idx]
        return img, zbuf

    def _Tcw(self, i, right=False):
        Twc = self.poses[i].copy()
        if right:
            Twc[:3, 3] += Twc[:3, :3] @ np.array([self.baseline, 0, 0])
        Tcw = np.eye(4)
        Tcw[:3, :3] = Twc[:3, :3].T
        Tcw[:3, 3] = -Twc[:3, :3].T @ Twc[:3, 3]
        return Tcw

    def getImage(self, i):
        img, _ = self._render(self._Tcw(i))
        return img

    def getImageRight(self, i):
        if self.sensor_type != SensorType.STEREO:
            return None
        img, _ = self._render(self._Tcw(i, right=True))
        return img

    def getDepth(self, i):
        if self.sensor_type != SensorType.RGBD:
            return None
        _, zbuf = self._render(self._Tcw(i))
        depth = np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)
        return depth

    def getTimestamp(self, i):
        return i / self.fps


class ClioDataset(DatasetBase):
    """CLIO (MIT task-driven mapping): ``images/rgb_<id>.jpg`` +
    ``depth/depth_<id>.png``, frame ids from filenames, synthetic
    timestamps at the measured ~7.5 Hz playback rate (reference
    ``dataset.py ClioDataset``)."""

    def __init__(self, base_path: str, sequence: str = "",
                 sensor_type=SensorType.RGBD, fps: float = 7.5):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.INDOOR
        self.depth_factor = 1000.0
        base = os.path.join(base_path, sequence) if sequence else base_path
        self.images_dir = os.path.join(base, "images")
        self.depth_dir = os.path.join(base, "depth")

        def fid(path, prefix):
            return int(os.path.basename(path).replace(prefix, "")
                       .split(".")[0])

        self.rgb = sorted(glob.glob(os.path.join(self.images_dir, "rgb_*.jpg")),
                          key=lambda p: fid(p, "rgb_"))
        self.frame_ids = [fid(p, "rgb_") for p in self.rgb]
        if sensor_type == SensorType.RGBD and not os.path.isdir(self.depth_dir):
            self.sensor_type = SensorType.MONOCULAR
        self.num_frames = len(self.rgb)
        self.fps = fps
        self.Ts = 1.0 / fps

    def getImage(self, i):
        return _imread_gray(self.rgb[i]) if i < self.num_frames else None

    def getImageColor(self, i):
        return _imread_color(self.rgb[i]) if i < self.num_frames else None

    def getDepth(self, i):
        if self.sensor_type != SensorType.RGBD or i >= self.num_frames:
            return None
        path = os.path.join(self.depth_dir, f"depth_{self.frame_ids[i]}.png")
        if not os.path.isfile(path):
            return None
        return _imread_depth_png(path, self.depth_factor)

    def getTimestamp(self, i):
        return float(i * self.Ts)


class RoverDataset(DatasetBase):
    """ROVER (outdoor robot benchmark): per-camera directory with a
    TUM-style associations file ``<timestamp> <rgb path> [<ts> <depth
    path>]`` (reference ``dataset.py RoverDataset``)."""

    def __init__(self, base_path: str, sequence: str,
                 camera_name: str = "realsense_d435i",
                 associations: str = "associations.txt",
                 sensor_type=SensorType.RGBD):
        self.sensor_type = sensor_type
        self.environment_type = DatasetEnvironmentType.OUTDOOR
        self.depth_factor = 1000.0
        self.base_dir = os.path.join(base_path, sequence, camera_name)
        self.rows = []
        with open(os.path.join(self.base_dir, associations)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                self.rows.append(line.split())
        self.num_frames = len(self.rows)
        self.fps = 30.0

    def getImage(self, i):
        if i >= self.num_frames:
            return None
        return _imread_gray(os.path.join(self.base_dir, self.rows[i][1]))

    def getImageColor(self, i):
        if i >= self.num_frames:
            return None
        return _imread_color(os.path.join(self.base_dir, self.rows[i][1]))

    def getDepth(self, i):
        if (self.sensor_type != SensorType.RGBD or i >= self.num_frames
                or len(self.rows[i]) < 4):
            return None
        return _imread_depth_png(
            os.path.join(self.base_dir, self.rows[i][3]), self.depth_factor)

    def getTimestamp(self, i):
        return float(self.rows[i][0])
