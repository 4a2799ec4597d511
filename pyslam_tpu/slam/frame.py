"""Frame and KeyFrame: per-image SoA containers.

Design departure from the reference (pySLAM ``pyslam/slam/frame.py:98-561``,
``keyframe.py``): where pySLAM builds per-keypoint Python object graphs
(``Frame.points[]`` lists of MapPoint objects), here a frame is a bundle of
fixed-shape numpy/JAX arrays — keypoints, descriptors (unpacked bit-planes),
stereo coords, and an int array ``points`` mapping each keypoint slot to a
global map-point id (-1 = unassigned).  All hot work (stereo matching, RGBD
virtual-stereo, projection matching) happens on-device via the jitted ops.

KeyFrame extends Frame with covisibility bookkeeping (host dicts — graph
mutation is host work; only the numeric payloads go to device).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.features.orb2 import FeatureData
from pyslam_tpu.ops import matching
from pyslam_tpu.slam.camera import PinholeCamera


class Frame:
    _id_counter = 0

    def __init__(
        self,
        camera: PinholeCamera,
        img=None,
        img_right=None,
        depth=None,
        timestamp: float = 0.0,
        feature_tracker=None,
        frame_id: int | None = None,
        features: FeatureData | None = None,
        defer_features: bool = False,
    ):
        if frame_id is None:
            self.id = Frame._id_counter
            Frame._id_counter += 1
        else:
            self.id = frame_id
        self.camera = camera
        self.timestamp = timestamp
        self.Tcw = np.eye(4)  # world -> camera

        self.is_keyframe = False
        self.feature_tracker = feature_tracker

        # 64x64 average-pooled thumbnail (16 KB): retained for appearance-
        # based place recognition (SAD global descriptor) without holding the
        # full frame in the map
        self.img_thumb = None
        self.img_vpr = None
        if img is not None:
            a = np.asarray(img, np.float32)
            if a.ndim == 3:
                a = a.mean(axis=2)
            h, w = a.shape
            ph, pw = max(h // 64, 1), max(w // 64, 1)
            gh, gw = h // ph, w // pw
            self.img_thumb = (
                a[: gh * ph, : gw * pw].reshape(gh, ph, gw, pw).mean(axis=(1, 3))
            )
            if Parameters.kRetainImageForVPR:
                # half-res uint8 copy for learned place recognition backends
                self.img_vpr = a[::2, ::2].astype(np.uint8)

        stereo_ur = stereo_depth = None
        self._des_dev = None   # device descriptor handle (fused stereo path)
        self._meta_dev = None  # device per-kp meta handle (deferred mode)
        self._des_np = None    # host descriptor block (lazy, see des property)
        self._dev_cache = {}   # device-resident per-frame arrays (see dev())
        if features is None and img is not None and feature_tracker is not None:
            extractor = getattr(feature_tracker, "extractor", None)
            if (img_right is not None and camera is not None
                    and not camera.is_distorted
                    and hasattr(extractor, "extract_stereo")):
                # fused path: left+right extraction + row match in ONE
                # dispatch (orb2._extract_stereo_jit)
                max_disp = (camera.bf / max(Parameters.kMinDepth, 1e-3)
                            if camera.bf > 0 else 100.0)
                if defer_features:
                    # pipelined frame loop: dispatch only — host per-kp
                    # fields are harvested later via ensure_host(), AFTER
                    # the tracking step for this frame is already in flight
                    (self._meta_dev,
                     self._des_dev) = extractor.extract_stereo_deferred(
                        img, img_right, bf=camera.bf, max_disp=max_disp,
                        max_distance=(
                            Parameters.kStereoMatchingMaxDescriptorDistance),
                        row_tol=Parameters.kStereoMatchingRowTolerance)
                    self._init_deferred(extractor.num_features)
                    return
                (features, stereo_ur, stereo_depth,
                 self._des_dev) = extractor.extract_stereo(
                    img, img_right, bf=camera.bf, max_disp=max_disp,
                    max_distance=(
                        Parameters.kStereoMatchingMaxDescriptorDistance),
                    row_tol=Parameters.kStereoMatchingRowTolerance)
            else:
                features = feature_tracker.detectAndCompute(img)

        if features is not None:
            # ONE packed readback for all small per-keypoint fields; the
            # descriptor block (the big payload) stays on device until a
            # host consumer actually needs it — the fused tracking path
            # never does, so non-keyframe frames skip that transfer entirely
            from pyslam_tpu.features.orb2 import featuredata_to_numpy

            features = featuredata_to_numpy(features, materialize_desc=False)
            # undistort once at construction (reference frame.py:534-537)
            xy = np.asarray(features.xy, np.float32)
            if camera.is_distorted:
                xy = np.asarray(camera.undistort_points(xy), np.float32)
            self.kps = xy                                      # undistorted px
            self.kps_raw = np.asarray(features.xy, np.float32)  # distorted px
            self.levels = np.asarray(features.level, np.int32)
            self.angles = np.asarray(features.angle, np.float32)
            self.sizes = np.asarray(features.size, np.float32)
            # keep native dtype: int8 unpacked bits (Hamming) or float32
            # (learned/SIFT descriptors, L2) — matchers dispatch on dtype
            if isinstance(features.desc, np.ndarray):
                self._des_np = features.desc
            elif self._des_dev is None:
                self._des_dev = features.desc
            self.valid = np.asarray(features.valid, bool)
        else:
            n = Parameters.kNumFeatures
            self.kps = np.zeros((n, 2), np.float32)
            self.kps_raw = np.zeros((n, 2), np.float32)
            self.levels = np.zeros((n,), np.int32)
            self.angles = np.zeros((n,), np.float32)
            self.sizes = np.zeros((n,), np.float32)
            self._des_np = np.zeros((n, 256), np.int8)
            self.valid = np.zeros((n,), bool)

        n = len(self.kps)
        self.num_kps = n
        # map-point assignment & outliers
        self.points = np.full((n,), -1, np.int64)
        self.outliers = np.zeros((n,), bool)
        # stereo
        self.kps_ur = np.full((n,), -1.0, np.float32)  # right-image u (-1 = mono)
        self.depths = np.full((n,), -1.0, np.float32)

        if stereo_ur is not None:
            self.kps_ur = stereo_ur.astype(np.float32)
            self.depths = stereo_depth.astype(np.float32)
        elif img_right is not None and feature_tracker is not None:
            self.compute_stereo_matches(img_right)
        elif depth is not None:
            self.compute_stereo_from_rgbd(depth)

    # ----------------------------------------------------- deferred harvest
    def _init_deferred(self, n: int):
        """Allocate the always-host fields; per-kp feature fields stay on
        device until ensure_host()."""
        self.num_kps = n
        self.points = np.full((n,), -1, np.int64)
        self.outliers = np.zeros((n,), bool)
        self.kps = None
        self.kps_raw = None
        self.levels = None
        self.angles = None
        self.sizes = None
        self.valid = None
        self.kps_ur = None
        self.depths = None

    @property
    def host_ready(self) -> bool:
        return getattr(self, "kps", None) is not None

    def ensure_host(self):
        """Harvest the deferred extraction meta into host fields (one
        (N,9)-f32 transfer); no-op when already materialized.  ``meta`` may
        also be provided pre-fetched by the fused tracking step's packed
        readback via ``adopt_meta``."""
        if self.host_ready or getattr(self, "_meta_dev", None) is None:
            return
        self.adopt_meta(np.asarray(self._meta_dev))

    def adopt_meta(self, meta: np.ndarray):
        """Populate host per-kp fields from a packed meta block
        (x y level angle size resp valid ur depth — orb2 stereo layout)."""
        if self.kps is not None:
            return
        meta = np.asarray(meta, np.float32)
        self.kps = np.ascontiguousarray(meta[:, 0:2])
        self.kps_raw = self.kps          # deferred mode requires undistorted
        self.levels = meta[:, 2].astype(np.int32)
        self.angles = meta[:, 3].copy()
        self.sizes = meta[:, 4].copy()
        self.valid = meta[:, 6] > 0.5
        self.kps_ur = meta[:, 7].copy()
        self.depths = meta[:, 8].copy()
        self._meta_dev = None            # drop the device handle

    # --------------------------------------------------------- descriptors
    @property
    def des(self) -> np.ndarray:
        """Host descriptor block, materialized from the device handle on
        first access (non-keyframe frames on the fused path never pay the
        ~N*D-byte tunnel transfer)."""
        if self._des_np is None:
            self._des_np = np.asarray(self._des_dev)
        return self._des_np

    @des.setter
    def des(self, value):
        self._des_np = np.asarray(value)

    @property
    def des_on_host(self) -> bool:
        return self._des_np is not None

    def dev(self, name: str):
        """Device-resident copy of an IMMUTABLE per-frame array (``kps``,
        ``levels``, ``des``, ``kps_ur``, ``valid``), cached after the first
        upload.  The batched back-end dispatches (triangulation / fuse) feed
        neighbor keyframes through these handles so the big per-KF payloads
        (the ~N*D-byte descriptor block above all) cross the tunnel at most
        once per keyframe instead of once per covisible USE — on a
        remote-attached TPU the re-uploads, not the matching compute, were
        the dominant back-end cost.  Mutable fields (points / outliers /
        pose) must NOT go through this cache."""
        cache = getattr(self, "_dev_cache", None)
        if cache is None:
            cache = self._dev_cache = {}
        h = cache.get(name)
        if h is None:
            if name == "des" and getattr(self, "_des_dev", None) is not None:
                h = self._des_dev
            else:
                h = jnp.asarray(getattr(self, name))
            cache[name] = h
        return h

    def drop_device_cache(self):
        """Free the cached device arrays (called when a keyframe is culled
        so HBM usage tracks the LIVE keyframe set)."""
        self._dev_cache = {}
        self._des_dev = None

    # ---------------------------------------------------------------- pose
    @property
    def Twc(self) -> np.ndarray:
        return np.linalg.inv(self.Tcw)

    @property
    def Rcw(self):
        return self.Tcw[:3, :3]

    @property
    def tcw(self):
        return self.Tcw[:3, 3]

    @property
    def Ow(self) -> np.ndarray:
        """Camera center in world coords."""
        return -self.Tcw[:3, :3].T @ self.Tcw[:3, 3]

    def update_pose(self, Tcw):
        self.Tcw = np.asarray(Tcw, np.float64).reshape(4, 4)

    # -------------------------------------------------------------- stereo
    def compute_stereo_matches(self, img_right):
        """Row-constrained stereo matching (reference ``frame.py:1122``):
        extract right-image features, match along scanlines with descriptor +
        disparity gates, store per-left-kp right-u and depth."""
        fr = self.feature_tracker.detectAndCompute(img_right)
        cam = self.camera
        des_r = fr.desc
        xy_r = np.asarray(fr.xy, np.float32)
        d = self.feature_tracker.matcher.distance_matrix(
            jnp.asarray(self.des), des_r
        )
        disp = self.kps[:, 0:1] - xy_r[None, :, 0]
        max_disp = cam.bf / max(Parameters.kMinDepth, 1e-3) if cam.bf > 0 else 100.0
        idx, dist = matching.row_stereo_match(
            d,
            jnp.asarray(self.kps[:, 1]),
            jnp.asarray(xy_r[:, 1]),
            jnp.asarray(disp),
            max_distance=Parameters.kStereoMatchingMaxDescriptorDistance,
            row_tol=Parameters.kStereoMatchingRowTolerance,
            min_disp=0.1,
            max_disp=max_disp,
            valid_a=jnp.asarray(self.valid),
            valid_b=fr.valid,
        )
        idx = np.asarray(idx)
        ok = idx >= 0
        ur = np.where(ok, xy_r[np.clip(idx, 0, None), 0], -1.0)
        self.kps_ur = ur.astype(np.float32)
        disp_sel = np.where(ok, self.kps[:, 0] - ur, -1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            depth = np.where(disp_sel > 0, cam.bf / np.maximum(disp_sel, 1e-6), -1.0)
        self.depths = depth.astype(np.float32)
        self._dev_cache.pop("kps_ur", None)   # invalidate cached device copy

    def compute_stereo_from_rgbd(self, depth_img):
        """RGBD -> virtual right coords (reference ``frame.py:1098``)."""
        cam = self.camera
        h, w = depth_img.shape[:2]
        xs = np.clip(np.round(self.kps_raw[:, 0]).astype(int), 0, w - 1)
        ys = np.clip(np.round(self.kps_raw[:, 1]).astype(int), 0, h - 1)
        z = np.asarray(depth_img)[ys, xs].astype(np.float32)
        if cam.depth_factor != 1.0 and z.dtype != np.float32:
            z = z / cam.depth_factor
        ok = (z > Parameters.kMinDepth) & self.valid
        self.depths = np.where(ok, z, -1.0).astype(np.float32)
        if cam.bf > 0:
            self.kps_ur = np.where(
                ok, self.kps[:, 0] - cam.bf / np.maximum(z, 1e-6), -1.0
            ).astype(np.float32)
        self._dev_cache.pop("kps_ur", None)   # invalidate cached device copy

    # ------------------------------------------------------------- helpers
    def unproject_keypoints(self, idxs=None) -> np.ndarray:
        """Backproject keypoints with valid depth to world coords."""
        if idxs is None:
            idxs = np.nonzero(self.depths > 0)[0]
        uv = self.kps[idxs]
        z = self.depths[idxs]
        pc = np.asarray(self.camera.backproject_points(uv, z))
        Twc = self.Twc
        return (Twc[:3, :3] @ pc.T).T + Twc[:3, 3], idxs

    def sigma2_for(self, idxs) -> np.ndarray:
        return self.feature_tracker.sigma2[self.levels[idxs]]

    def num_tracked_points(self, min_obs: int = 1) -> int:
        return int(((self.points >= 0) & ~self.outliers).sum())


class KeyFrame(Frame):
    """Frame + covisibility graph node (reference ``keyframe.py:46-633``).

    ``kid`` is assigned by ``Map.add_keyframe`` (per-map counter) so that
    concurrent ``Slam`` instances in one process cannot interleave kid
    sequences — kid deltas drive point-freshness and culling-age logic.
    """

    def __init__(self, frame: Frame, kid: int | None = None):
        # keyframes live in the map and feed host-side consumers (descriptor
        # refresh, loop closing, serialization): materialize the descriptor
        # block BEFORE dropping the device handle
        _ = frame.des
        # share arrays with the source frame (no copy)
        self.__dict__.update(frame.__dict__)
        # keep the fused-stereo device descriptor handle as the keyframe's
        # cached device descriptor block: the back-end re-reads it for every
        # covisible neighbor dispatch, and ~N*D bytes of HBM per live KF is
        # far cheaper than re-uploading it through the tunnel each use
        # (drop_device_cache() frees it when the KF is culled)
        self._dev_cache = dict(self.__dict__.get("_dev_cache") or {})
        if self.__dict__.get("_des_dev") is not None:
            self._dev_cache.setdefault("des", self._des_dev)
        self._des_dev = None
        self.kid = kid  # None until Map.add_keyframe assigns it
        self.is_keyframe = True
        self.is_bad = False
        # covisibility graph (host dicts)
        self.connected_keyframes: dict[int, int] = {}  # kid -> weight
        self.ordered_neighbors: list[int] = []
        self.parent: int | None = None
        self.children: set[int] = set()
        self.loop_edges: set[int] = set()
        self.not_to_erase = False
        self.g_des = None  # global descriptor (loop closing)
        self.lba_count = 0

    def ordered_covisibles(self, n: int | None = None) -> list[int]:
        if n is None:
            return list(self.ordered_neighbors)
        return self.ordered_neighbors[:n]

    def add_connection(self, kid: int, weight: int):
        self.connected_keyframes[kid] = weight
        self._reorder()

    def erase_connection(self, kid: int):
        if kid in self.connected_keyframes:
            del self.connected_keyframes[kid]
            self._reorder()

    def _reorder(self):
        self.ordered_neighbors = [
            k for k, _ in sorted(
                self.connected_keyframes.items(), key=lambda kv: -kv[1]
            )
        ]
