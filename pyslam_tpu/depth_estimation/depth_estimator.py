"""Depth estimator interface + factory.

Reference surface: pySLAM ``pyslam/depth_estimation/depth_estimator_factory.py
:87-195`` with types DEPTH_SGBM / DEPTH_ANYTHING_V2 / DEPTH_ANYTHING_V3 /
DEPTH_PRO / DEPTH_RAFT_STEREO / DEPTH_CRESTEREO / DEPTH_MAST3R and base
``DepthEstimator.infer(img, img_right) -> (depth, pts3d)``.

Backends:
- DEPTH_SGBM: the full JAX semi-global matcher (sgm.py), stereo.
- DEPTH_ANYTHING_V2: flax DPT-lite monocular network (XLA graph; converted
  checkpoint required for metric accuracy — zero-egress build).
- DEPTH_RAFT_STEREO: routed to the SGM backend until a converted checkpoint
  exists (same (depth, pts3d) contract).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.depth_estimation.sgm import sgm_disparity


class DepthEstimatorType(enum.Enum):
    DEPTH_SGBM = "sgbm"
    DEPTH_ANYTHING_V2 = "depth_anything_v2"
    DEPTH_ANYTHING_V3 = "depth_anything_v3"
    DEPTH_PRO = "depth_pro"
    DEPTH_RAFT_STEREO = "raft_stereo"
    DEPTH_CRESTEREO_PYTORCH = "crestereo"
    DEPTH_CRESTEREO_MEGENGINE = "crestereo_megengine"  # same native backend
    DEPTH_MAST3R = "mast3r"
    DEPTH_MVDUST3R = "mvdust3r"


class DepthEstimator:
    """Base interface (reference depth_estimator_base.py)."""

    def __init__(self, camera=None, min_depth=0.1, max_depth=50.0):
        self.camera = camera
        self.min_depth = min_depth
        self.max_depth = max_depth

    def infer(self, img, img_right=None):
        """Returns (depth (H,W) float32 with 0=invalid, pts3d or None)."""
        raise NotImplementedError

    def _depth_to_points(self, depth):
        if self.camera is None:
            return None
        h, w = depth.shape
        ys, xs = np.mgrid[0:h, 0:w]
        z = np.asarray(depth)
        ok = z > 0
        x = (xs - self.camera.cx) / self.camera.fx * z
        y = (ys - self.camera.cy) / self.camera.fy * z
        pts = np.stack([x, y, z], axis=-1)
        pts[~ok] = 0
        return pts


class DepthEstimatorSgbm(DepthEstimator):
    """Semi-global stereo matcher (reference DEPTH_SGBM over cv2.StereoSGBM).

    ``downscale=s`` runs the whole SGM at 1/s resolution with max_disp/s
    (the disparity of a given depth scales with fx, so the measurable depth
    range is UNCHANGED) and upsamples the resulting depth back to full
    resolution in-graph — ~s^3 less cost-volume work and s-times shorter
    scan chains, which matters because SGM's sequential scans are the
    worst-mapped stage on the TPU.  For volumetric integration at 0.1-0.2 m
    voxels, half-resolution depth is well inside the quantization error."""

    def __init__(self, camera=None, max_disparity: int = 64,
                 downscale: int = 1, **kw):
        super().__init__(camera, **kw)
        self.max_disparity = max_disparity
        self.downscale = max(1, int(downscale))

    def _disparity_full_scale(self, img, img_right):
        """Device disparity map at FULL resolution (disparity values in
        full-res pixel units), running SGM at 1/downscale internally."""
        import jax

        iml = jnp.asarray(img, jnp.float32)
        imr = jnp.asarray(img_right, jnp.float32)
        s = self.downscale
        if s > 1:
            h, w = iml.shape
            hs, ws = h // s, w // s
            # average-pool downsample (box filter == anti-aliased for s<=2)
            iml_s = iml[: hs * s, : ws * s].reshape(hs, s, ws, s).mean((1, 3))
            imr_s = imr[: hs * s, : ws * s].reshape(hs, s, ws, s).mean((1, 3))
            disp_s = sgm_disparity(iml_s, imr_s,
                                   max_disp=max(16, self.max_disparity // s))
            # upsample; invalid (-1) pixels stay invalid under nearest
            disp = jax.image.resize(disp_s, (hs * s, ws * s), "nearest")
            disp = jnp.pad(disp, ((0, h - hs * s), (0, w - ws * s)),
                           constant_values=-1.0)
            return jnp.where(disp > 0, disp * s, -1.0)
        return sgm_disparity(iml, imr, max_disp=self.max_disparity)

    def infer(self, img, img_right=None):
        assert img_right is not None, "SGBM needs a stereo pair"
        disp = np.asarray(self._disparity_full_scale(img, img_right))
        if self.camera is not None and self.camera.bf > 0:
            with np.errstate(divide="ignore"):
                depth = np.where(disp > 0, self.camera.bf / np.maximum(disp, 1e-6), 0.0)
            depth = np.where(
                (depth > self.min_depth) & (depth < self.max_depth), depth, 0.0
            ).astype(np.float32)
        else:
            depth = np.where(disp > 0, disp, 0.0).astype(np.float32)
        return depth, self._depth_to_points(depth)

    def infer_depth_device(self, img, img_right=None):
        """Depth map as a DEVICE array with no host synchronization — for
        consumers that feed it straight into another device stage (the TSDF
        integrator), keeping the whole SGM->TSDF keyframe path free of
        host<->device round trips."""
        assert img_right is not None, "SGBM needs a stereo pair"
        disp = self._disparity_full_scale(img, img_right)
        if self.camera is not None and self.camera.bf > 0:
            depth = jnp.where(disp > 0, self.camera.bf / jnp.maximum(disp, 1e-6), 0.0)
            depth = jnp.where(
                (depth > self.min_depth) & (depth < self.max_depth), depth, 0.0
            )
        else:
            depth = jnp.where(disp > 0, disp, 0.0)
        return depth.astype(jnp.float32)


class DepthEstimatorDepthAnything(DepthEstimator):
    """DepthAnythingV2 (faithful DINOv2+DPT, models/depth_anything_v2.py)
    when requested / a checkpoint is supplied; DPT-lite otherwise (smaller
    graph, useful without weights)."""

    def __init__(self, camera=None, checkpoint: str | None = None,
                 faithful: bool = True, **kw):
        super().__init__(camera, **kw)
        if faithful:
            from pyslam_tpu.models.depth_anything_v2 import DepthAnythingV2

            self.model = DepthAnythingV2(checkpoint=checkpoint)
        else:
            from pyslam_tpu.models.depth_anything import DepthAnythingInference

            self.model = DepthAnythingInference(checkpoint=checkpoint)

    def infer(self, img, img_right=None):
        rel = self.model.infer(img)
        # relative (affine-invariant) inverse depth -> metric-ish depth via
        # the configured max_depth scale (the reference calibrates per
        # dataset; without calibration we normalize to [0, max_depth])
        rel = rel / max(float(rel.max()), 1e-9)
        depth = np.where(rel > 1e-6, self.max_depth * (1.0 - rel), 0.0)
        return depth.astype(np.float32), self._depth_to_points(depth)


class DepthEstimatorDepthAnythingV3(DepthEstimator):
    """DEPTH_ANYTHING_V3: metric depth from the DA3 any-view model
    (models/depth_anything_v3.py; reference
    ``depth_estimator_depth_anything_v3.py``) run on a single view."""

    def __init__(self, camera=None, checkpoint: str | None = None, **kw):
        super().__init__(camera, **kw)
        from pyslam_tpu.models.depth_anything_v3 import DepthAnything3

        self.model = DepthAnything3(checkpoint=checkpoint)

    def infer(self, img, img_right=None):
        out = self.model.inference([img])
        d = out["depth"][0]
        h, w = np.asarray(img).shape[:2]
        mh, mw = d.shape
        ys = np.clip((np.arange(h) * mh / h).astype(int), 0, mh - 1)
        xs = np.clip((np.arange(w) * mw / w).astype(int), 0, mw - 1)
        depth = np.clip(d[np.ix_(ys, xs)], 0.0, self.max_depth)
        depth = depth.astype(np.float32)
        return depth, self._depth_to_points(depth)


class DepthEstimatorMVDust3r(DepthEstimator):
    """DEPTH_MVDUST3R: depth from the MV-DUSt3R local pointmap of view 0
    (models/mvdust3r.py; reference ``depth_estimator_mvdust3r.py``).
    Uses (img, img_right) as two views when a right image exists."""

    def __init__(self, camera=None, checkpoint: str | None = None, **kw):
        super().__init__(camera, **kw)
        from pyslam_tpu.models.mvdust3r import MVDust3rModel

        self.model = MVDust3rModel(checkpoint=checkpoint)

    def infer(self, img, img_right=None):
        views = [img] if img_right is None else [img, img_right]
        out = self.model.infer_views(views)
        d = out["local_points"][0][..., 2]
        h, w = np.asarray(img).shape[:2]
        mh, mw = d.shape
        ys = np.clip((np.arange(h) * mh / h).astype(int), 0, mh - 1)
        xs = np.clip((np.arange(w) * mw / w).astype(int), 0, mw - 1)
        depth = np.clip(d[np.ix_(ys, xs)], 0.0, self.max_depth)
        depth = depth.astype(np.float32)
        return depth, self._depth_to_points(depth)


class DepthEstimatorDepthPro(DepthEstimator):
    """DEPTH_PRO: metric depth from the DepthPro multi-scale ViT
    (models/depth_pro.py; reference ``depth_estimator_depth_pro.py``).
    Uses the calibrated camera focal when available, else the model's
    FOV-head estimate."""

    def __init__(self, camera=None, checkpoint: str | None = None,
                 cfg=None, **kw):
        super().__init__(camera, **kw)
        from pyslam_tpu.models.depth_pro import DepthPro

        self.model = DepthPro(cfg=cfg, checkpoint=checkpoint)

    def infer(self, img, img_right=None):
        f_px = self.camera.fx if self.camera is not None else None
        depth, _ = self.model.infer(img, f_px=f_px)
        depth = np.clip(depth, 0.0, self.max_depth).astype(np.float32)
        return depth, self._depth_to_points(depth)


class DepthEstimatorRaft(DepthEstimator):
    """RAFT-class recurrent stereo (models/raft_stereo.py)."""

    def __init__(self, camera=None, checkpoint: str | None = None, **kw):
        super().__init__(camera, **kw)
        from pyslam_tpu.models.raft_stereo import RaftStereo

        self.model = RaftStereo()
        if checkpoint:
            self.model._ensure_params((240, 320))
            self.model.load_checkpoint(checkpoint)

    def infer(self, img, img_right=None):
        assert img_right is not None, "stereo estimator needs a right image"
        disp = self.model.infer(img, img_right)
        bf = self.camera.bf if self.camera is not None else 50.0
        with np.errstate(divide="ignore"):
            depth = np.where(disp > 0.5, bf / np.maximum(disp, 1e-6), 0.0)
        depth = np.clip(depth, 0.0, self.max_depth).astype(np.float32)
        return depth, self._depth_to_points(depth)


class DepthEstimatorCREStereo(DepthEstimatorRaft):
    """CREStereo-class cascaded recurrent stereo (models/crestereo.py;
    reference ``depth_estimator_crestereo_pytorch.py`` /
    ``_megengine.py``)."""

    def __init__(self, camera=None, checkpoint: str | None = None, **kw):
        DepthEstimator.__init__(self, camera, **kw)
        from pyslam_tpu.models.crestereo import CREStereo

        self.model = CREStereo()
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.model._ensure_params((240, 320))
            self.model.params = load_variables_npz(
                checkpoint, self.model.params)


class DepthEstimatorMast3r(DepthEstimator):
    """DEPTH_MAST3R / DEPTH_MVDUST3R: metric depth from the view-1 pointmap
    of a MASt3R-class two-view network (reference
    ``depth_estimator_mast3r.py`` / ``depth_estimator_mvdust3r.py``).  With
    a right image the pair is (left, right); monocular input pairs the
    image with itself (the reference does the same for single-view use)."""

    def __init__(self, camera=None, checkpoint: str | None = None, **kw):
        super().__init__(camera, **kw)
        from pyslam_tpu.models.mast3r import Mast3rModel

        self.model = Mast3rModel(checkpoint=checkpoint)

    def infer(self, img, img_right=None):
        import numpy as np

        h, w = np.asarray(img).shape[:2]
        other = img_right if img_right is not None else img
        (pts1, conf1, _, _), _ = self.model.infer_pair(img, other)
        depth = np.asarray(pts1[..., 2], np.float32)
        # resize net-resolution depth back to the input size (nearest)
        ys = np.clip((np.arange(h) * depth.shape[0] / h).astype(int),
                     0, depth.shape[0] - 1)
        xs = np.clip((np.arange(w) * depth.shape[1] / w).astype(int),
                     0, depth.shape[1] - 1)
        depth = depth[np.ix_(ys, xs)]
        depth = np.clip(depth, 0.0, self.max_depth)
        return depth, self._depth_to_points(depth)


def depth_estimator_factory(
    depth_estimator_type=DepthEstimatorType.DEPTH_SGBM,
    camera=None,
    max_depth: float = 50.0,
    **kw,
) -> DepthEstimator:
    t = depth_estimator_type
    if isinstance(t, str):
        t = DepthEstimatorType(t.lower())
    if t in (DepthEstimatorType.DEPTH_RAFT_STEREO,
             DepthEstimatorType.DEPTH_CRESTEREO_PYTORCH,
             DepthEstimatorType.DEPTH_CRESTEREO_MEGENGINE):
        if kw.get("checkpoint"):
            cls = (DepthEstimatorCREStereo
                   if t != DepthEstimatorType.DEPTH_RAFT_STEREO
                   else DepthEstimatorRaft)
            return cls(camera, max_depth=max_depth, **kw)
        # no weights: the SGM path is the zero-weights production fallback
        kw.pop("checkpoint", None)
        return DepthEstimatorSgbm(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_SGBM:
        return DepthEstimatorSgbm(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_ANYTHING_V3:
        return DepthEstimatorDepthAnythingV3(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_PRO:
        return DepthEstimatorDepthPro(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_ANYTHING_V2:
        return DepthEstimatorDepthAnything(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_MVDUST3R:
        return DepthEstimatorMVDust3r(camera, max_depth=max_depth, **kw)
    if t == DepthEstimatorType.DEPTH_MAST3R:
        return DepthEstimatorMast3r(camera, max_depth=max_depth, **kw)
    raise NotImplementedError(f"depth estimator {t}")
