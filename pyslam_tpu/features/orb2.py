"""ORB2-class feature extractor: FAST-9 + grid NMS + rBRIEF over a pyramid.

The TPU-native equivalent of the reference's default feature engine — the
ORB-SLAM2 C++ extractor wrapped by pySLAM
(``pyslam/local_features/feature_orbslam2.py`` ->
``thirdparty/orbslam2_features/ORBextractor.cpp``).  The whole per-image
pipeline (pyramid, per-level FAST score, 3x3 NMS, per-cell top-k distribution,
per-level quotas, orientation, steered BRIEF) compiles into ONE jitted XLA
graph per image shape; output shapes are fixed at ``num_features`` slots with
a validity mask.

Per-level keypoint quotas follow the reference's geometric distribution over
pyramid levels (n_l proportional to (1/scale)^l).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.config_parameters import Parameters
from pyslam_tpu.ops import fast, image as image_ops, nms, orb


class FeatureData(NamedTuple):
    """Fixed-shape extraction result (level-0 / undistorted-image coords).

    xy:      (N, 2) float32 pixel coords at level-0 scale
    level:   (N,)   int32 pyramid level
    angle:   (N,)   float32 orientation in degrees [0, 360)
    size:    (N,)   float32 diameter (31 * scale^level)
    response:(N,)   float32 detector response
    desc:    (N, 256) int8 unpacked descriptor bits
    valid:   (N,)   bool
    """

    xy: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    size: jnp.ndarray
    response: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray


@jax.jit
def _pack_feature_meta(xy, level, angle, size, response, valid):
    """Pack the six small per-keypoint fields into ONE (N,7) f32 buffer so a
    host consumer needs 2 device readbacks (meta + desc) instead of 7 — on a
    remote-TPU tunnel each readback costs ~10 ms of RPC latency."""
    return jnp.concatenate(
        [
            xy.astype(jnp.float32),
            level.astype(jnp.float32)[:, None],
            angle.astype(jnp.float32)[:, None],
            size.astype(jnp.float32)[:, None],
            response.astype(jnp.float32)[:, None],
            valid.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


def featuredata_to_numpy(
    fd: FeatureData, materialize_desc: bool = True
) -> FeatureData:
    """Device FeatureData -> numpy FeatureData with exactly two transfers
    (one with ``materialize_desc=False``: the descriptor block — the largest
    payload, ~N*D bytes — stays a device handle for consumers that defer or
    skip the host copy, e.g. the fused tracking step)."""
    if isinstance(fd.xy, np.ndarray):
        return fd
    meta = np.asarray(
        _pack_feature_meta(fd.xy, fd.level, fd.angle, fd.size, fd.response, fd.valid)
    )
    return FeatureData(
        xy=np.ascontiguousarray(meta[:, 0:2]),
        level=meta[:, 2].astype(np.int32),
        angle=meta[:, 3].copy(),
        size=meta[:, 4].copy(),
        response=meta[:, 5].copy(),
        desc=np.asarray(fd.desc) if materialize_desc else fd.desc,
        valid=meta[:, 6] > 0.5,
    )


def level_quotas(num_features: int, num_levels: int, scale: float) -> list[int]:
    """Geometric per-level quota (sum == num_features)."""
    inv = 1.0 / scale
    weights = np.array([inv ** l for l in range(num_levels)])
    q = np.floor(num_features * weights / weights.sum()).astype(int)
    q[0] += num_features - q.sum()
    return [int(x) for x in q]


def level_sigma2(num_levels: int, scale: float) -> np.ndarray:
    """Per-level measurement variance (scale^2l), reference
    ``feature_manager.py:1023`` init_sigma_levels."""
    return np.array([scale ** (2 * l) for l in range(num_levels)], np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_features", "num_levels", "scale", "fast_th", "cell", "per_cell",
        "use_pallas",
    ),
)
def _extract_jit(
    img: jnp.ndarray,
    num_features: int,
    num_levels: int,
    scale: float,
    fast_th: float,
    cell: int,
    per_cell: int,
    use_pallas: bool = False,
):
    # cast on DEVICE: callers upload the image in its native dtype (uint8
    # frames cross the host->TPU tunnel at 1 byte/px instead of 4)
    img = img.astype(jnp.float32)
    quotas = level_quotas(num_features, num_levels, scale)
    pyr = image_ops.build_pyramid(img, num_levels, scale)

    outs = []
    for lv in range(num_levels):
        lv_img = pyr[lv]
        quota = quotas[lv]
        if quota == 0:
            continue
        if use_pallas:
            # fused FAST + 3x3 NMS in one VMEM pass (TPU only)
            from pyslam_tpu.ops import pallas_fast

            score = pallas_fast.fast_score_map_pallas(
                lv_img, fast_th, interpret=False
            )
        else:
            score = fast.fast_score_map(lv_img, fast_th)
            score = fast.nms3x3(score)
        xy, resp, valid = nms.grid_topk_keypoints(
            score, cell=cell, per_cell=per_cell, max_out=quota
        )
        blurred = image_ops.gaussian_blur(lv_img, sigma=2.0, radius=3)
        # ONE patch extraction feeds both orientation moments and descriptor
        # comparisons (patch-based path: 12x faster than per-element gathers)
        patches = orb.extract_patches(blurred, xy)
        angles = orb.angles_from_patches(patches)
        desc = orb.brief_from_patches(patches, orb.angle_bins(angles))

        s = scale ** lv
        outs.append(
            FeatureData(
                xy=xy * s,
                level=jnp.full((quota,), lv, jnp.int32),
                angle=jnp.degrees(angles) % 360.0,
                size=jnp.full((quota,), 31.0 * s, jnp.float32),
                response=resp.astype(jnp.float32),
                desc=desc,
                valid=valid,
            )
        )

    cat = FeatureData(*[jnp.concatenate([getattr(o, f) for o in outs], axis=0)
                        for f in FeatureData._fields])
    # quotas sum to num_features; assert static shape
    assert cat.xy.shape[0] == num_features
    return cat


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_features", "num_levels", "scale", "fast_th", "cell", "per_cell",
        "use_pallas", "max_distance", "row_tol",
    ),
)
def _extract_stereo_jit(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    bf: jnp.ndarray,
    max_disp: jnp.ndarray,
    num_features: int,
    num_levels: int,
    scale: float,
    fast_th: float,
    cell: int,
    per_cell: int,
    use_pallas: bool,
    max_distance: float,
    row_tol: float,
):
    """Left extract + right extract + row-constrained stereo match as ONE
    XLA graph (the whole stereo Frame construction in a single dispatch;
    reference frame.py runs the two extractions on threads and the row
    match in C++ — here the graph-level fusion replaces both).

    Returns (packed meta (N, 9: x y level angle size resp valid ur depth),
    desc (N, D))."""
    from pyslam_tpu.ops import hamming as hamming_ops
    from pyslam_tpu.ops import matching as matching_ops

    fl = _extract_jit(img_l, num_features, num_levels, scale, fast_th,
                      cell, per_cell, use_pallas)
    fr = _extract_jit(img_r, num_features, num_levels, scale, fast_th,
                      cell, per_cell, use_pallas)
    d = hamming_ops.hamming_distance_matrix(fl.desc, fr.desc).astype(
        jnp.float32)
    disp = fl.xy[:, 0:1] - fr.xy[None, :, 0]
    idx, _dist = matching_ops.row_stereo_match(
        d, fl.xy[:, 1], fr.xy[:, 1], disp,
        max_distance=max_distance, row_tol=row_tol,
        min_disp=0.1, max_disp=max_disp,
        valid_a=fl.valid, valid_b=fr.valid,
    )
    ok = idx >= 0
    ur = jnp.where(ok, fr.xy[jnp.clip(idx, 0), 0], -1.0)
    dsel = jnp.where(ok, fl.xy[:, 0] - ur, -1.0)
    depth = jnp.where(dsel > 0, bf / jnp.maximum(dsel, 1e-6), -1.0)
    meta = jnp.concatenate(
        [_pack_feature_meta(fl.xy, fl.level, fl.angle, fl.size,
                            fl.response, fl.valid),
         ur[:, None].astype(jnp.float32),
         depth[:, None].astype(jnp.float32)], axis=1)
    return meta, fl.desc


class ORB2Extractor:
    """Callable extractor with the reference's ORB2 configuration surface."""

    def __init__(
        self,
        num_features: int | None = None,
        num_levels: int | None = None,
        scale_factor: float | None = None,
        fast_threshold: float | None = None,
        cell: int = 16,
        per_cell: int = 6,
        use_pallas: bool | None = None,
    ):
        self.num_features = num_features or Parameters.kNumFeatures
        self.num_levels = num_levels or Parameters.kNumLevels
        self.scale_factor = scale_factor or Parameters.kScaleFactor
        self.fast_threshold = fast_threshold or Parameters.kFASTThreshold
        self.cell = cell
        self.per_cell = per_cell
        if use_pallas is None:
            use_pallas = (
                Parameters.kUsePallasFAST and jax.default_backend() == "tpu"
            )
        self.use_pallas = bool(use_pallas)
        self.scale_factors = np.array(
            [self.scale_factor ** l for l in range(self.num_levels)], np.float32
        )
        self.sigma2 = level_sigma2(self.num_levels, self.scale_factor)
        self.inv_sigma2 = 1.0 / self.sigma2

    def __call__(self, img) -> FeatureData:
        """img: (H, W) grayscale uint8/float array -> FeatureData."""
        img = jnp.asarray(img)   # native dtype; cast happens on device
        return _extract_jit(
            img,
            self.num_features,
            self.num_levels,
            self.scale_factor,
            float(self.fast_threshold),
            self.cell,
            self.per_cell,
            self.use_pallas,
        )

    def extract_stereo_deferred(self, img_l, img_r, bf: float,
                                max_disp: float, max_distance: float,
                                row_tol: float):
        """Dispatch the fused stereo extraction WITHOUT any readback.

        Returns device handles ``(meta (N,9), desc (N,D))``; the caller
        harvests ``meta`` when host fields are actually needed — the
        pipelined frame loop dispatches the next frame's extraction and the
        current frame's tracking step before paying any tunnel round trip."""
        from pyslam_tpu.utils.profiling import device_counters

        device_counters.dispatches += 1
        device_counters.uploads += 2   # the stereo image pair
        return _extract_stereo_jit(
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.float32(bf), jnp.float32(max_disp),
            self.num_features, self.num_levels, self.scale_factor,
            float(self.fast_threshold), self.cell, self.per_cell,
            self.use_pallas, float(max_distance), float(row_tol))

    def extract_stereo(self, img_l, img_r, bf: float, max_disp: float,
                       max_distance: float, row_tol: float):
        """Fused left+right extraction + row stereo match: one dispatch,
        two readbacks.  Returns (numpy FeatureData, kps_ur, depths,
        device desc handle — kept for the fused tracking step so the
        descriptors never re-cross the tunnel)."""
        meta, desc = self.extract_stereo_deferred(
            img_l, img_r, bf, max_disp, max_distance, row_tol)
        from pyslam_tpu.utils.profiling import device_counters

        device_counters.readbacks += 1
        meta = np.asarray(meta)
        fd = FeatureData(
            xy=np.ascontiguousarray(meta[:, 0:2]),
            level=meta[:, 2].astype(np.int32),
            angle=meta[:, 3].copy(),
            size=meta[:, 4].copy(),
            response=meta[:, 5].copy(),
            desc=desc,   # device handle; Frame materializes lazily
            valid=meta[:, 6] > 0.5,
        )
        return fd, meta[:, 7].copy(), meta[:, 8].copy(), desc
