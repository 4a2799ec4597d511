"""Oriented keypoint-patch extraction on device.

TPU-native replacement for the reference's per-keypoint ``cv2.warpAffine``
loop (pySLAM ``pyslam/utilities/features.py:754-784``
``extract_patches_array`` and its C++ twin ``extract_patches_array_cpp``):
all N patches are sampled in one batched bilinear gather, so a whole
frame's patch tensor is produced by a single jitted dispatch and feeds the
patch-descriptor networks (HardNet/SOSNet/L2Net/TFeat) on the MXU.

Affine convention matches the reference exactly (dst->src map, i.e.
``cv2.WARP_INVERSE_MAP``): for patch pixel (u, v) in a ``patch_size``²
grid,

    scale = mag_factor * kp.size / patch_size
    src_x = scale*cos*(u - h) - scale*sin*(v - h) + kp.x
    src_y = scale*sin*(u - h) + scale*cos*(v - h) + kp.y     (h = patch_size/2)

with (cos, sin) = (1, 0) when the keypoint has no orientation
(angle < 0), as in the reference loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at float coords; zero outside (WARP_FILL_OUTLIERS)."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inside, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@functools.partial(jax.jit, static_argnames=("patch_size",))
def extract_oriented_patches(
    img: jnp.ndarray,
    xys: jnp.ndarray,
    sizes: jnp.ndarray,
    angles_deg: jnp.ndarray,
    patch_size: int = 32,
    mag_factor: float = 1.0,
) -> jnp.ndarray:
    """Batched oriented patch sampling.

    Args:
      img: (H, W) float image.
      xys: (N, 2) keypoint centers (x, y) in pixels.
      sizes: (N,) keypoint diameters (cv2 ``kp.size`` convention).
      angles_deg: (N,) orientations in degrees; negative = unoriented.
      patch_size: output patch side.
      mag_factor: keypoint-scale magnification (reference wrappers use 1.0
        for HardNet/L2Net, 3.0 for TFeat/SOSNet).

    Returns: (N, patch_size, patch_size) float32 patches.
    """
    img = img.astype(jnp.float32)
    half = 0.5 * patch_size
    scale = mag_factor * sizes.astype(jnp.float32) / patch_size  # (N,)
    a_rad = angles_deg.astype(jnp.float32) * (np.pi / 180.0)
    oriented = a_rad >= 0
    cos = jnp.where(oriented, jnp.cos(a_rad), 1.0) * scale
    sin = jnp.where(oriented, jnp.sin(a_rad), 0.0) * scale

    u = jnp.arange(patch_size, dtype=jnp.float32) - half  # dst coords - center
    uu, vv = jnp.meshgrid(u, u, indexing="xy")  # (P, P): uu = x index, vv = y

    def one(c, s, x, y):
        src_x = c * uu - s * vv + x
        src_y = s * uu + c * vv + y
        return _bilinear_gather(img, src_x, src_y)

    return jax.vmap(one)(cos, sin, xys[:, 0].astype(jnp.float32),
                         xys[:, 1].astype(jnp.float32))


def extract_log_polar_patches(
    img: jnp.ndarray,
    xys: jnp.ndarray,
    sizes: jnp.ndarray,
    angles_deg: jnp.ndarray,
    patch_size: int = 32,
    mag_factor: float = 3.0,
    min_radius: float = 0.7,
) -> jnp.ndarray:
    """Batched LOG-POLAR patch sampling ("Beyond Cartesian Representations
    for Local Descriptors"; reference wrapper feature_logpolar.py).

    Output rows are log-spaced radii (min_radius .. mag*size/2), columns
    are angles offset by the keypoint orientation — scale changes become
    row shifts and rotations become column shifts, which is what makes the
    log-polar descriptor scale/rotation-equivariant.

    Returns: (N, patch_size, patch_size) float32 patches.
    """
    img = img.astype(jnp.float32)
    P = patch_size
    max_r = jnp.maximum(mag_factor * sizes.astype(jnp.float32) * 0.5,
                        min_radius + 1e-3)
    a0 = jnp.where(angles_deg >= 0, angles_deg, 0.0) * (np.pi / 180.0)
    i = jnp.arange(P, dtype=jnp.float32)
    # radii (rows): min_radius * (max_r/min_radius)^(i/(P-1))
    log_ratio = jnp.log(max_r / min_radius)[:, None]          # (N, 1)
    rho = min_radius * jnp.exp(log_ratio * (i[None, :] / (P - 1)))  # (N, P)
    theta = a0[:, None] + 2.0 * np.pi * i[None, :] / P        # (N, P)

    def one(r, t, x, y):
        src_x = x + r[:, None] * jnp.cos(t)[None, :]
        src_y = y + r[:, None] * jnp.sin(t)[None, :]
        return _bilinear_gather(img, src_x, src_y)

    return jax.vmap(one)(rho, theta, xys[:, 0].astype(jnp.float32),
                         xys[:, 1].astype(jnp.float32))
