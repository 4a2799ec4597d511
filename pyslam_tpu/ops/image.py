"""Image ops: pyramid, separable Gaussian blur, gradients, bilinear sampling.

TPU-native substrate for the feature extractors (reference:
``pyslam/utilities/pyramid.py``, OpenCV calls inside
``pyslam/local_features/feature_manager.py``).  Images are float32 (H, W)
single-channel arrays in [0, 255]; all ops are jit-friendly with static
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication.

    Implemented as shift-and-add (2*(2r+1) shifted scalings) rather than
    ``lax.conv``: single-channel convs can't use the MXU and lower poorly on
    TPU, while shifted adds are pure VPU streams.
    """
    k = gaussian_kernel1d(sigma, radius).astype(img.dtype)
    x = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    h = img.shape[0]
    x = sum(k[i] * x[i : i + h, :] for i in range(2 * radius + 1))
    x = jnp.pad(x, ((0, 0), (radius, radius)), mode="edge")
    w = img.shape[1]
    x = sum(k[i] * x[:, i : i + w] for i in range(2 * radius + 1))
    return x


def resize_bilinear(img: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, new_hw, method="bilinear")


def build_pyramid(img: jnp.ndarray, num_levels: int, scale: float):
    """List of images, level l at size round(shape / scale**l).

    Returned as a Python list (shapes differ per level — each level becomes its
    own XLA sub-graph under jit, compiled once).
    """
    h, w = img.shape
    out = [img]
    for lv in range(1, num_levels):
        s = scale ** lv
        out.append(resize_bilinear(img, (max(int(round(h / s)), 8), max(int(round(w / s)), 8))))
    return out


def sobel_gradients(img: jnp.ndarray):
    """(gx, gy) with 3x3 Sobel, replicate padding."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype)
    ky = kx.T
    p = jnp.pad(img, 1, mode="edge")[None, None]
    gx = jax.lax.conv_general_dilated(p, kx[None, None], (1, 1), "VALID")[0, 0]
    gy = jax.lax.conv_general_dilated(p, ky[None, None], (1, 1), "VALID")[0, 0]
    return gx, gy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (N,) values at float (N, 2) (x, y) positions with clamping."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)
    v00 = flat[y0 * w + x0]
    v01 = flat[y0 * w + x1]
    v10 = flat[y1 * w + x0]
    v11 = flat[y1 * w + x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def nearest_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)
    return img.reshape(-1)[y * w + x]


def laplacian_variance(img: jnp.ndarray) -> jnp.ndarray:
    """Blur metric (variance of Laplacian), reference
    ``pyslam/utilities/img_processing.py`` blur detection used at
    ``tracking.py:1122``."""
    k = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], img.dtype)
    p = jnp.pad(img, 1, mode="edge")[None, None]
    lap = jax.lax.conv_general_dilated(p, k[None, None], (1, 1), "VALID")[0, 0]
    return jnp.var(lap)
