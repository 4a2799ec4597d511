"""Pallas kernel: fused FAST-9 score + 3x3 NMS in one VMEM pass.

The XLA formulation (ops/fast.py) materializes 16 shifted copies of the image
in HBM across several fusion boundaries (~3.7 ms/frame at KITTI size); this
kernel processes row bands entirely in VMEM — the 16 circle comparisons, the
run-of-9 binary-doubling min, the threshold, and the 3x3 NMS all happen in
VMEM with ONE HBM read of the band (+halo) and one write of the result.

Halo handling: blocks overlap by 2*HALO rows, which BlockSpec index maps
cannot express, so the image stays in HBM (memory_space=ANY) and each kernel
instance DMAs its padded band into VMEM scratch explicitly.  Circular
``pltpu.roll`` wrap-around only pollutes halo rows / border columns, which
the FAST border mask discards anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyslam_tpu.ops.fast import CIRCLE

BAND = 32
HALO = 8


def _roll2(x, dy, dx):
    # pltpu.roll requires non-negative shifts; rolling by (size - s) is the
    # circular equivalent of rolling by -s
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[0], 0)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[1], 1)
    return out


def _fast_nms_kernel(img_hbm, out_ref, scratch, sem, *, threshold: float,
                     h: int, w: int, border: int):
    b = pl.program_id(0)
    row0 = b * BAND  # padded image has HALO extra rows on top: band b's
    # halo'd window is padded rows [b*BAND, b*BAND + BAND + 2*HALO)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(row0, BAND + 2 * HALO), :], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[:]

    neigh = [_roll2(x, dy, dx) for dy, dx in CIRCLE]
    d_bright = [n - x for n in neigh]
    d_dark = [x - n for n in neigh]

    def run9_max(d):
        r2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        r4 = [jnp.minimum(r2[k], r2[(k + 2) % 16]) for k in range(16)]
        r8 = [jnp.minimum(r4[k], r4[(k + 4) % 16]) for k in range(16)]
        r9 = [jnp.minimum(r8[k], d[(k + 8) % 16]) for k in range(16)]
        m = r9[0]
        for k in range(1, 16):
            m = jnp.maximum(m, r9[k])
        return m

    score = jnp.maximum(run9_max(d_bright), run9_max(d_dark))
    score = jnp.where(score > threshold, score, 0.0)

    # border mask BEFORE NMS (matches ops/fast.py order: a masked-out border
    # pixel must not suppress its interior neighbor)
    rows = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + b * BAND - HALO
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    inside = (
        (rows >= border) & (rows < h - border)
        & (cols >= border) & (cols < w - border)
    )
    score = jnp.where(inside, score, 0.0)

    # 3x3 strict local max
    neigh_max = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            r = _roll2(score, dy, dx)
            neigh_max = r if neigh_max is None else jnp.maximum(neigh_max, r)
    score = jnp.where(score > neigh_max, score, 0.0)

    out_ref[:] = score[HALO : HALO + BAND, :]


@functools.partial(jax.jit, static_argnames=("threshold", "border", "interpret"))
def fast_score_map_pallas(img: jnp.ndarray, threshold: float, border: int = 16,
                          interpret: bool | None = None):
    """Drop-in fused replacement for fast.fast_score_map + fast.nms3x3."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = img.shape
    nbands = -(-h // BAND)
    h_pad = nbands * BAND
    # Mosaic DMA slices must be lane-aligned: pad width to a 128 multiple
    # (pad columns land outside the border mask, so they contribute nothing)
    w_pad = -(-w // 128) * 128
    img_p = jnp.pad(img, ((HALO, h_pad - h + HALO), (0, w_pad - w)))

    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, threshold=threshold, h=h, w=w,
                          border=border),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), img.dtype),
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BAND, w_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BAND + 2 * HALO, w_pad), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img_p)

    return out[:h, :w]
