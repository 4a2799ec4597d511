"""Semi-global stereo matching in pure JAX.

TPU-native replacement for the reference's ``DEPTH_SGBM`` backend (pySLAM
``pyslam/depth_estimation/depth_estimator_sgbm.py`` over cv2.StereoSGBM).
Pipeline, all jitted:

1. cost volume: census-transform hamming costs over the disparity range
   (shift-and-compare, no loops over pixels),
2. semi-global aggregation along 4 scan directions with the standard P1/P2
   smoothness penalties.  Directions are NOT scanned sequentially over the
   full image extent (that is ~W sequential steps of tiny (H,D) updates —
   the worst possible TPU mapping): every scan line is cut into tiles of
   ``path_tile`` pixels with a ``path_halo`` warm-up prefix, and ALL tiles
   of ALL four directions run as ONE batched ``lax.scan`` of
   ``path_halo + path_tile`` steps.  Truncating aggregation paths to tile
   length is the standard real-time SGM approximation (the ``- prev_min``
   normalization makes path influence decay geometrically, so a 16-pixel
   halo recovers near-exact costs),
3. winner-take-all + parabola subpixel refinement,
4. left-right consistency check -> invalid pixels get disparity -1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INVALID = -1.0


def census_transform(img: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """(H,W) -> (H,W,B) census bits over a (2r+1)^2-1 neighborhood."""
    h, w = img.shape
    pads = jnp.pad(img, radius, mode="edge")
    bits = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            n = pads[radius + dy : radius + dy + h, radius + dx : radius + dx + w]
            bits.append(n < img)
    return jnp.stack(bits, axis=-1)


def cost_volume(census_l: jnp.ndarray, census_r: jnp.ndarray, max_disp: int):
    """(H,W,D) hamming cost between left pixel and right pixel at x-d."""
    h, w, b = census_l.shape
    costs = []
    for d in range(max_disp):
        shifted = jnp.pad(census_r[:, : w - d], ((0, 0), (d, 0), (0, 0)),
                          mode="edge") if d > 0 else census_r
        costs.append(jnp.sum(census_l != shifted, axis=-1).astype(jnp.float32))
    return jnp.stack(costs, axis=-1)


def _path_segments(c: jnp.ndarray, tile: int, halo: int):
    """(S, T, D) -> (L, n_tiles*T, D) tiled path segments, L = halo + tile.

    Each segment is one tile of ``tile`` path pixels preceded by ``halo``
    warm-up pixels (clamped at the image border), so all tiles aggregate in
    parallel while paths behave as if up to halo+tile pixels long.
    """
    S, T, D = c.shape
    n_tiles = -(-S // tile)
    idx = jnp.clip(
        jnp.arange(n_tiles)[:, None] * tile + jnp.arange(-halo, tile)[None, :],
        0, S - 1,
    )
    seg = c[idx]  # (n_tiles, L, T, D)
    return jnp.moveaxis(seg, 1, 0).reshape(halo + tile, n_tiles * T, D), n_tiles


def _segments_to_image(agg: jnp.ndarray, n_tiles: int, S: int, T: int):
    """(tile, n_tiles*T, D) tile outputs -> (S, T, D)."""
    tile = agg.shape[0]
    D = agg.shape[-1]
    out = agg.reshape(tile, n_tiles, T, D)
    out = jnp.moveaxis(out, 1, 0).reshape(n_tiles * tile, T, D)
    return out[:S]


def _aggregate_4dir(vol: jnp.ndarray, p1: float, p2: float,
                    tile: int, halo: int) -> jnp.ndarray:
    """Sum of 4-direction SGM path costs via ONE batched tiled scan."""
    big = 1e9
    h, w, D = vol.shape

    cols = vol                              # scan over rows (axis 0)
    rows = jnp.moveaxis(vol, 1, 0)          # scan over columns
    views = [rows, rows[::-1], cols, cols[::-1]]
    segs, meta = [], []
    for v in views:
        seg, n_tiles = _path_segments(v, tile, halo)
        segs.append(seg)
        meta.append((n_tiles, v.shape[0], v.shape[1], seg.shape[1]))
    batch = jnp.concatenate(segs, axis=1)   # (L, sum_batches, D)

    def step(prev, cur):
        prev_min = jnp.min(prev, axis=-1, keepdims=True)
        shift_p = jnp.pad(prev[..., :-1], ((0, 0), (1, 0)), constant_values=big)
        shift_n = jnp.pad(prev[..., 1:], ((0, 0), (0, 1)), constant_values=big)
        smooth = jnp.minimum(
            jnp.minimum(prev, jnp.minimum(shift_p, shift_n) + p1),
            prev_min + p2,
        )
        out = cur + smooth - prev_min
        return out, out

    init = batch[0]
    _, agg = jax.lax.scan(step, init, batch[1:])
    agg = jnp.concatenate([init[None], agg], axis=0)[halo:]  # (tile, B, D)

    total = jnp.zeros_like(vol)
    off = 0
    for i, (n_tiles, S, T, width) in enumerate(meta):
        img = _segments_to_image(agg[:, off:off + width], n_tiles, S, T)
        off += width
        if i in (1, 3):
            img = img[::-1]
        if i in (0, 1):
            img = jnp.moveaxis(img, 1, 0)
        total = total + img
    return total


@functools.partial(
    jax.jit,
    static_argnames=("max_disp", "census_radius", "path_tile", "path_halo"),
)
def sgm_disparity(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    max_disp: int = 64,
    p1: float = 8.0,
    p2: float = 64.0,
    census_radius: int = 2,
    lr_tolerance: float = 1.5,
    uniqueness: float = 0.95,
    path_tile: int = 32,
    path_halo: int = 16,
):
    """Left disparity map with subpixel refinement and LR check; invalid=-1."""
    cl = census_transform(img_l, census_radius)
    cr = census_transform(img_r, census_radius)
    vol = cost_volume(cl, cr, max_disp)

    agg = _aggregate_4dir(vol, p1, p2, path_tile, path_halo)

    d_best = jnp.argmin(agg, axis=-1)
    c_best = jnp.min(agg, axis=-1)

    # uniqueness: best must beat second best (outside +-1) by the ratio
    D = max_disp
    dd = jnp.arange(D)
    masked = jnp.where(
        jnp.abs(dd[None, None, :] - d_best[..., None]) <= 1, 1e9, agg
    )
    c_second = jnp.min(masked, axis=-1)
    unique_ok = c_best <= uniqueness * c_second

    # parabola subpixel
    d0 = jnp.clip(d_best, 1, D - 2)
    cm = jnp.take_along_axis(agg, (d0 - 1)[..., None], -1)[..., 0]
    cc = jnp.take_along_axis(agg, d0[..., None], -1)[..., 0]
    cp = jnp.take_along_axis(agg, (d0 + 1)[..., None], -1)[..., 0]
    denom = jnp.maximum(cm - 2 * cc + cp, 1e-6)
    offset = jnp.clip((cm - cp) / (2 * denom), -0.5, 0.5)
    disp = d_best.astype(jnp.float32) + jnp.where(
        (d_best >= 1) & (d_best <= D - 2), offset, 0.0
    )

    # right disparity via cost-volume reprojection for the LR check:
    # cost_r(x, d) = cost_l(x + d, d).  Per-disparity this is a CONTIGUOUS
    # left-shift of the (H,W) cost plane — D static slice+pads instead of an
    # (H,W,D) take_along_axis (a ~30M-element random gather at KITTI size:
    # ~11 ns/element on TPU made that one op dominate the whole SGM graph)
    h, w = img_l.shape
    xs = jnp.arange(w)
    agg_r = jnp.stack(
        [
            jnp.pad(agg[:, d:, d], ((0, 0), (0, d)), mode="edge")
            for d in range(D)
        ],
        axis=-1,
    )
    d_right = jnp.argmin(agg_r, axis=-1)
    # check: |disp_l(x) - disp_r(x - disp_l(x))| <= tol
    xr = jnp.clip(xs[None, :] - d_best, 0, w - 1)
    d_r_at = jnp.take_along_axis(d_right, xr, axis=1)
    lr_ok = jnp.abs(d_best - d_r_at) <= lr_tolerance

    valid = unique_ok & lr_ok & (d_best > 0)
    return jnp.where(valid, disp, INVALID)
