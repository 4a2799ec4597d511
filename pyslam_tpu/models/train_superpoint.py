"""In-framework SuperPoint training (MagicPoint-style, zero-egress).

The reference runs the official ``superpoint_v1.pth`` checkpoint
(``pyslam/local_features/feature_superpoint.py:60-75``); this environment has
no network access and no mounted checkpoints, so the framework trains its own
small SuperPoint-class checkpoint from scratch:

1. **Detector** (MagicPoint stage of the SuperPoint paper): random synthetic
   shapes (quads, triangles, stars, line junctions, checkerboards) rendered
   with EXACT corner ground truth; per-8x8-cell 65-way cross-entropy (64 cell
   positions + dustbin).
2. **Descriptor** (SuperPoint stage): homography-warped image pairs; dense
   cell-level hinge loss — descriptors of corresponding cells pulled
   together, non-corresponding pushed below a margin.

Architecture is exactly :class:`pyslam_tpu.models.superpoint.SuperPointNet`,
so the resulting ``.npz`` loads through the normal checkpoint path.  Run
``python -m pyslam_tpu.models.train_superpoint`` (TPU or CPU) to regenerate
``pyslam_tpu/models/checkpoints/superpoint_tiny.npz``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

H, W = 120, 160
HC, WC = H // 8, W // 8


# ---------------------------------------------------------------- rendering
def _draw_line(img, p0, p1, val):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    t = np.linspace(0.0, 1.0, n)
    xs = np.clip(np.round(p0[0] + (p1[0] - p0[0]) * t).astype(int), 0, W - 1)
    ys = np.clip(np.round(p0[1] + (p1[1] - p0[1]) * t).astype(int), 0, H - 1)
    img[ys, xs] = val
    img[np.clip(ys + 1, 0, H - 1), xs] = val


def _fill_poly(img, pts, val):
    from numpy import minimum as mn

    ys, xs = np.mgrid[0:H, 0:W]
    inside = np.ones((H, W), bool)
    n = len(pts)
    ok = True
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        cross = (x1 - x0) * (ys - y0) - (y1 - y0) * (xs - x0)
        inside &= cross >= 0
    if not inside.any():  # wrong winding
        inside = np.ones((H, W), bool)
        for i in range(n):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % n]
            cross = (x1 - x0) * (ys - y0) - (y1 - y0) * (xs - x0)
            inside &= cross <= 0
    img[inside] = val
    return inside.any()


def render_shapes(rng: np.random.Generator):
    """One synthetic training image -> (img uint8 (H,W), corners (K,2) xy)."""
    img = np.full((H, W), float(rng.integers(30, 120)), np.float32)
    corners: list[tuple[float, float]] = []
    kind = rng.integers(0, 4)
    if kind == 0:  # random convex quads / triangles
        for _ in range(rng.integers(1, 4)):
            nv = int(rng.integers(3, 5))
            cx, cy = rng.uniform(25, W - 25), rng.uniform(20, H - 20)
            r = rng.uniform(8, 28)
            angs = np.sort(rng.uniform(0, 2 * np.pi, nv))
            pts = np.stack(
                [cx + r * np.cos(angs), cy + r * np.sin(angs)], 1
            )
            _fill_poly(img, pts, float(rng.integers(140, 255)))
            corners.extend(map(tuple, pts))
    elif kind == 1:  # star of line segments from a junction
        cx, cy = rng.uniform(30, W - 30), rng.uniform(25, H - 25)
        for _ in range(rng.integers(3, 6)):
            a = rng.uniform(0, 2 * np.pi)
            r = rng.uniform(15, 45)
            p1 = (cx + r * np.cos(a), cy + r * np.sin(a))
            _draw_line(img, (cx, cy), p1, float(rng.integers(150, 255)))
            corners.append(p1)
        corners.append((cx, cy))
    elif kind == 2:  # checkerboard patch
        c = int(rng.integers(8, 16))
        x0, y0 = rng.integers(5, 40), rng.integers(5, 30)
        nx, ny = rng.integers(3, 7), rng.integers(3, 6)
        for i in range(ny):
            for j in range(nx):
                if (i + j) % 2 == 0:
                    y, x = y0 + i * c, x0 + j * c
                    img[y : y + c, x : x + c] = float(rng.integers(160, 255))
        for i in range(ny + 1):
            for j in range(nx + 1):
                corners.append((x0 + j * c, y0 + i * c))
    else:  # axis-aligned rectangles
        for _ in range(rng.integers(1, 4)):
            x0 = rng.integers(5, W - 40)
            y0 = rng.integers(5, H - 35)
            w = rng.integers(12, 35)
            h = rng.integers(10, 28)
            img[y0 : y0 + h, x0 : x0 + w] = float(rng.integers(140, 255))
            corners.extend(
                [(x0, y0), (x0 + w - 1, y0), (x0, y0 + h - 1),
                 (x0 + w - 1, y0 + h - 1)]
            )
    img += rng.normal(0, 4.0, img.shape)
    k = rng.integers(0, 2)
    if k:  # cheap blur
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    cs = [
        (x, y) for x, y in corners
        if 2 <= x < W - 2 and 2 <= y < H - 2
    ]
    return np.clip(img, 0, 255), np.asarray(cs, np.float32).reshape(-1, 2)


def cells_target(corners: np.ndarray) -> np.ndarray:
    """(HC,WC) int32: 0..63 corner position in cell, 64 = dustbin."""
    tgt = np.full((HC, WC), 64, np.int32)
    for x, y in corners:
        cx, cy = int(x) // 8, int(y) // 8
        if 0 <= cx < WC and 0 <= cy < HC:
            tgt[cy, cx] = (int(y) % 8) * 8 + (int(x) % 8)
    return tgt


def random_homography(rng: np.random.Generator) -> np.ndarray:
    """Mild random homography (rotation + scale + perspective + shift)."""
    a = rng.uniform(-0.35, 0.35)
    s = rng.uniform(0.85, 1.2)
    tx, ty = rng.uniform(-12, 12, 2)
    px, py = rng.uniform(-4e-4, 4e-4, 2)
    c, sn = np.cos(a), np.sin(a)
    Hm = np.array(
        [[s * c, -s * sn, tx], [s * sn, s * c, ty], [px, py, 1.0]], np.float64
    )
    # keep the warp roughly centered
    cx, cy = W / 2, H / 2
    T = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    Ti = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    return T @ Hm @ Ti


def warp_image(img: np.ndarray, Hm: np.ndarray) -> np.ndarray:
    """Inverse-warp with nearest sampling (enough for training data)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    Hi = np.linalg.inv(Hm)
    d = Hi @ np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
    u = d[0] / d[2]
    v = d[1] / d[2]
    ok = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
    ui = np.clip(np.round(u).astype(int), 0, W - 1)
    vi = np.clip(np.round(v).astype(int), 0, H - 1)
    out = np.where(ok, img[vi, ui], 0.0)
    return out.reshape(H, W).astype(np.float32)


def warp_points(pts: np.ndarray, Hm: np.ndarray) -> np.ndarray:
    if len(pts) == 0:
        return pts
    d = Hm @ np.concatenate([pts.T, np.ones((1, len(pts)))])
    return (d[:2] / d[2]).T.astype(np.float32)


def make_batch(rng, batch: int):
    imgs, tgts, imgs2, tgts2, Hs = [], [], [], [], []
    for _ in range(batch):
        img, corners = render_shapes(rng)
        Hm = random_homography(rng)
        img2 = warp_image(img, Hm)
        c2 = warp_points(corners, Hm)
        c2 = c2[(c2[:, 0] >= 2) & (c2[:, 0] < W - 2)
                & (c2[:, 1] >= 2) & (c2[:, 1] < H - 2)] if len(c2) else c2
        imgs.append(img)
        tgts.append(cells_target(corners))
        imgs2.append(img2)
        tgts2.append(cells_target(c2))
        Hs.append(Hm)
    return (
        np.stack(imgs).astype(np.float32),
        np.stack(tgts),
        np.stack(imgs2).astype(np.float32),
        np.stack(tgts2),
        np.stack(Hs).astype(np.float32),
    )


# ----------------------------------------------------------------- training
def cell_centers() -> np.ndarray:
    """(HC*WC, 2) xy pixel centers of the 8x8 cells."""
    ys, xs = np.mgrid[0:HC, 0:WC]
    return np.stack([xs.ravel() * 8 + 4.0, ys.ravel() * 8 + 4.0], 1).astype(
        np.float32
    )


def train(
    steps: int = 1500,
    batch: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    desc_weight: float = 1.0,
    margin_pos: float = 1.0,
    margin_neg: float = 0.2,
    log_every: int = 100,
    n_dataset: int = 1024,
    init_params=None,
):
    """Data is pre-rendered on host and uploaded ONCE; every step samples a
    batch on-device (remote-attached TPU: per-step host->device uploads were
    the wall-clock bottleneck, not compute)."""
    import optax

    from pyslam_tpu.models.superpoint import SuperPointNet

    net = SuperPointNet()
    key = jax.random.PRNGKey(seed)
    params = (init_params if init_params is not None
              else net.init(key, jnp.zeros((H, W, 1))))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    centers = jnp.asarray(cell_centers())  # (C,2)

    def forward(params, img):
        det, desc = net.apply(params, img[..., None] / 255.0)
        return det, desc  # (HC,WC,65), (HC,WC,256)

    def det_loss(det, tgt):
        logp = jax.nn.log_softmax(det, axis=-1)
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        # corner cells are rare: upweight them
        w = jnp.where(tgt < 64, 8.0, 1.0)
        return -(ll * w).sum() / w.sum()

    def desc_loss(desc1, desc2, Hm):
        d1 = desc1.reshape(-1, desc1.shape[-1])
        d2 = desc2.reshape(-1, desc2.shape[-1])
        d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=1, keepdims=True), 1e-9)
        d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=1, keepdims=True), 1e-9)
        # correspondence: cell center of image1 warped into image2
        ones = jnp.ones((centers.shape[0], 1))
        w = (Hm @ jnp.concatenate([centers, ones], 1).T)
        uv = (w[:2] / jnp.maximum(jnp.abs(w[2]), 1e-9) * jnp.sign(w[2])).T
        sim = d1 @ d2.T                                      # (C,C)
        dist = jnp.linalg.norm(
            uv[:, None, :] - centers[None, :, :], axis=-1
        )
        pos = dist <= 8.0
        in_view = (
            (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        )
        lpos = jnp.maximum(0.0, margin_pos - sim) * pos * in_view[:, None]
        lneg = jnp.maximum(0.0, sim - margin_neg) * (~pos) * (dist > 16.0)
        return (
            lpos.sum() / jnp.maximum(pos.sum(), 1.0)
            + lneg.sum() / jnp.maximum((~pos).sum(), 1.0)
        )

    @jax.jit
    def step(params, opt_state, key, data):
        imgs_all, tgts_all, imgs2_all, tgts2_all, Hs_all = data
        idx = jax.random.randint(key, (batch,), 0, imgs_all.shape[0])
        imgs, tgts = imgs_all[idx], tgts_all[idx]
        imgs2, tgts2, Hs = imgs2_all[idx], tgts2_all[idx], Hs_all[idx]

        def loss_fn(p):
            det1, desc1 = jax.vmap(lambda i: forward(p, i))(imgs)
            det2, desc2 = jax.vmap(lambda i: forward(p, i))(imgs2)
            ld = (
                jax.vmap(det_loss)(det1, tgts).mean()
                + jax.vmap(det_loss)(det2, tgts2).mean()
            )
            lm = jax.vmap(desc_loss)(desc1, desc2, Hs).mean()
            return ld + desc_weight * lm, (ld, lm)

        (l, (ld, lm)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l, ld, lm

    rng = np.random.default_rng(seed)
    print(f"rendering {n_dataset} training pairs ...", flush=True)
    data_np = make_batch(rng, n_dataset)
    data = tuple(jnp.asarray(a) for a in data_np)   # ONE upload
    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, l, ld, lm = step(params, opt_state, k, data)
        if i % log_every == 0 or i == steps - 1:
            print(
                f"step {i}: loss={float(l):.4f} det={float(ld):.4f} "
                f"desc={float(lm):.4f}", flush=True,
            )
    return params


DEFAULT_CHECKPOINT = "pyslam_tpu/models/checkpoints/superpoint_tiny.npz"


def main(steps: int | None = None, out: str | None = None):
    import os

    from pyslam_tpu.models.torch_convert import save_variables_npz

    steps = steps or int(os.environ.get("SP_TRAIN_STEPS", 1500))
    out = out or DEFAULT_CHECKPOINT
    init = None
    if os.environ.get("SP_TRAIN_RESUME") == "1" and os.path.exists(out):
        from pyslam_tpu.models.superpoint import SuperPointExtractor

        init = SuperPointExtractor(num_features=64, checkpoint=out).params
        print(f"resuming from {out}")
    params = train(
        steps=steps, init_params=init,
        seed=int(os.environ.get("SP_TRAIN_SEED", 0)),
        lr=float(os.environ.get("SP_TRAIN_LR", 1e-3)),
        desc_weight=float(os.environ.get("SP_TRAIN_DESC_WEIGHT", 1.0)),
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_variables_npz(out, params)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
