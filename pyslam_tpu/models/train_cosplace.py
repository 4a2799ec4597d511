"""In-framework CosPlace-class VPR training (zero-egress).

The reference's score-based loop detectors download gmberton/CosPlace hub
checkpoints (pySLAM ``pyslam/loop_closing/loop_detector_vpr.py:241-248``);
this environment has no network access, so the framework trains its own tiny
GeoLocalizationNet (resnet9 trunk, width 16, GeM + linear head) on
procedural "places" and bundles it (``checkpoints/cosplace_tiny.npz``) —
the same pattern as ``train_superpoint.py`` / ``train_lightglue.py``.

Task: each place is a procedural texture (random Gaussian blobs + global
gradient at a place-specific seed); views are random rotated/scaled crops
with photometric jitter.  Training is CosFace-style classification over
places (cosine logits, additive margin) — the loss CosPlace itself uses.
Generalization is evaluated on DISJOINT held-out places: recall@1 of
matching a query view to a gallery of one reference view per place.

Run ``python -m pyslam_tpu.models.train_cosplace`` to regenerate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

VIEW_H, VIEW_W = 96, 128    # network input (divisible by 32)
TEX_H, TEX_W = 192, 256     # place texture
ARCH = "resnet9"
WIDTH = 16
OUT_DIM = 128
N_PLACES = 64


def place_texture(seed: int) -> np.ndarray:
    """Procedural (TEX_H, TEX_W, 3) texture for one place."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:TEX_H, 0:TEX_W].astype(np.float32)
    img = np.zeros((TEX_H, TEX_W, 3), np.float32)
    # global gradient (orientation cue)
    g = rng.normal(size=(2, 3)).astype(np.float32)
    img += (ys[..., None] / TEX_H) * g[0] + (xs[..., None] / TEX_W) * g[1]
    for _ in range(40):
        cy, cx = rng.uniform(0, TEX_H), rng.uniform(0, TEX_W)
        s = rng.uniform(6, 30)
        col = rng.normal(size=3)
        img += col * np.exp(
            -((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s)
        )[..., None]
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return (img * 255.0).astype(np.float32)


def render_view(tex: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random rotated/scaled crop + photometric jitter -> (VIEW_H, VIEW_W, 3)."""
    ang = rng.uniform(-0.3, 0.3)
    scale = rng.uniform(0.55, 0.85)
    cy = rng.uniform(0.35, 0.65) * TEX_H
    cx = rng.uniform(0.35, 0.65) * TEX_W
    c, s = np.cos(ang), np.sin(ang)
    ys, xs = np.mgrid[0:VIEW_H, 0:VIEW_W].astype(np.float32)
    ys = (ys - VIEW_H / 2) * scale * (TEX_H / VIEW_H)
    xs = (xs - VIEW_W / 2) * scale * (TEX_W / VIEW_W)
    sy = cy + c * ys - s * xs
    sx = cx + s * ys + c * xs
    y0 = np.clip(sy.astype(np.int64), 0, TEX_H - 2)
    x0 = np.clip(sx.astype(np.int64), 0, TEX_W - 2)
    fy = np.clip(sy - y0, 0, 1)[..., None]
    fx = np.clip(sx - x0, 0, 1)[..., None]
    v = (
        tex[y0, x0] * (1 - fy) * (1 - fx)
        + tex[y0 + 1, x0] * fy * (1 - fx)
        + tex[y0, x0 + 1] * (1 - fy) * fx
        + tex[y0 + 1, x0 + 1] * fy * fx
    )
    v = v * rng.uniform(0.7, 1.3) + rng.uniform(-20, 20)
    v += rng.normal(scale=4.0, size=v.shape)
    return np.clip(v, 0, 255).astype(np.float32)


def _normalize(v: np.ndarray) -> np.ndarray:
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255.0
    return (v - mean) / std


def build_net():
    from pyslam_tpu.models.cosplace import GeoLocalizationNet

    return GeoLocalizationNet(arch=ARCH, out_dim=OUT_DIM, width=WIDTH)


def train(steps: int = 300, batch: int = 32, lr: float = 1e-3, seed: int = 0,
          log_every: int = 50):
    import optax

    net = build_net()
    rng = np.random.default_rng(seed)
    textures = [place_texture(1000 + p) for p in range(N_PLACES)]
    variables = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, VIEW_H, VIEW_W, 3))
    )
    centers = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (N_PLACES, OUT_DIM)
    ) * 0.05
    params = {"net": variables, "centers": centers}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, labels):
        def f(p):
            d = net.apply(p["net"], imgs)                    # (B, D) unit
            cn = p["centers"] / jnp.maximum(
                jnp.linalg.norm(p["centers"], axis=1, keepdims=True), 1e-9
            )
            cos = d @ cn.T                                   # (B, P)
            # CosFace: additive margin on the target class, scale 16
            onehot = jax.nn.one_hot(labels, N_PLACES)
            logits = 16.0 * (cos - 0.2 * onehot)
            return optax.softmax_cross_entropy(logits, onehot).mean()

        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        labels = rng.integers(0, N_PLACES, batch)
        imgs = np.stack(
            [_normalize(render_view(textures[l], rng)) for l in labels]
        )
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels)
        )
        if i % log_every == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    return net, params["net"]


def evaluate(net, variables, n_places: int = 24, seed: int = 7777):
    """Recall@1 on held-out places (disjoint from the training set)."""
    rng = np.random.default_rng(seed)
    texs = [place_texture(900000 + p) for p in range(n_places)]
    run = jax.jit(lambda v, x: net.apply(v, x))
    gallery = np.stack([
        np.asarray(run(variables, jnp.asarray(
            _normalize(render_view(t, rng))[None])))[0]
        for t in texs
    ])
    hits = 0
    for q in range(n_places):
        d = np.asarray(run(variables, jnp.asarray(
            _normalize(render_view(texs[q], rng))[None])))[0]
        if int(np.argmax(gallery @ d)) == q:
            hits += 1
    return hits / n_places


def save_checkpoint(path: str, variables):
    flat = {}

    def flatten(tree, prefix=""):
        for k, v in dict(tree).items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                flatten(dict(v), key)
            else:
                flat[key] = np.asarray(v)

    flatten(dict(variables))
    flat["__arch__"] = np.asarray(ARCH)
    flat["__width__"] = np.asarray(WIDTH)
    flat["__out_dim__"] = np.asarray(OUT_DIM)
    np.savez_compressed(path, **flat)


def main():
    import os

    net, variables = train()
    r1 = evaluate(net, variables)
    rand_net = build_net()
    rand_vars = rand_net.init(
        jax.random.PRNGKey(123), jnp.zeros((1, VIEW_H, VIEW_W, 3))
    )
    r1_rand = evaluate(rand_net, rand_vars)
    print(f"recall@1 trained {r1:.3f} vs random-init {r1_rand:.3f}")
    out = os.path.join(
        os.path.dirname(__file__), "checkpoints", "cosplace_tiny.npz"
    )
    save_checkpoint(out, variables)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
