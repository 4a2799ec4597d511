"""In-framework LightGlue training (zero-egress).

The reference runs official LightGlue checkpoints downloaded at install time
(pySLAM ``pyslam/local_features/feature_lightglue*``); this environment has
no network access, so the framework trains its own small LightGlue-class
matcher from scratch on synthetic correspondence data and bundles it
(``checkpoints/lightglue_tiny.npz``), exactly like
``train_superpoint.py`` does for the extractor.

Training task — built so that plain nearest-neighbor matching FAILS and the
attention matcher has to earn its keep: each pair shares a small pool of
repeated descriptors (repeated texture), so descriptor distance alone is
ambiguous; only the rotary-encoded keypoint GEOMETRY (a shared homography)
plus cross-attention context disambiguates.  The loss is the LightGlue
paper's: negative log-likelihood of the ground-truth assignment under the
dual-softmax scores + matchability BCE (eq. 10).

Run ``python -m pyslam_tpu.models.train_lightglue`` (TPU or CPU) to
regenerate the checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

W, H = 640.0, 480.0
N_KPS = 64          # keypoints per image
N_TRUE = 40         # ground-truth correspondences per pair
N_POOL = 8          # descriptor pool size (repeated-texture ambiguity)
AMBIG_FRAC = 0.5    # fraction of keypoints drawing from the shared pool
DESC_DIM = 256
DIM = 96            # matcher width (tiny)
LAYERS = 4
HEADS = 4


def random_homography(rng: np.random.Generator) -> np.ndarray:
    """Similarity + mild perspective, mapping image coords to image coords."""
    ang = rng.uniform(-0.15, 0.15)
    s = rng.uniform(0.9, 1.15)
    tx, ty = rng.uniform(-60, 60, 2)
    c, si = np.cos(ang), np.sin(ang)
    Hm = np.array(
        [[s * c, -s * si, tx], [s * si, s * c, ty], [0.0, 0.0, 1.0]]
    )
    Hm[2, :2] = rng.uniform(-1e-4, 1e-4, 2)
    return Hm


def warp_points(Hm: np.ndarray, xy: np.ndarray) -> np.ndarray:
    p = np.concatenate([xy, np.ones((len(xy), 1))], 1) @ Hm.T
    return p[:, :2] / np.maximum(np.abs(p[:, 2:3]), 1e-9) * np.sign(p[:, 2:3])


def make_pair(rng: np.random.Generator, n_pool: int = N_POOL):
    """One training pair.

    Returns (desc0, xy0, desc1, xy1, gt) with gt[i] = matching index in
    image 1 for keypoint i of image 0, or -1.  ``n_pool`` controls the
    descriptor ambiguity (smaller = more keypoints share a descriptor =
    harder): the trainer anneals it as a curriculum — the net first learns
    descriptor matching on nearly-unique descriptors, then geometric
    disambiguation as the pools shrink."""
    pool = rng.normal(size=(n_pool, DESC_DIM)).astype(np.float32)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)

    xy0 = rng.uniform([40, 40], [W - 40, H - 40], (N_KPS, 2)).astype(
        np.float32
    )
    Hm = random_homography(rng)
    xy1 = np.empty_like(xy0)
    gt = np.full(N_KPS, -1, np.int64)

    # a fraction of keypoints draws from the small shared pool (repeated
    # texture: NN matching ambiguous by construction); the rest get unique
    # descriptors.  The matcher must keep the easy half AND use geometry
    # for the ambiguous half — mutual-NN can only do the former.
    ambig = rng.random(N_KPS) < AMBIG_FRAC
    pick = rng.integers(0, n_pool, N_KPS)
    uniq = rng.normal(size=(N_KPS, DESC_DIM)).astype(np.float32)
    uniq /= np.linalg.norm(uniq, axis=1, keepdims=True)
    base0 = np.where(ambig[:, None], pool[pick], uniq)
    d0 = base0 + 0.15 * rng.normal(size=(N_KPS, DESC_DIM))
    d1 = np.empty_like(d0)

    # first N_TRUE keypoints correspond through the homography
    w = warp_points(Hm, xy0[:N_TRUE])
    inb = (
        (w[:, 0] > 8) & (w[:, 0] < W - 8) & (w[:, 1] > 8) & (w[:, 1] < H - 8)
    )
    perm = rng.permutation(N_KPS)
    for i in range(N_TRUE):
        j = perm[i]
        if inb[i]:
            xy1[j] = w[i] + rng.normal(scale=0.5, size=2)
            gt[i] = j
        else:
            xy1[j] = rng.uniform([40, 40], [W - 40, H - 40])
        d1[j] = base0[i] + 0.15 * rng.normal(size=DESC_DIM)
    # unmatched keypoints of image 1: fresh positions, pool descriptors
    for i in range(N_TRUE, N_KPS):
        j = perm[i]
        xy1[j] = rng.uniform([40, 40], [W - 40, H - 40])
        if rng.random() < AMBIG_FRAC:
            d1[j] = pool[rng.integers(0, n_pool)] + 0.15 * rng.normal(
                size=DESC_DIM
            )
        else:
            u = rng.normal(size=DESC_DIM)
            d1[j] = u / np.linalg.norm(u) + 0.15 * rng.normal(size=DESC_DIM)

    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    return (
        d0.astype(np.float32), xy0,
        d1.astype(np.float32), xy1.astype(np.float32), gt,
    )


def make_batch(rng: np.random.Generator, b: int, n_pool: int = N_POOL):
    cols = [make_pair(rng, n_pool) for _ in range(b)]
    return tuple(np.stack([c[k] for c in cols]) for k in range(5))


# --------------------------------------------------------------- training
def build_net():
    from pyslam_tpu.models.lightglue import LightGlueNet

    return LightGlueNet(dim=DIM, layers=LAYERS, heads=HEADS,
                        input_dim=DESC_DIM)


def loss_fn(net, params, d0, xy0, d1, xy1, gt):
    """LightGlue loss (paper eq. 10) for one pair."""
    c = jnp.array([W / 2, H / 2])
    n0 = (xy0 - c) / jnp.max(c)
    n1 = (xy1 - c) / jnp.max(c)
    m = jnp.ones((N_KPS,), bool)
    scores, _, sig0, sig1 = net.apply(
        params, d0, n0, m, d1, n1, m, return_aux=True
    )
    matched = gt >= 0
    # NLL of the ground-truth assignment
    picked = scores[jnp.arange(N_KPS), jnp.clip(gt, 0)]
    nll = -jnp.sum(jnp.where(matched, picked, 0.0)) / jnp.maximum(
        jnp.sum(matched), 1
    )
    # matchability BCE: matched keypoints (both sides) -> 1, rest -> 0
    tgt0 = matched.astype(jnp.float32)
    tgt1 = jnp.zeros((N_KPS,)).at[jnp.clip(gt, 0)].max(tgt0)
    bce = lambda s, t: -jnp.mean(
        t * jax.nn.log_sigmoid(s) + (1 - t) * jax.nn.log_sigmoid(-s)
    )
    return nll + 0.5 * (bce(sig0, tgt0) + bce(sig1, tgt1))


def train(steps: int = 6000, batch: int = 16, lr: float = 1e-3, seed: int = 0,
          log_every: int = 100):
    import optax

    net = build_net()
    rng = np.random.default_rng(seed)
    params = net.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((N_KPS, DESC_DIM)), jnp.zeros((N_KPS, 2)),
        jnp.ones((N_KPS,), bool),
        jnp.zeros((N_KPS, DESC_DIM)), jnp.zeros((N_KPS, 2)),
        jnp.ones((N_KPS,), bool),
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
    )
    opt_state = opt.init(params)

    batched = jax.vmap(
        functools.partial(loss_fn, net), in_axes=(None, 0, 0, 0, 0, 0)
    )

    @jax.jit
    def step(params, opt_state, d0, xy0, d1, xy1, gt):
        def f(p):
            return jnp.mean(batched(p, d0, xy0, d1, xy1, gt))

        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        # ambiguity curriculum: nearly-unique descriptors first, then pools
        # shrink to the target N_POOL over the first 60% of training
        frac = min(1.0, i / max(1, int(0.6 * steps)))
        n_pool = int(round(64 + (N_POOL - 64) * frac))
        d0, xy0, d1, xy1, gt = make_batch(rng, batch, n_pool)
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(d0), jnp.asarray(xy0), jnp.asarray(d1),
            jnp.asarray(xy1), jnp.asarray(gt),
        )
        if i % log_every == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    return net, params


def evaluate(net, params, n_pairs: int = 30, seed: int = 999,
             threshold: float = 0.1):
    """Held-out precision/recall of mutual-best matches above threshold."""
    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    for _ in range(n_pairs):
        d0, xy0, d1, xy1, gt = make_pair(rng)
        c = np.array([W / 2, H / 2])
        scores, _ = net.apply(
            params,
            jnp.asarray(d0), jnp.asarray((xy0 - c) / c.max()),
            jnp.ones((N_KPS,), bool),
            jnp.asarray(d1), jnp.asarray((xy1 - c) / c.max()),
            jnp.ones((N_KPS,), bool),
        )
        p = np.asarray(jnp.exp(scores))
        best1 = p.argmax(1)
        best0 = p.argmax(0)
        mutual = best0[best1] == np.arange(N_KPS)
        conf = p.max(1)
        pred = np.where(mutual & (conf > threshold), best1, -1)
        for i in range(N_KPS):
            if gt[i] >= 0:
                if pred[i] == gt[i]:
                    tp += 1
                elif pred[i] >= 0:
                    fp += 1
                    fn += 1
                else:
                    fn += 1
            elif pred[i] >= 0:
                fp += 1
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return precision, recall


def nn_baseline(n_pairs: int = 30, seed: int = 999):
    """Mutual-NN descriptor matching on the same pairs (the ambiguity
    control: pool descriptors make this fail)."""
    rng = np.random.default_rng(seed)
    tp = n_gt = n_pred = 0
    for _ in range(n_pairs):
        d0, xy0, d1, xy1, gt = make_pair(rng)
        sim = d0 @ d1.T
        best1 = sim.argmax(1)
        best0 = sim.argmax(0)
        mutual = best0[best1] == np.arange(N_KPS)
        pred = np.where(mutual, best1, -1)
        n_gt += int((gt >= 0).sum())
        n_pred += int((pred >= 0).sum())
        tp += int(((gt >= 0) & (pred == gt)).sum())
    return tp / max(n_pred, 1), tp / max(n_gt, 1)


def save_checkpoint(path: str, params):
    from pyslam_tpu.models.torch_convert import save_variables_npz

    flat = {}

    def flatten(tree, prefix=""):
        for k, v in dict(tree).items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                flatten(dict(v), key)
            else:
                flat[key] = np.asarray(v)

    flatten(dict(params))
    flat["__dim__"] = np.asarray(DIM)
    flat["__layers__"] = np.asarray(LAYERS)
    flat["__heads__"] = np.asarray(HEADS)
    flat["__input_dim__"] = np.asarray(DESC_DIM)
    np.savez_compressed(path, **flat)


def main():
    import os

    net, params = train()
    p, r = evaluate(net, params)
    bp, br = nn_baseline()
    print(f"trained:     precision {p:.3f} recall {r:.3f}")
    print(f"NN baseline: precision {bp:.3f} recall {br:.3f}")
    out = os.path.join(
        os.path.dirname(__file__), "checkpoints", "lightglue_tiny.npz"
    )
    save_checkpoint(out, params)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
