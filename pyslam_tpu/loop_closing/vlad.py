"""VLAD global descriptor over local binary descriptors (pure JAX).

TPU-native equivalent of the reference's custom VLAD implementation (pySLAM
``pyslam/loop_closing/vlad.py``, 469 LoC numpy/faiss): K cluster centers over
descriptor space; the image descriptor is the concatenation over clusters of
the summed residuals (descriptor - center) of the descriptors assigned to
that cluster, intra-normalized per cluster (power/L2) then globally
L2-normalized.  Assignment is one (N,K) distance matmul on the MXU; residual
aggregation is a one-hot matmul instead of scatter — everything jits.

Also provides the weight-free SAD global descriptor (downsampled, locally
normalized image; reference ``loop_detector_vpr.py`` SAD backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(desc: jnp.ndarray, centers: jnp.ndarray, k: int):
    """desc (N,D) float, centers (K,D) -> (N,) nearest center ids."""
    # |d - c|^2 = |d|^2 - 2 d.c + |c|^2 ; argmin over c drops |d|^2
    dots = desc @ centers.T                        # (N,K) MXU
    c2 = jnp.sum(centers * centers, axis=1)
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def vlad_descriptor(desc: jnp.ndarray, valid: jnp.ndarray,
                    centers: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N,D) local descriptors -> (K*D,) VLAD vector."""
    desc = desc.astype(jnp.float32)
    assign = _assign(desc, centers, k)             # (N,)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (N,K)
    onehot = onehot * valid.astype(jnp.float32)[:, None]
    # residual sum per cluster: sum_n onehot[n,k] * (desc[n] - centers[k])
    sums = onehot.T @ desc                         # (K,D) MXU
    counts = jnp.sum(onehot, axis=0)               # (K,)
    res = sums - counts[:, None] * centers
    # intra-normalization (per-cluster L2) then global L2
    res = res / jnp.maximum(jnp.linalg.norm(res, axis=1, keepdims=True), 1e-12)
    res = jnp.where(counts[:, None] > 0, res, 0.0)
    v = res.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans(desc: jnp.ndarray, init: jnp.ndarray, k: int, iters: int):
    def step(centers, _):
        assign = _assign(desc, centers, k)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        sums = onehot.T @ desc
        counts = jnp.sum(onehot, axis=0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
                        centers)
        return new, None

    centers, _ = jax.lax.scan(step, init, None, length=iters)
    return centers


class VladVocabulary:
    """K-center vocabulary with on-session training (the reference trains
    VLAD vocabularies offline from dataset descriptors; here the first
    ``train_after`` keyframes' descriptors seed kmeans — same idea as the
    SESSION_TRAINED BoW mode)."""

    def __init__(self, num_clusters: int = 64, seed: int = 5,
                 train_after: int = 4):
        self.k = num_clusters
        self.train_after = train_after
        self._buffer: list[np.ndarray] = []
        self._rng = np.random.default_rng(seed)
        self.centers: np.ndarray | None = None
        # deterministic procedural init (random bit-vectors) so descriptors
        # are well-defined even before training
        self._init_centers = self._rng.uniform(0, 1, None)

    @property
    def trained(self) -> bool:
        return self.centers is not None

    def consume_just_trained(self) -> bool:
        """True exactly once, right after training fires (callers use it to
        re-describe keyframes stored with the pre-training placeholder)."""
        jt = getattr(self, "_just_trained", False)
        self._just_trained = False
        return jt

    def maybe_train(self, desc: np.ndarray):
        """Accumulate descriptors; train once enough keyframes were seen."""
        if self.trained:
            return
        self._buffer.append(np.asarray(desc, np.float32))
        if len(self._buffer) >= self.train_after:
            data = np.concatenate(self._buffer, axis=0)
            sel = self._rng.choice(len(data), size=min(self.k, len(data)),
                                   replace=False)
            init = jnp.asarray(data[sel], jnp.float32)
            if len(sel) < self.k:  # degenerate tiny session
                pad = jnp.tile(init[:1], (self.k - len(sel), 1))
                init = jnp.concatenate([init, pad], axis=0)
            self.centers = np.asarray(
                _kmeans(jnp.asarray(data), init, self.k, 8)
            )
            self._buffer.clear()
            self._just_trained = True

    def global_descriptor(self, desc, valid) -> np.ndarray:
        desc = np.asarray(desc, np.float32)
        if not self.trained:
            self.maybe_train(desc[np.asarray(valid)])
        if not self.trained:
            # pre-training placeholder at FULL VLAD dimensionality (k*D):
            # normalized mean descriptor in cluster-0's slot, zeros elsewhere
            # — keyframes stored with this are re-described via
            # consume_just_trained() once the vocabulary exists
            v = desc[np.asarray(valid)].mean(axis=0) if valid.any() else desc.mean(0)
            n = np.linalg.norm(v)
            out = np.zeros((self.k * desc.shape[1],), np.float32)
            out[: desc.shape[1]] = v / n if n > 0 else v
            return out
        return np.asarray(
            vlad_descriptor(
                jnp.asarray(desc), jnp.asarray(valid),
                jnp.asarray(self.centers), self.k,
            )
        )

    # ------------------------------------------------------------ serialize
    def to_json(self):
        return {
            "k": self.k,
            "centers": None if self.centers is None else self.centers.tolist(),
        }

    @staticmethod
    def from_json(d):
        v = VladVocabulary(num_clusters=d["k"])
        if d.get("centers") is not None:
            v.centers = np.asarray(d["centers"], np.float32)
        return v


@jax.jit
def sad_descriptor(img: jnp.ndarray) -> jnp.ndarray:
    """Weight-free SAD global descriptor (reference ``loop_detector_vpr.py``
    SAD backend): downsample to 64x64 via average pooling, patch-normalize,
    flatten, L2-normalize.  Similarity = dot product (monotone in -SAD for
    normalized vectors)."""
    h, w = img.shape
    gh, gw = 64, 64
    ph, pw = max(h // gh, 1), max(w // gw, 1)
    x = img[: ph * gh, : pw * gw].reshape(gh, ph, gw, pw).mean(axis=(1, 3))
    x = (x - jnp.mean(x)) / jnp.maximum(jnp.std(x), 1e-6)
    v = x.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
