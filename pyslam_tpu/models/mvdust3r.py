"""MV-DUSt3R(+)-class single-stage multi-view reconstruction in flax.

Reference capability: pySLAM ``pyslam/scene_from_views/
scene_from_views_mvdust3r.py`` and ``depth_estimation/
depth_estimator_mvdust3r.py`` (facebookresearch MV-DUSt3R+).  The
published design — one forward pass over ALL views, no pairwise
chaining and no global alignment optimization — rebuilt TPU-native:

  * shared RoPE-2D ViT encoder per view (DUSt3R block family,
    models/dust3r.py);
  * MULTI-VIEW decoder with a designated REFERENCE view: per layer, the
    reference path self-attends then cross-attends into the
    concatenation of all source views' tokens, while the (weight-shared)
    source path cross-attends into the reference + the other sources —
    this all-views token exchange is what replaces DUSt3R's pairwise
    decoder;
  * DUAL heads per view: a GLOBAL pointmap in the reference frame
    (fusion = concatenation) and a LOCAL pointmap in the view's own
    frame; per-view poses are recovered Umeyama-style local->global
    (models/fast3r.py uses the same trick);
  * the "+" variant re-runs with several reference choices and keeps
    the highest-confidence fusion (``num_refs > 1``).

Source views are processed as ONE batched token tensor (vmapped blocks);
cross-attention keys are a single concatenated (V*N, D) sequence.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.dust3r import (DecBlock, EncBlock, rope2d_freqs)


@dataclass(frozen=True)
class MVDust3rConfig:
    img_hw: tuple = (224, 224)
    patch: int = 16
    enc_dim: int = 384
    enc_depth: int = 6
    enc_heads: int = 6
    dec_dim: int = 384
    dec_depth: int = 6
    dec_heads: int = 6


class MVDust3rNet(nn.Module):
    cfg: MVDust3rConfig

    @nn.compact
    def __call__(self, imgs):  # (V, H, W, 3) in [-1, 1]; view 0 = reference
        c = self.cfg
        V = imgs.shape[0]
        h8, w8 = c.img_hw[0] // c.patch, c.img_hw[1] // c.patch
        N = h8 * w8
        ys, xs = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")
        pos = jnp.stack([ys.ravel(), xs.ravel()], 1).astype(jnp.float32)
        cos_e, sin_e = rope2d_freqs(pos, c.enc_dim // c.enc_heads)
        cos_d, sin_d = rope2d_freqs(pos, c.dec_dim // c.dec_heads)

        patchify = nn.Conv(c.enc_dim, (c.patch, c.patch),
                           strides=(c.patch, c.patch), padding="VALID",
                           name="patch_embed")
        t = patchify(imgs).reshape(V, N, c.enc_dim)
        for i in range(c.enc_depth):
            blk = EncBlock(c.enc_dim, c.enc_heads, name=f"enc_{i}")
            t = jax.vmap(lambda x: blk(x, cos_e, sin_e))(t)
        t = nn.LayerNorm(name="enc_norm")(t)

        d = nn.Dense(c.dec_dim, name="decoder_embed")(t)   # (V, N, D)
        # concat RoPE tables for multi-view key sequences
        cos_cat = jnp.tile(cos_d, (V - 1, 1)) if V > 1 else cos_d
        sin_cat = jnp.tile(sin_d, (V - 1, 1)) if V > 1 else sin_d
        for i in range(c.dec_depth):
            ref_blk = DecBlock(c.dec_dim, c.dec_heads, name=f"dec_ref_{i}")
            src_blk = DecBlock(c.dec_dim, c.dec_heads, name=f"dec_src_{i}")
            ref, srcs = d[0], d[1:]
            kv_for_ref = srcs.reshape(-1, c.dec_dim) if V > 1 else ref
            new_ref = ref_blk(ref, kv_for_ref, cos_d, sin_d,
                              cos_cat, sin_cat)

            def one_src(x):
                # every source attends into the reference + ALL sources
                # (itself included — the full token exchange)
                kv = jnp.concatenate([ref, srcs.reshape(-1, c.dec_dim)], 0)
                cos_k = jnp.concatenate([cos_d, cos_cat], 0)
                sin_k = jnp.concatenate([sin_d, sin_cat], 0)
                return src_blk(x, kv, cos_d, sin_d, cos_k, sin_k)

            new_srcs = jax.vmap(one_src)(srcs) if V > 1 else srcs[:0]
            d = jnp.concatenate([new_ref[None], new_srcs], 0)
        d = nn.LayerNorm(name="dec_norm")(d)

        def head(tokens, name):
            out = nn.Dense(c.patch * c.patch * 4, name=name)(tokens)
            out = out.reshape(-1, h8, w8, c.patch, c.patch, 4)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                -1, h8 * c.patch, w8 * c.patch, 4)
            pts = out[..., :3]
            dd = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            pts = pts / jnp.maximum(dd, 1e-8) * jnp.expm1(dd)
            conf = 1.0 + jnp.exp(jnp.clip(out[..., 3], -10, 10))
            return pts, conf

        g_pts, g_conf = head(d, "head_global")   # reference frame
        l_pts, l_conf = head(d, "head_local")    # each view's own frame
        return g_pts, g_conf, l_pts, l_conf


class MVDust3rModel:
    """Multi-view facade; ``num_refs > 1`` = the "+" multi-reference
    fusion (best-confidence reference wins)."""

    def __init__(self, cfg: MVDust3rConfig | None = None,
                 checkpoint: str | None = None, num_refs: int = 1):
        self.cfg = cfg or MVDust3rConfig()
        self.num_refs = num_refs
        self.net = MVDust3rNet(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((2, h, w, 3)))
        if checkpoint:
            from pyslam_tpu.models.torch_convert import load_variables_npz

            self.params = load_variables_npz(checkpoint, self.params)
        self._run = jax.jit(lambda p, x: self.net.apply(p, x))

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        h, w = self.cfg.img_hw
        ys = np.clip((np.arange(h) * img.shape[0] / h).astype(int),
                     0, img.shape[0] - 1)
        xs = np.clip((np.arange(w) * img.shape[1] / w).astype(int),
                     0, img.shape[1] - 1)
        img = img[np.ix_(ys, xs)]
        if img.max() > 2.0:
            img = img / 255.0
        return (img - 0.5) / 0.5

    def infer_views(self, images: list) -> dict:
        """-> dict(points (V,H,W,3) in the ref frame, conf, local_points,
        poses (V,4,4) cam-to-world[ref], ref_index)."""
        V = len(images)
        prepped = [self._prep(im) for im in images]
        best = None
        for r in range(min(self.num_refs, V)):
            order = [r] + [i for i in range(V) if i != r]
            batch = jnp.asarray(np.stack([prepped[i] for i in order]))
            g, gc, l, lc = (np.asarray(o)
                            for o in self._run(self.params, batch))
            mean_conf = float(gc.mean())
            if best is None or mean_conf > best[0]:
                inv = np.argsort(order)
                best = (mean_conf, g[inv], gc[inv], l[inv], lc[inv], r)
        _, g, gc, l, lc, ref = best

        from pyslam_tpu.evaluation.metrics import umeyama_np

        poses = []
        for v in range(V):
            a = l[v].reshape(-1, 3)
            b = g[v].reshape(-1, 3)
            ok = np.isfinite(a).all(1) & np.isfinite(b).all(1)
            try:
                s, R, t = umeyama_np(a[ok], b[ok], with_scale=True)
                T = np.eye(4)
                T[:3, :3] = s * R
                T[:3, 3] = t
            except Exception:
                T = np.eye(4)
            poses.append(T)
        return {"points": g, "conf": gc, "local_points": l,
                "local_conf": lc, "poses": np.stack(poses),
                "ref_index": ref}
