"""LoFTR detector-free coarse-to-fine transformer matcher in flax.

Reference capability: pySLAM's LOFTR tracker preset
(``pyslam/local_features/feature_tracker.py:363`` LoftrFeatureTracker,
wrapping zju3dv/LoFTR via kornia).  Faithful to the published
architecture (LoFTR repo ``src/loftr``):

  * backbone ``ResNetFPN_8_2``: conv7x7/2 stem (grayscale), 3 residual
    stages of 2 BasicBlocks with dims (128, 196, 256) at strides
    (1, 2, 2), FPN top-down with 1x1 lateral + (3x3 conv, BN, LeakyReLU,
    3x3 conv) fusion -> coarse 1/8 (256ch) and fine 1/2 (128ch) maps;
  * sine positional encoding (the 'temp_bug_fix' variant) added to the
    coarse map;
  * ``LocalFeatureTransformer``: ['self','cross'] x 4 LoFTR encoder
    layers with LINEAR attention (elu(x)+1 feature map) — d=256, 8 heads,
    all projections bias-free, LayerNorm after merge and after the
    2d->2d->d MLP on [x ; message];
  * coarse matching: dual-softmax with temperature 0.1, mutual-argmax +
    confidence threshold;
  * fine refinement: 5x5 windows from the fine map around each coarse
    match (both views), optional coarse-context concatenation
    (down_proj 256->128, merge 256->128), one ['self','cross'] fine
    transformer at d=128, then correlation of view-1's center vector
    against view-2's window -> softmax heatmap -> expected (subpixel)
    offset.

The converter maps the official checkpoint keys (``backbone.*``,
``loftr_coarse.layers.N.*``, ``fine_preprocess.*``, ``loftr_fine.*``,
prefix ``matcher.`` stripped).  Twin-parity tested in
``tests/test_loftr.py``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.models.resnet import BN  # torch-style inference BN
from pyslam_tpu.models.torch_convert import _np, _t2f_conv


# ------------------------------------------------------------- backbone FPN
class _Basic(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = nn.relu(BN(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = BN(self.planes, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=False, name="downsample_conv")(x)
            x = BN(self.planes, name="downsample_bn")(x)
        return nn.relu(y + x)


def _up2x(x, like):
    return jax.image.resize(
        x, (x.shape[0], like.shape[1], like.shape[2], x.shape[-1]),
        method="bilinear")


class ResNetFPN_8_2(nn.Module):
    dims: tuple = (128, 196, 256)

    @nn.compact
    def __call__(self, x):  # (B,H,W,1)
        d1, d2, d3 = self.dims
        x0 = nn.Conv(d1, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     use_bias=False, name="conv1")(x)
        x0 = nn.relu(BN(d1, name="bn1")(x0))
        x1 = _Basic(d1, name="layer1_0")(x0)
        x1 = _Basic(d1, name="layer1_1")(x1)          # 1/2
        x2 = _Basic(d2, 2, name="layer2_0")(x1)
        x2 = _Basic(d2, name="layer2_1")(x2)          # 1/4
        x3 = _Basic(d3, 2, name="layer3_0")(x2)
        x3 = _Basic(d3, name="layer3_1")(x3)          # 1/8

        x3_out = nn.Conv(d3, (1, 1), use_bias=False, name="l3_out")(x3)
        x2_lat = nn.Conv(d3, (1, 1), use_bias=False, name="l2_out")(x2)
        y = x2_lat + _up2x(x3_out, x2_lat)
        y = nn.Conv(d3, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="l2_fuse1")(y)
        y = nn.leaky_relu(BN(d3, name="l2_fuse_bn")(y), 0.01)
        x2_out = nn.Conv(d2, (3, 3), padding=[(1, 1), (1, 1)],
                         use_bias=False, name="l2_fuse2")(y)
        x1_lat = nn.Conv(d2, (1, 1), use_bias=False, name="l1_out")(x1)
        y = x1_lat + _up2x(x2_out, x1_lat)
        y = nn.Conv(d2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="l1_fuse1")(y)
        y = nn.leaky_relu(BN(d2, name="l1_fuse_bn")(y), 0.01)
        x1_out = nn.Conv(d1, (3, 3), padding=[(1, 1), (1, 1)],
                         use_bias=False, name="l1_fuse2")(y)
        return x3_out, x1_out  # coarse (1/8, 256), fine (1/2, 128)


# -------------------------------------------------------- positional encode
def sine_pos_encoding(h: int, w: int, d_model: int = 256) -> np.ndarray:
    """LoFTR PositionEncodingSine (temp_bug_fix=True layout)."""
    pe = np.zeros((h, w, d_model), np.float32)
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                 * (-np.log(10000.0) / (d_model // 2)))
    pe[..., 0::4] = np.sin(x[..., None] * div)
    pe[..., 1::4] = np.cos(x[..., None] * div)
    pe[..., 2::4] = np.sin(y[..., None] * div)
    pe[..., 3::4] = np.cos(y[..., None] * div)
    return pe


# ------------------------------------------------------- linear transformer
def _linear_attention(q, k, v, eps=1e-6):
    """(L,H,D) linear attention with elu+1 feature maps (LoFTR)."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    L = v.shape[0]
    v = v / L
    KV = jnp.einsum("shd,shv->hdv", K, v)
    Z = 1.0 / (jnp.einsum("lhd,hd->lh", Q, K.sum(0)) + eps)
    return jnp.einsum("lhd,hdv,lh->lhv", Q, KV, Z) * L


class LoFTREncoderLayer(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, source):
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(source)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj")(source)
        L, S = x.shape[0], source.shape[0]
        m = _linear_attention(q.reshape(L, self.heads, hd),
                              k.reshape(S, self.heads, hd),
                              v.reshape(S, self.heads, hd))
        m = nn.Dense(self.dim, use_bias=False, name="merge")(
            m.reshape(L, self.dim))
        m = nn.LayerNorm(epsilon=1e-5, name="norm1")(m)
        m = jnp.concatenate([x, m], axis=-1)
        m = nn.Dense(2 * self.dim, use_bias=False, name="mlp1")(m)
        m = nn.relu(m)
        m = nn.Dense(self.dim, use_bias=False, name="mlp2")(m)
        m = nn.LayerNorm(epsilon=1e-5, name="norm2")(m)
        return x + m


class LocalFeatureTransformer(nn.Module):
    dim: int
    heads: int
    n_pairs: int  # number of ['self','cross'] pairs

    @nn.compact
    def __call__(self, f1, f2):
        # official LoFTR applies the SAME layer instance to both views, and
        # SEQUENTIALLY: view-2's cross update consumes view-1's UPDATED
        # features (src/loftr/loftr_module/transformer.py forward loop)
        for i in range(self.n_pairs):
            s = LoFTREncoderLayer(self.dim, self.heads, name=f"self_{i}")
            f1 = s(f1, f1)
            f2 = s(f2, f2)
            c = LoFTREncoderLayer(self.dim, self.heads, name=f"cross_{i}")
            f1 = c(f1, f2)
            f2 = c(f2, f1)
        return f1, f2


# --------------------------------------------------------------- full model
@dataclass
class LoFTRConfig:
    img_hw: tuple = (480, 640)
    dims: tuple = (128, 196, 256)
    coarse_layers: int = 4
    fine_layers: int = 1
    heads: int = 8
    temperature: float = 0.1
    conf_threshold: float = 0.2
    fine_window: int = 5
    max_matches: int = 1024


class LoFTRNet(nn.Module):
    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, img1, img2):
        """img: (H,W) grayscale in [0,1].  Returns
        (xy1 (M,2), xy2 (M,2), conf (M,), valid (M,)) at full resolution."""
        c = self.cfg
        H, W = c.img_hw
        hc, wc = H // 8, W // 8
        d_c, d_f = c.dims[2], c.dims[0]

        backbone = ResNetFPN_8_2(c.dims, name="backbone")
        coarse1, fine1 = backbone(img1[None, ..., None])
        coarse2, fine2 = backbone(img2[None, ..., None])
        pe = jnp.asarray(sine_pos_encoding(hc, wc, d_c))
        f1 = (coarse1[0] + pe).reshape(-1, d_c)
        f2 = (coarse2[0] + pe).reshape(-1, d_c)

        f1, f2 = LocalFeatureTransformer(
            d_c, c.heads, c.coarse_layers, name="coarse")(f1, f2)

        # dual-softmax coarse matching
        f1n = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-6)
        f2n = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=1, keepdims=True), 1e-6)
        S = (f1n @ f2n.T) / c.temperature
        P = jax.nn.softmax(S, axis=0) * jax.nn.softmax(S, axis=1)
        nn12 = jnp.argmax(P, axis=1)
        nn21 = jnp.argmax(P, axis=0)
        conf_all = jnp.max(P, axis=1)
        mutual = nn21[nn12] == jnp.arange(P.shape[0])
        ok = mutual & (conf_all > c.conf_threshold)
        score = jnp.where(ok, conf_all, -1.0)
        top_conf, top_i1 = jax.lax.top_k(score, min(c.max_matches, hc * wc))
        top_i2 = nn12[top_i1]
        valid = top_conf > 0

        # fine refinement: 5x5 windows on the 1/2-res fine maps
        Wf = c.fine_window
        scale_cf = 4  # coarse cell = 8 px, fine px = 2 px -> 4 fine cells
        fy1 = (top_i1 // wc) * scale_cf + scale_cf // 2
        fx1 = (top_i1 % wc) * scale_cf + scale_cf // 2
        fy2 = (top_i2 // wc) * scale_cf + scale_cf // 2
        fx2 = (top_i2 % wc) * scale_cf + scale_cf // 2

        def windows(fmap, ys, xs):
            off = jnp.arange(Wf) - Wf // 2
            yy = jnp.clip(ys[:, None, None] + off[None, :, None],
                          0, fmap.shape[0] - 1)
            xx = jnp.clip(xs[:, None, None] + off[None, None, :],
                          0, fmap.shape[1] - 1)
            return fmap[yy, xx]  # (M, Wf, Wf, d_f)

        w1 = windows(fine1[0], fy1, fx1).reshape(-1, Wf * Wf, d_f)
        w2 = windows(fine2[0], fy2, fx2).reshape(-1, Wf * Wf, d_f)

        # concat coarse context (cat_c_feat)
        down = nn.Dense(d_f, use_bias=True, name="down_proj")
        merge = nn.Dense(d_f, use_bias=True, name="merge_feat")
        c1 = down(f1[top_i1])  # (M, d_f)
        c2 = down(f2[top_i2])
        w1 = merge(jnp.concatenate(
            [w1, jnp.broadcast_to(c1[:, None], w1.shape)], -1))
        w2 = merge(jnp.concatenate(
            [w2, jnp.broadcast_to(c2[:, None], w2.shape)], -1))

        FineTr = nn.vmap(
            LocalFeatureTransformer,
            in_axes=(0, 0), out_axes=0,
            variable_axes={"params": None}, split_rngs={"params": False})
        w1, w2 = FineTr(d_f, c.heads, c.fine_layers, name="fine")(w1, w2)

        # expectation over the correlation heatmap (FineMatching)
        center = w1[:, (Wf * Wf) // 2]  # (M, d_f)
        heat = jax.nn.softmax(
            jnp.einsum("md,mwd->mw", center, w2) / (d_f ** 0.5), axis=-1)
        grid = jnp.stack(jnp.meshgrid(jnp.arange(Wf) - Wf // 2,
                                      jnp.arange(Wf) - Wf // 2,
                                      indexing="xy"), -1).reshape(-1, 2)
        delta = heat @ grid.astype(jnp.float32)  # (M,2) in fine px

        xy1 = jnp.stack([fx1, fy1], 1).astype(jnp.float32) * 2.0
        xy2 = (jnp.stack([fx2, fy2], 1).astype(jnp.float32)
               + delta) * 2.0
        return xy1, xy2, top_conf, valid


# ------------------------------------------------------------- converter
def loftr_from_torch(state_dict, params_template):
    """Map official LoFTR checkpoint (``matcher.`` prefix optional)."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[8:] if k.startswith("matcher.") else k] = v

    def bn(base):
        return {"running_mean": _np(sd[f"{base}.running_mean"]),
                "running_var": _np(sd[f"{base}.running_var"]),
                "weight": _np(sd[f"{base}.weight"]),
                "bias": _np(sd[f"{base}.bias"])}

    def conv(base):
        return {"kernel": _t2f_conv(_np(sd[f"{base}.weight"]))}

    def basic(prefix, name, out):
        blk = {"conv1": conv(f"{prefix}.conv1"), "bn1": bn(f"{prefix}.bn1"),
               "conv2": conv(f"{prefix}.conv2"), "bn2": bn(f"{prefix}.bn2")}
        if f"{prefix}.downsample.0.weight" in sd:
            blk["downsample_conv"] = conv(f"{prefix}.downsample.0")
            blk["downsample_bn"] = bn(f"{prefix}.downsample.1")
        out[name] = blk

    bb = {"conv1": conv("backbone.conv1"), "bn1": bn("backbone.bn1")}
    for li in (1, 2, 3):
        for bi in (0, 1):
            basic(f"backbone.layer{li}.{bi}", f"layer{li}_{bi}", bb)
    bb["l3_out"] = conv("backbone.layer3_outconv")
    bb["l2_out"] = conv("backbone.layer2_outconv")
    bb["l2_fuse1"] = conv("backbone.layer2_outconv2.0")
    bb["l2_fuse_bn"] = bn("backbone.layer2_outconv2.1")
    bb["l2_fuse2"] = conv("backbone.layer2_outconv2.3")
    bb["l1_out"] = conv("backbone.layer1_outconv")
    bb["l1_fuse1"] = conv("backbone.layer1_outconv2.0")
    bb["l1_fuse_bn"] = bn("backbone.layer1_outconv2.1")
    bb["l1_fuse2"] = conv("backbone.layer1_outconv2.3")

    def dense_nb(base):  # bias-free linear
        return {"kernel": _np(sd[f"{base}.weight"]).T}

    def enc_layer(prefix):
        return {
            "q_proj": dense_nb(f"{prefix}.q_proj"),
            "k_proj": dense_nb(f"{prefix}.k_proj"),
            "v_proj": dense_nb(f"{prefix}.v_proj"),
            "merge": dense_nb(f"{prefix}.merge"),
            "mlp1": dense_nb(f"{prefix}.mlp.0"),
            "mlp2": dense_nb(f"{prefix}.mlp.2"),
            "norm1": {"scale": _np(sd[f"{prefix}.norm1.weight"]),
                      "bias": _np(sd[f"{prefix}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{prefix}.norm2.weight"]),
                      "bias": _np(sd[f"{prefix}.norm2.bias"])},
        }

    def transformer(prefix, n_pairs):
        out = {}
        for i in range(n_pairs):
            out[f"self_{i}"] = enc_layer(f"{prefix}.layers.{2*i}")
            out[f"cross_{i}"] = enc_layer(f"{prefix}.layers.{2*i+1}")
        return out

    n_coarse = len({k.split(".")[2] for k in sd
                    if k.startswith("loftr_coarse.layers.")}) // 2
    params = {
        "backbone": bb,
        "coarse": transformer("loftr_coarse", n_coarse),
        "fine": transformer("loftr_fine", 1),
        "down_proj": {"kernel": _np(sd["fine_preprocess.down_proj.weight"]).T,
                      "bias": _np(sd["fine_preprocess.down_proj.bias"])},
        "merge_feat": {"kernel": _np(sd["fine_preprocess.merge_feat.weight"]).T,
                       "bias": _np(sd["fine_preprocess.merge_feat.bias"])},
    }
    return {"params": params}


class LoFTRMatcher:
    """Image-pair matcher facade (one jitted dispatch per pair)."""

    def __init__(self, cfg: LoFTRConfig | None = None,
                 checkpoint: str | None = None):
        self.cfg = cfg or LoFTRConfig()
        self.net = LoFTRNet(self.cfg)
        h, w = self.cfg.img_hw
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((h, w)), jnp.zeros((h, w)))
        if checkpoint:
            self.load_checkpoint(checkpoint)
        self._run = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def load_checkpoint(self, path: str):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        self.params = loftr_from_torch(sd, self.params)

    def match_pair(self, img1, img2):
        """uint8/float grayscale -> (xy1, xy2, conf) in input pixels."""
        h1, w1 = np.asarray(img1).shape[:2]
        H, W = self.cfg.img_hw

        def prep(img):
            img = np.asarray(img, np.float32)
            if img.ndim == 3:
                img = img.mean(-1)
            if img.max() > 2.0:
                img = img / 255.0
            ys = np.clip((np.arange(H) * img.shape[0] / H).astype(int),
                         0, img.shape[0] - 1)
            xs = np.clip((np.arange(W) * img.shape[1] / W).astype(int),
                         0, img.shape[1] - 1)
            return jnp.asarray(img[np.ix_(ys, xs)])

        xy1, xy2, conf, valid = self._run(self.params, prep(img1), prep(img2))
        xy1, xy2, conf, valid = map(np.asarray, (xy1, xy2, conf, valid))
        sx, sy = w1 / W, h1 / H
        xy1 = xy1[valid] * [sx, sy]
        xy2 = xy2[valid] * [sx, sy]
        return xy1.astype(np.float32), xy2.astype(np.float32), conf[valid]
