"""SegFormer segmentation family (MiT-B0 encoder + all-MLP decoder).

Third model family behind the registry (BASELINE.json stretch config names
"DeepLabv3+/SegFormer encoder behind the same CLI"). Architecture follows
Xie et al. 2021 (arXiv:2105.15203), laid out TPU-first:

- Mix Transformer encoder, 4 stages: overlapped patch embedding (7x7/s4
  then 3x3/s2 convs), efficient self-attention with spatial-reduction
  ratios (8, 4, 2, 1) so K/V sequence lengths stay MXU-friendly, Mix-FFN
  (dense -> 3x3 depthwise conv -> GELU -> dense), pre-LayerNorm residuals.
- All-MLP decoder: per-stage linear projections to a shared width, bilinear
  upsample to 1/4 resolution, concat, fused 1x1 conv + BN + ReLU,
  classifier, 4x bilinear upsample to input resolution.

Everything is static-shape einsum/conv — attention is three batched matmuls
per block, which XLA tiles straight onto the MXU; there is no KV cache or
dynamic control flow. LayerNorm is stateless, so model `state` carries only
the decoder-fuse BN (the generic train/predict steps work unchanged).

Reference context: the reference hard-codes one torchvision U-Net
(robosat/unet.py); this family plugs in via `model = 'segformer'` in the
model TOML.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from robosat_tpu.models.layers import CONV_DIMS, bn_apply, bn_init, conv_init, init_rng

EMBED_DIMS = (32, 64, 160, 256)
DEPTHS = (2, 2, 2, 2)
NUM_HEADS = (1, 2, 5, 8)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIO = 4
DECODER_DIM = 256
LN_EPS = 1e-6


def _dense_init(rng, cin, cout):
    scale = float(np.sqrt(2.0 / (cin + cout)))
    return {
        "w": (rng.standard_normal((cin, cout)) * scale).astype(np.float32),
        "b": np.zeros((cout,), np.float32),
    }


def _ln_init(c):
    return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}


def _ln(params, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return out * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


def _dense(params, x):
    return x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)


def _conv(params, x, stride=1, padding="SAME", groups=1):
    return lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=CONV_DIMS,
        feature_group_count=groups,
    ) + params.get("b", jnp.zeros((), np.float32)).astype(x.dtype)


def _block_init(rng, dim, heads, sr_ratio):
    p = {
        "ln1": _ln_init(dim),
        "q": _dense_init(rng, dim, dim),
        "kv": _dense_init(rng, dim, 2 * dim),
        "proj": _dense_init(rng, dim, dim),
        "ln2": _ln_init(dim),
        "fc1": _dense_init(rng, dim, MLP_RATIO * dim),
        "dw": {"w": conv_init(rng, 3, 3, 1, MLP_RATIO * dim)["w"], "b": np.zeros((MLP_RATIO * dim,), np.float32)},
        "fc2": _dense_init(rng, MLP_RATIO * dim, dim),
    }
    if sr_ratio > 1:
        p["sr"] = {
            "w": conv_init(rng, sr_ratio, sr_ratio, dim, dim)["w"],
            "b": np.zeros((dim,), np.float32),
        }
        p["sr_ln"] = _ln_init(dim)
    return p


def _block_apply(p, x, heads, sr_ratio):
    """One MiT block on NHWC x; pre-LN attention + Mix-FFN residuals."""
    n, h, w, c = x.shape
    hd = c // heads

    # Efficient self-attention.
    y = _ln(p["ln1"], x)
    q = _dense(p["q"], y).reshape(n, h * w, heads, hd)
    if sr_ratio > 1:
        red = _conv(p["sr"], y, stride=sr_ratio)
        red = _ln(p["sr_ln"], red)
        kv_in = red.reshape(n, -1, c)
    else:
        kv_in = y.reshape(n, h * w, c)
    kv = _dense(p["kv"], kv_in).reshape(n, -1, 2, heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]

    attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (1.0 / np.sqrt(hd))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, h, w, c)
    x = x + _dense(p["proj"], out)

    # Mix-FFN: dense -> 3x3 depthwise -> GELU -> dense.
    y = _ln(p["ln2"], x)
    y = _dense(p["fc1"], y)
    y = _conv(p["dw"], y, groups=y.shape[-1])
    # Exact (erf) GELU — torch nn.GELU's default, and the canonical
    # SegFormer activation (jax defaults to the tanh approximation).
    y = jax.nn.gelu(y, approximate=False)
    y = _dense(p["fc2"], y)
    return x + y


def init(rng, num_classes, in_channels=3):
    """Initialize SegFormer-B0 params and state. Returns (params, state)."""
    rng = init_rng(rng)
    params = {"stages": []}
    cin = in_channels
    for si, dim in enumerate(EMBED_DIMS):
        k, s = (7, 4) if si == 0 else (3, 2)
        stage = {
            "patch": {"w": conv_init(rng, k, k, cin, dim)["w"], "b": np.zeros((dim,), np.float32)},
            "patch_ln": _ln_init(dim),
            "blocks": [_block_init(rng, dim, NUM_HEADS[si], SR_RATIOS[si]) for _ in range(DEPTHS[si])],
            "ln": _ln_init(dim),
        }
        params["stages"].append(stage)
        cin = dim

    params["proj"] = [_dense_init(rng, dim, DECODER_DIM) for dim in EMBED_DIMS]
    params["fuse"] = {"w": conv_init(rng, 1, 1, 4 * DECODER_DIM, DECODER_DIM)["w"]}
    params["fuse_bn"], fuse_bn_state = bn_init(DECODER_DIM)
    params["final"] = {
        "w": conv_init(rng, 1, 1, DECODER_DIM, num_classes)["w"],
        "b": np.zeros((num_classes,), np.float32),
    }
    return params, {"fuse_bn": fuse_bn_state}


def _encode(params, x):
    """The four MiT stages; returns per-stage NHWC features."""
    feats = []
    out = x
    for si, stage in enumerate(params["stages"]):
        k, s = (7, 4) if si == 0 else (3, 2)
        pad = k // 2
        out = _conv(stage["patch"], out, stride=s, padding=((pad, pad), (pad, pad)))
        out = _ln(stage["patch_ln"], out)
        for block in stage["blocks"]:
            out = _block_apply(block, out, NUM_HEADS[si], SR_RATIOS[si])
        out = _ln(stage["ln"], out)
        feats.append(out)
    return feats


def _resize_bilinear(x, h, w):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="bilinear")


def apply(params, state, x, train=False):
    """Forward pass. x: NHWC float (normalized). Returns (logits, new_state)."""
    n, h, w, _ = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32"

    feats = _encode(params, x)
    h4, w4 = feats[0].shape[1], feats[0].shape[2]
    fused = []
    for feat, proj in zip(feats, params["proj"]):
        y = _dense(proj, feat)
        if y.shape[1] != h4:
            y = _resize_bilinear(y, h4, w4)
        fused.append(y)
    out = _conv({"w": params["fuse"]["w"]}, jnp.concatenate(fused, axis=-1))
    out, fuse_bn_state = bn_apply(params["fuse_bn"], state["fuse_bn"], out, train)
    out = jax.nn.relu(out)
    logits = _conv(params["final"], out)
    return _resize_bilinear(logits, h, w), {"fuse_bn": fuse_bn_state}


def predict_quantized_folded(folded, x, overlap=0):
    """Fused binary prediction (margin-then-resize head, like DeepLab's:
    bilinear resize is linear, so only ONE channel is ever upsampled)."""
    from robosat_tpu.ops.head import _digitize_exact

    params, state = folded  # see fold() below
    n, h, w, _ = x.shape
    feats = _encode(params, x)
    h4, w4 = feats[0].shape[1], feats[0].shape[2]
    fused = []
    for feat, proj in zip(feats, params["proj"]):
        y = _dense(proj, feat)
        if y.shape[1] != h4:
            y = _resize_bilinear(y, h4, w4)
        fused.append(y)
    out = _conv({"w": params["fuse"]["w"]}, jnp.concatenate(fused, axis=-1))
    out, _ = bn_apply(params["fuse_bn"], state["fuse_bn"], out, train=False)
    out = jax.nn.relu(out)

    w2 = jnp.asarray(params["final"]["w"]).reshape(DECODER_DIM, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(params["final"]["b"]).reshape(2)
    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)
    margin = jnp.sum(out.astype(jnp.float32) * wm, axis=-1, keepdims=True) + bm
    margin = _resize_bilinear(margin, h, w)[..., 0]
    quantized = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)
    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized


def fold(params, state):
    """SegFormer has a single BN (decoder fuse); keep (params, state) as the
    "folded" tree so the generic predict fast path gets a fused margin head
    via predict_quantized_folded."""
    return (params, state)
