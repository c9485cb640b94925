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

# Input sides must survive /4 (patch embed) then three /2 stages (and the
# host-blocked int8 path's 4x4 space-to-depth).
SIDE_MULTIPLE = 32

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


def _block_walk(p, x, heads, sr_ratio, dense, conv):
    """One MiT block on NHWC x with pluggable dense/conv ops (float path and
    the hybrid-int8 walk share this topology so calibration sites line up
    positionally); pre-LN attention + Mix-FFN residuals.

    `dense(node, x)` / `conv(node, x, stride=, groups=)` return the op
    output (bias included); LayerNorm, softmax, residuals and GELU stay out
    here in float/compute dtype.
    """
    n, h, w, c = x.shape
    hd = c // heads

    # Efficient self-attention.
    y = _ln(p["ln1"], x)
    q = dense(p["q"], y).reshape(n, h * w, heads, hd)
    if sr_ratio > 1:
        red = conv(p["sr"], y, stride=sr_ratio)
        red = _ln(p["sr_ln"], red)
        kv_in = red.reshape(n, -1, c)
    else:
        kv_in = y.reshape(n, h * w, c)
    kv = dense(p["kv"], kv_in).reshape(n, -1, 2, heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]

    attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (1.0 / np.sqrt(hd))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, h, w, c)
    x = x + dense(p["proj"], out)

    # Mix-FFN: dense -> 3x3 depthwise -> GELU -> dense.
    y = _ln(p["ln2"], x)
    y = dense(p["fc1"], y)
    y = conv(p["dw"], y, groups=y.shape[-1])
    # Exact (erf) GELU — torch nn.GELU's default, and the canonical
    # SegFormer activation (jax defaults to the tanh approximation).
    y = jax.nn.gelu(y, approximate=False)
    y = dense(p["fc2"], y)
    return x + y


def _block_apply(p, x, heads, sr_ratio):
    """One MiT block on NHWC x; pre-LN attention + Mix-FFN residuals."""
    return _block_walk(p, x, heads, sr_ratio, _dense, _conv)


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


# ---------------------------------------------------------------------------
# Hybrid int8 datapath (the model-owned protocol, like models/deeplab.py and
# models/fastnet.py). What quantizes and what stays float, by op economics:
#
# - The Q/KV/proj/FC1/FC2 dense layers and the spatial-reduction + stage 1-3
#   patch-embed convs carry ~95% of the MACs and are all >=32-lane matmuls
#   the MXU runs at 2.3x in int8 (docs/PERF.md round 2) — quantized, with
#   per-output-channel weight scales and static per-site activation scales.
#   Every quantized input is post-LayerNorm, post-GELU, or an attention
#   average, so per-tensor amax calibration is well-conditioned.
# - The attention matmuls (q@k, attn@v) stay bf16: their inputs change per
#   head and the softmax output wastes int8 range (values in [0,1] with mass
#   near 0); at SR ratios (8,4,2,1) they are <5% of model MACs.
# - The 3x3 depthwise conv is VPU-bound (no contraction): int8 buys nothing.
# - The stage-0 patch embed is a 3-input-channel 7x7 — im2col-bound like the
#   U-Net stem, kept float; with `blocked` input it runs as one MXU-wide 2x2
#   conv over the 48-channel space-to-depth grid (_patch0_s2d4_kernel).
# - LayerNorm, softmax, residual adds, bilinear resizes, and the margin head
#   stay float/compute-dtype.
# ---------------------------------------------------------------------------


def _patch0_s2d4_kernel(w7):
    """Stage-0 patch kernel (7, 7, Cin, C) -> its 4x4-space-to-depth form
    (2, 2, 16*Cin, C): the stride-4 pad-3 fine conv becomes a stride-1 conv
    over the blocked grid reading blocks {I-1, I} (fine tap t = 4*(B-I) +
    er + 3, kept when 0 <= t <= 6). Same slot-major channel layout as
    layers.stem_s2d4_kernel; `padding=((1, 0), (1, 0))` at apply time."""
    kh, kw, cin, cout = w7.shape
    assert kh == 7 and kw == 7, "rewrite is specific to the 7x7/s4 patch embed"
    w7p = jnp.pad(jnp.asarray(w7), ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 7 reads zeros
    t_map = np.full((2, 2, 16), 7)
    s_map = np.full((2, 2, 16), 7)
    for bi, boff in enumerate((-1, 0)):
        for bj, coff in enumerate((-1, 0)):
            for er in range(4):
                for ec in range(4):
                    t = 4 * boff + er + 3
                    s = 4 * coff + ec + 3
                    if 0 <= t <= 6 and 0 <= s <= 6:
                        t_map[bi, bj, er * 4 + ec] = t
                        s_map[bi, bj, er * 4 + ec] = s
    return w7p[t_map, s_map].reshape(2, 2, 16 * cin, cout)


def _patch0_apply(patch, x, blocked):
    """The float stage-0 patch embed, fine or host-blocked layout."""
    if not blocked:
        return _conv(patch, x, stride=4, padding=((3, 3), (3, 3)))
    k = _patch0_s2d4_kernel(patch["w"])
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 0), (1, 0)), dimension_numbers=CONV_DIMS
    ) + patch["b"].astype(x.dtype)


def _qdense(node):
    """Float dense {"w": (Cin, Cout), "b"} -> int8 {"wq", "ws", "b"} with
    per-output-channel weight scales."""
    w = jnp.asarray(node["w"], jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    return {"wq": wq, "ws": ws, "b": jnp.asarray(node["b"], jnp.float32)}


def _int8_dense(node, x, scale, compute_dtype=jnp.bfloat16):
    """Quantize x with the static `scale`, int8 matmul on the MXU (int32
    accumulate), dequant + bias — the dense twin of int8._int8_conv."""
    from robosat_tpu.models.int8 import _quantize_act

    xq = _quantize_act(x, scale)
    acc = lax.dot_general(
        xq, node["wq"], (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (node["ws"] * scale) + node["b"]
    return y.astype(compute_dtype)


def quantize_folded_int8(folded):
    """(params, state) -> hybrid int8 tree: stage 1-3 patch convs, SR convs,
    and all attention/FFN/decoder dense layers quantized per-output-channel;
    the fuse BN folds into its 1x1 conv; stage-0 patch, depthwise convs,
    LayerNorms, and the classifier head stay float."""
    from robosat_tpu.models.int8 import _qconv
    from robosat_tpu.models.layers import fold_conv_bn

    params, state = folded
    q = {"stages": []}
    for si, stage in enumerate(params["stages"]):
        qs = {
            "patch": dict(stage["patch"]) if si == 0 else _qconv(stage["patch"]),
            "patch_ln": dict(stage["patch_ln"]),
            "ln": dict(stage["ln"]),
            "blocks": [],
        }
        for block in stage["blocks"]:
            qb = {
                "ln1": dict(block["ln1"]),
                "ln2": dict(block["ln2"]),
                "dw": dict(block["dw"]),
            }
            for name in ("q", "kv", "proj", "fc1", "fc2"):
                qb[name] = _qdense(block[name])
            if "sr" in block:
                qb["sr"] = _qconv(block["sr"])
                qb["sr_ln"] = dict(block["sr_ln"])
            qs["blocks"].append(qb)
        q["stages"].append(qs)
    q["proj"] = [_qdense(p) for p in params["proj"]]
    q["fuse"] = _qconv(fold_conv_bn({"w": params["fuse"]["w"]}, params["fuse_bn"], state["fuse_bn"]))
    q["final"] = {"w": jnp.asarray(params["final"]["w"]), "b": jnp.asarray(params["final"]["b"])}
    return q


def _walk_int8(tree, x, sites, compute_dtype, float_mode=False, blocked=False):
    """Shared int8/calibration walk to the pre-classifier 256-ch fused
    features (post fuse conv + ReLU, 1/4 resolution).

    In float_mode `tree` is a FLAT float tree shaped like the int8 one (the
    fuse BN already folded — _float_tree_for_calibration); conv sites are
    visited in one fixed order so the amax vector indexes positionally.
    """
    from robosat_tpu.models.int8 import _int8_conv

    def dense(node, xx):
        scale = sites.next_scale(xx)
        if float_mode:
            return _dense(node, xx)
        return _int8_dense(node, xx, scale, compute_dtype=compute_dtype)

    def conv(node, xx, stride=1, padding="SAME", groups=1):
        if groups > 1:  # depthwise Mix-FFN conv: VPU-bound, stays float, no site
            return _conv(node, xx, stride=stride, padding=padding, groups=groups)
        scale = sites.next_scale(xx)
        if float_mode:
            return _conv(node, xx, stride=stride, padding=padding)
        return _int8_conv(node, xx, scale, stride=stride, padding=padding, compute_dtype=compute_dtype)

    feats = []
    out = x
    for si, stage in enumerate(tree["stages"]):
        if si == 0:
            out = _patch0_apply(stage["patch"], out, blocked)
        else:
            out = conv(stage["patch"], out, stride=2, padding=((1, 1), (1, 1)))
        out = _ln(stage["patch_ln"], out)
        for block in stage["blocks"]:
            out = _block_walk(block, out, NUM_HEADS[si], SR_RATIOS[si], dense, conv)
        out = _ln(stage["ln"], out)
        feats.append(out)

    h4, w4 = feats[0].shape[1], feats[0].shape[2]
    fused = []
    for feat, proj in zip(feats, tree["proj"]):
        y = dense(proj, feat)
        if y.shape[1] != h4:
            y = _resize_bilinear(y, h4, w4)
        fused.append(y)
    cat = jnp.concatenate(fused, axis=-1)
    out = conv(tree["fuse"], cat)
    return jax.nn.relu(out)


def _float_tree_for_calibration(folded):
    """(params, state) -> flat float tree with the fuse BN folded, shaped
    like quantize_folded_int8's output so both walks visit the same sites."""
    from robosat_tpu.models.layers import fold_conv_bn

    params, state = folded
    tree = {
        "stages": params["stages"],
        "proj": params["proj"],
        "fuse": fold_conv_bn({"w": params["fuse"]["w"]}, params["fuse_bn"], state["fuse_bn"]),
        "final": params["final"],
    }
    return tree


def calibration_amaxes_int8(folded, x, compute_dtype=jnp.float32, blocked=False, percentile=None):
    """Per-site input amaxes (or |x| percentiles) from one float forward;
    site order matches predict_quantized_int8. `x` is normalized input —
    fine (N, H, W, 3), or 4x4 space-to-depth (N, H/4, W/4, 48) with
    `blocked`."""
    from robosat_tpu.models.int8 import _Sites

    sites = _Sites(scales=None, percentile=percentile)
    _walk_int8(
        _float_tree_for_calibration(folded), x.astype(compute_dtype), sites, compute_dtype,
        float_mode=True, blocked=blocked,
    )
    return jnp.stack(sites.taps).astype(jnp.float32)


def predict_quantized_int8(qtree, scales, x, overlap=0, compute_dtype=jnp.bfloat16, blocked=False):
    """Hybrid-int8 fused binary prediction (margin-then-resize head, same
    algebra as predict_quantized_folded). `x` is normalized — 4x4
    host-blocked (N, H/4, W/4, 48) with `blocked`, else fine; output is fine
    uint8 (N, H-2o, W-2o) either way (one channel upsamples, so the fine
    grid exists only for the uint8 margin)."""
    from robosat_tpu.models.int8 import _Sites
    from robosat_tpu.ops.head import _digitize_exact

    n = x.shape[0]
    h, w = (x.shape[1] * 4, x.shape[2] * 4) if blocked else (x.shape[1], x.shape[2])
    sites = _Sites(scales=list(scales))
    out = _walk_int8(qtree, x, sites, compute_dtype, blocked=blocked)
    assert sites.idx == len(list(scales)), "conv-site count mismatch with calibration"

    w2 = jnp.asarray(qtree["final"]["w"]).reshape(DECODER_DIM, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(qtree["final"]["b"]).reshape(2)
    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)
    margin = jnp.sum(out.astype(jnp.float32) * wm, axis=-1, keepdims=True) + bm
    margin = _resize_bilinear(margin, h, w)[..., 0]
    quantized = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)
    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized
