"""DeepLabv3+ segmentation head on the ResNet-50 backbone.

Second model family behind the registry (the "pluggable backbone" stretch goal
in BASELINE.json) — the reference hard-codes one architecture; here
`model = 'deeplabv3plus'` in the model TOML selects this one under the same
train/predict CLI.

Architecture (Chen et al. 2018, arXiv:1802.02611), TPU-first layout:
- backbone at output stride 16 (layer4 stride 1, dilation 2)
- ASPP over the 2048-ch feature map: 1x1 conv, three 3x3 convs dilated
  (6, 12, 18), and a global-pool image branch; concat -> 1x1 conv to 256
- decoder: 4x upsample, concat with the 1x1-projected (48 ch) low-level
  enc1 features, two 3x3 convs at 256, 1x1 classifier, 4x upsample to input.

All convs bias-free + BN + ReLU; NHWC; bilinear upsampling via
jax.image.resize traces into the jitted step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from robosat_tpu.models import resnet
from robosat_tpu.models.layers import bn_apply, bn_init, conv_apply, conv_init, init_rng

ASPP_RATES = (6, 12, 18)
ASPP_CH = 256
LOWLEVEL_CH = 48


def _cbr_init(rng, k, cin, cout):
    conv = conv_init(rng, k, k, cin, cout)
    bn_p, bn_s = bn_init(cout)
    return {"conv": conv, "bn": bn_p}, {"bn": bn_s}


def _cbr_apply(params, state, x, train, dilation=1):
    out = conv_apply(params["conv"], x, stride=1, dilation=dilation)
    out, bn_s = bn_apply(params["bn"], state["bn"], out, train)
    return jax.nn.relu(out), {"bn": bn_s}


def init(rng, num_classes, in_channels=3):
    """Initialize DeepLabv3+ params and state. Returns (params, state)."""
    rng = init_rng(rng)
    enc_params, enc_state = resnet.init(rng, in_channels=in_channels)

    params = {"encoder": enc_params}
    state = {"encoder": enc_state}

    # ASPP branches over 2048 channels.
    params["aspp1"], state["aspp1"] = _cbr_init(rng, 1, 2048, ASPP_CH)
    for i, _ in enumerate(ASPP_RATES):
        params["aspp_d{}".format(i)], state["aspp_d{}".format(i)] = _cbr_init(rng, 3, 2048, ASPP_CH)
    params["aspp_pool"], state["aspp_pool"] = _cbr_init(rng, 1, 2048, ASPP_CH)
    params["aspp_proj"], state["aspp_proj"] = _cbr_init(rng, 1, ASPP_CH * (2 + len(ASPP_RATES)), ASPP_CH)

    # Decoder.
    params["lowlevel"], state["lowlevel"] = _cbr_init(rng, 1, 256, LOWLEVEL_CH)
    params["dec1"], state["dec1"] = _cbr_init(rng, 3, ASPP_CH + LOWLEVEL_CH, ASPP_CH)
    params["dec2"], state["dec2"] = _cbr_init(rng, 3, ASPP_CH, ASPP_CH)
    params["final"] = {
        "w": conv_init(rng, 1, 1, ASPP_CH, num_classes)["w"],
        "b": np.zeros((num_classes,), np.float32),
    }
    return params, state


def _resize_bilinear(x, h, w):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="bilinear")


def apply(params, state, x, train=False):
    """Forward pass. x: NHWC float (normalized). Returns (logits, new_state)."""
    n, h, w, _ = x.shape
    assert h % 16 == 0 and w % 16 == 0, "image resolution has to be divisible by 16"

    new_state = {}
    (enc1, _, _, enc4), new_state["encoder"] = resnet.apply(
        params["encoder"], state["encoder"], x, train, dilate_last_stage=True
    )

    # ASPP.
    branches = []
    out, new_state["aspp1"] = _cbr_apply(params["aspp1"], state["aspp1"], enc4, train)
    branches.append(out)
    for i, rate in enumerate(ASPP_RATES):
        key = "aspp_d{}".format(i)
        out, new_state[key] = _cbr_apply(params[key], state[key], enc4, train, dilation=rate)
        branches.append(out)

    pooled = jnp.mean(enc4, axis=(1, 2), keepdims=True)
    pooled, new_state["aspp_pool"] = _cbr_apply(params["aspp_pool"], state["aspp_pool"], pooled, train)
    branches.append(jnp.broadcast_to(pooled, branches[0].shape))

    aspp, new_state["aspp_proj"] = _cbr_apply(
        params["aspp_proj"], state["aspp_proj"], jnp.concatenate(branches, axis=-1), train
    )

    # Decoder: 4x up to enc1 resolution, fuse low-level features.
    low, new_state["lowlevel"] = _cbr_apply(params["lowlevel"], state["lowlevel"], enc1, train)
    up = _resize_bilinear(aspp, low.shape[1], low.shape[2])

    out = jnp.concatenate([up, low], axis=-1)
    out, new_state["dec1"] = _cbr_apply(params["dec1"], state["dec1"], out, train)
    out, new_state["dec2"] = _cbr_apply(params["dec2"], state["dec2"], out, train)

    logits = conv_apply({"w": params["final"]["w"]}, out, stride=1) + params["final"]["b"].astype(out.dtype)
    return _resize_bilinear(logits, h, w), new_state


# ---------------------------------------------------------------------------
# Inference fast path: BN-folded forward + fused margin head
# ---------------------------------------------------------------------------


def fold(params, state):
    """Fold every batch norm into its conv for inference."""
    from robosat_tpu.models.layers import fold_conv_bn

    folded = {"encoder": resnet.fold(params["encoder"], state["encoder"])}
    for key in list(params):
        if key in ("encoder", "final"):
            continue
        folded[key] = fold_conv_bn(params[key]["conv"], params[key]["bn"], state[key]["bn"])
    folded["final"] = dict(params["final"])
    return folded


def _cbr_folded(node, x, dilation=1):
    from robosat_tpu.models.layers import conv_bias_apply

    return jax.nn.relu(conv_bias_apply(node, x, stride=1, dilation=dilation))


def _decoder_folded(folded, x):
    """Shared folded trunk up to the pre-classifier 256-ch features (1/4 res)."""
    enc1, _, _, enc4 = resnet.apply_folded(folded["encoder"], x, dilate_last_stage=True)

    branches = [_cbr_folded(folded["aspp1"], enc4)]
    for i, rate in enumerate(ASPP_RATES):
        branches.append(_cbr_folded(folded["aspp_d{}".format(i)], enc4, dilation=rate))
    pooled = _cbr_folded(folded["aspp_pool"], jnp.mean(enc4, axis=(1, 2), keepdims=True))
    branches.append(jnp.broadcast_to(pooled, branches[0].shape))
    aspp = _cbr_folded(folded["aspp_proj"], jnp.concatenate(branches, axis=-1))

    low = _cbr_folded(folded["lowlevel"], enc1)
    up = _resize_bilinear(aspp, low.shape[1], low.shape[2])
    out = _cbr_folded(folded["dec1"], jnp.concatenate([up, low], axis=-1))
    return _cbr_folded(folded["dec2"], out)


def apply_folded(folded, x):
    """BN-free inference forward; returns full-resolution logits."""
    n, h, w, _ = x.shape
    out = _decoder_folded(folded, x)
    logits = conv_apply({"w": folded["final"]["w"]}, out, stride=1) + folded["final"]["b"].astype(out.dtype)
    return _resize_bilinear(logits, h, w)


def predict_quantized_folded(folded, x, overlap=0):
    """Fused binary prediction: margin at 1/4 resolution, bilinear to full.

    The reference order is resize(logits) -> softmax; since bilinear resize
    is linear, resize(l1) - resize(l0) == resize(l1 - l0), so the 256->2
    classifier collapses to a 256->1 margin reduction at LOW resolution and
    only one channel is ever upsampled — the full-res 2-channel logit
    buffer (which XLA lane-pads 64x) never exists. Numerically identical
    to softmax_quantize(apply_folded(...)) up to fp rounding.
    """
    from robosat_tpu.ops.head import _digitize_exact

    n, h, w, _ = x.shape
    out = _decoder_folded(folded, x)

    w2 = jnp.asarray(folded["final"]["w"]).reshape(ASPP_CH, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(folded["final"]["b"]).reshape(2)
    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)

    margin = jnp.sum(out.astype(jnp.float32) * wm, axis=-1, keepdims=True) + bm
    margin = _resize_bilinear(margin, h, w)[..., 0]
    quantized = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)
    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized


# ---------------------------------------------------------------------------
# Hybrid int8 inference (the U-Net treatment, docs/PERF.md): bf16 stem +
# pool/low-level/head, int8 bottleneck stacks + ASPP + decoder convs.
# ---------------------------------------------------------------------------


def quantize_folded_int8(folded, act_amaxes=None):
    """BN-folded DeepLab params -> hybrid int8 tree: backbone bottlenecks,
    ASPP branches/projection, and decoder convs quantized per-output-channel;
    stem, ASPP pool branch, low-level projection, and classifier stay float
    (tiny or narrow — lane-padding erases the int8 win there).

    `act_amaxes` ("pc" calibration): per-site per-input-channel activation
    range vectors; balanced fold scales bake into the kernels
    (int8.ScaleCursor) and the function returns (qtree, scale_vectors).
    Consumption follows _walk_int8's conv-site order exactly: encoder
    stages, aspp1, aspp_d{i}, aspp_proj, dec1, dec2."""
    from robosat_tpu.models import int8 as q8

    cursor = q8.ScaleCursor(act_amaxes)
    q = {"encoder": q8.quantize_encoder_stages(folded["encoder"], cursor)}
    q["aspp1"] = q8._qconv_pc(folded["aspp1"], cursor)
    for i, _ in enumerate(ASPP_RATES):
        q["aspp_d{}".format(i)] = q8._qconv_pc(folded["aspp_d{}".format(i)], cursor)
    q["aspp_proj"] = q8._qconv_pc(folded["aspp_proj"], cursor)
    q["dec1"] = q8._qconv_pc(folded["dec1"], cursor)
    q["dec2"] = q8._qconv_pc(folded["dec2"], cursor)
    cursor.assert_done()
    for key in ("aspp_pool", "lowlevel", "final"):
        q[key] = dict(folded[key])
    if act_amaxes is not None:
        return q, cursor.out_scales
    return q


def _walk_int8(q, x, sites, compute_dtype, float_mode=False, blocked=False):
    """Shared int8/calibration walk to the pre-classifier 256-ch features.

    Mirrors _decoder_folded exactly; `sites` consumes conv sites positionally
    (calibration and inference MUST walk in the same order). With `blocked`,
    x is 4x4 space-to-depth normalized input and the stem runs in its
    MXU-wide s2d form (robosat_tpu.models.resnet.stem_folded_s2d4)."""
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models.layers import conv_bias_apply, max_pool
    from robosat_tpu.models.resnet import stem_folded_s2d4

    relu = jax.nn.relu

    def conv(node, xx, stride=1, dilation=1, padding="SAME"):
        scale = sites.next_scale(xx)
        if float_mode:
            return conv_bias_apply(node, xx, stride=stride, dilation=dilation, padding=padding)
        return q8._int8_conv(
            node, xx, scale, stride=stride, dilation=dilation, padding=padding, compute_dtype=compute_dtype
        )

    if blocked:
        out = stem_folded_s2d4(q["encoder"]["conv1"], x)
    else:
        out = relu(conv_bias_apply(q["encoder"]["conv1"], x, stride=2, padding=((3, 3), (3, 3))))
        out = max_pool(out, window=3, stride=2, padding=1)

    enc1, _, _, enc4 = q8.walk_encoder(q["encoder"], out, conv, dilate_last_stage=True)

    branches = [relu(conv(q["aspp1"], enc4))]
    for i, rate in enumerate(ASPP_RATES):
        branches.append(relu(conv(q["aspp_d{}".format(i)], enc4, dilation=rate)))
    pooled = relu(conv_bias_apply(q["aspp_pool"], jnp.mean(enc4, axis=(1, 2), keepdims=True)))
    branches.append(jnp.broadcast_to(pooled.astype(branches[0].dtype), branches[0].shape))
    aspp = relu(conv(q["aspp_proj"], jnp.concatenate(branches, axis=-1)))

    low = relu(conv_bias_apply(q["lowlevel"], enc1))
    up = _resize_bilinear(aspp, low.shape[1], low.shape[2]).astype(low.dtype)
    out = relu(conv(q["dec1"], jnp.concatenate([up, low], axis=-1)))
    return relu(conv(q["dec2"], out))


def calibration_amaxes_int8(folded, x, compute_dtype=jnp.float32, blocked=False, percentile=None):
    """Per-conv-site input amaxes (or percentiles) from one float forward
    (jit with real imagery); indexes sites positionally like
    predict_quantized_int8."""
    from robosat_tpu.models import int8 as q8

    sites = q8._Sites(scales=None, percentile=percentile)
    _walk_int8(folded, x.astype(compute_dtype), sites, compute_dtype, float_mode=True, blocked=blocked)
    if q8.is_per_channel(percentile):
        return [t.astype(jnp.float32) for t in sites.taps]
    return jnp.stack(sites.taps).astype(jnp.float32)


def predict_quantized_int8(qtree, scales, x, overlap=0, compute_dtype=jnp.bfloat16, blocked=False):
    """Hybrid-int8 fused binary prediction (margin-then-resize head, same
    numerics as predict_quantized_folded on the quantized graph)."""
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.ops.head import _digitize_exact

    n = x.shape[0]
    h, w = (4 * x.shape[1], 4 * x.shape[2]) if blocked else (x.shape[1], x.shape[2])
    sites = q8._Sites(scales=list(scales))
    out = _walk_int8(qtree, x, sites, compute_dtype, blocked=blocked)
    assert sites.idx == len(list(scales)), "conv-site count mismatch with calibration"

    w2 = jnp.asarray(qtree["final"]["w"]).reshape(ASPP_CH, -1)
    b2 = jnp.asarray(qtree["final"]["b"]).reshape(2)
    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)
    margin = jnp.sum(out.astype(jnp.float32) * wm, axis=-1, keepdims=True) + bm
    margin = _resize_bilinear(margin, h, w)[..., 0]
    quantized = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)
    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized
