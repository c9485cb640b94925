"""FastNet — the compact TPU-first prediction architecture ("fast" family).

Why this exists: the flagship U-Net (exact reference parity,
robosat/unet.py:76-141) measures an architectural floor of ~2,700 tiles/s on
this chip — every formulation/kernel variant was A/B'd in rounds 2-3
(docs/PERF.md) and the 5,000 tiles/s north star is unreachable without a
smaller prediction graph. FastNet is that graph: a from-scratch encoder/
decoder designed around the measured per-op economics of this TPU, meant to
be DISTILLED from a trained flagship model (`rs train --teacher ...`) and
shipped as an opt-in `model = "fast"` in the model TOML. The parity-exact
flagship stays the default.

Design rules, each one backed by a measured round-2/3 number:

- Every activation is >= 128 channels (one TPU lane register), at 1/4
  resolution or below: the flagship loses ~2x on its 64-channel layer1
  buffers and ran its fine 32-channel tail 3.6x slower before the s2d
  rewrite (docs/PERF.md).
- The input is consumed 4x4 space-to-depth (layers.space_to_depth4): the
  3-channel 7x7 stem is im2col-bound (<8 of ~130 TFLOPs); a 3x3 conv over
  48 blocked channels runs near MXU speed. In `rs predict` the blocking is
  a free numpy reshape in the loader workers; in training it traces as one
  in-graph transpose (~1% of the step).
- The OUTPUT stays on the 1/4 grid: the head is a learned 4x sub-pixel
  (pixel-shuffle) classifier — a 1x1 conv from 128 features to 16 per-block
  margins — so the fine grid NEVER exists on device. The flagship's fused
  s2d head proved margin-dot + digitize at coarse resolution is
  bandwidth-optimal; this generalizes it from 2x2 parity to the full 4x4
  block, and the PNG writer interleaves bytes on the host for free.
- ~13 GMAC/tile at 576px buffered input vs the flagship's ~62: encoder
  compute concentrates at 1/8-1/32 resolution where convs are cheap; the
  only full-width (1/4-grid) ops are the stem, one residual block, one
  fused up-conv and one skip-merge conv.
- No bottleneck 1x1 stacks, no depthwise (VPU-bound on TPU), no attention:
  dense 3x3 convs only — the op class XLA:TPU schedules at or near peak in
  this graph family. Decoder blocks are the fused nearest-2x-upsample+conv
  rewrite (layers.fused_upsample_conv3x3, 4/9 MACs, no upsampled
  intermediate). Skip connections concat in the lane dimension like the
  flagship.
- Encoder convs carry BN (folded at inference, layers.fold_conv_bn);
  decoder convs are BN-free like the reference decoder (robosat/unet.py:
  18-44), so fold() only touches the encoder and the int8 calibration walk
  (models/int8.py machinery) maps 1:1 onto the folded tree.

Layer map at 576px buffered predict input (144/72/36/18 coarse grids):

  stem  48->128 @144    b1 128->128 @144 (+res)
  down2 128->128 @72/s2 b2 128->128 @72 (+res)
  down3 128->256 @36/s2 b3 256->256 @36 (+res)
  down4 256->256 @18/s2 b4a 256->256 @18 (+res)  b4b dil2 256->256 @18 (+res)
  u3 up 256->128 @36    d3 [e3|u3] 384->128 @36
  u2 up 128->128 @72    d2 [e2|u2] 256->128 @72
  u1 up 128->128 @144   d1 [e1|u1] 256->128 @144
  head 1x1 128 -> 16*num_classes (sub-pixel 4x4), margins digitized on the
  coarse grid, uint8 blocked output to the host writer.

Reference behavior replaced: robosat/tools/predict.py:81-113 (the hot loop
this family accelerates); training contract robosat/tools/train.py:171-194.
"""

import jax
import jax.numpy as jnp
import numpy as np

from robosat_tpu.models.layers import (
    bn_apply,
    bn_init,
    conv_apply,
    conv_bias_apply,
    conv_init,
    fold_conv_bn,
    fused_upsample_conv3x3,
    init_rng,
    space_to_depth4,
)

# Encoder conv sites (conv + BN + ReLU, optional residual), in walk order.
_ENC = ("stem", "b1", "down2", "b2", "down3", "b3", "down4", "b4a", "b4b")
# Decoder conv sites (BN-free), in walk order.
_DEC = ("u3", "d3", "u2", "d2", "u1", "d1")

# The predict int8 path emits 4x4-blocked uint8 (16 channels); the host
# writer interleaves (robosat_tpu/tools/predict.py write_png).
INT8_BLOCKED_OUT = True
# Input side length must survive /4 (stem s2d) then three /2 stages.
SIDE_MULTIPLE = 32

BLOCK = 4  # sub-pixel head block: output pixels per coarse cell side


def init(rng, num_classes, in_channels=3):
    """Initialize FastNet params and BN state. Returns (params, state)."""
    rng = init_rng(rng)
    params, state = {}, {}

    def cbn(name, cin, cout):
        params[name] = conv_init(rng, 3, 3, cin, cout)
        params[name + "_bn"], state[name + "_bn"] = bn_init(cout)

    cbn("stem", 16 * in_channels, 128)
    cbn("b1", 128, 128)
    cbn("down2", 128, 128)
    cbn("b2", 128, 128)
    cbn("down3", 128, 256)
    cbn("b3", 256, 256)
    cbn("down4", 256, 256)
    cbn("b4a", 256, 256)
    cbn("b4b", 256, 256)

    params["u3"] = conv_init(rng, 3, 3, 256, 128)
    params["d3"] = conv_init(rng, 3, 3, 256 + 128, 128)
    params["u2"] = conv_init(rng, 3, 3, 128, 128)
    params["d2"] = conv_init(rng, 3, 3, 128 + 128, 128)
    params["u1"] = conv_init(rng, 3, 3, 128, 128)
    params["d1"] = conv_init(rng, 3, 3, 128 + 128, 128)
    params["final"] = {
        "w": conv_init(rng, 1, 1, 128, BLOCK * BLOCK * num_classes)["w"],
        "b": np.zeros((BLOCK * BLOCK * num_classes,), np.float32),
    }
    return params, state


def subpixel_to_fine(head, num_classes):
    """(N, h, w, 16*C) sub-pixel head output -> fine logits (N, 4h, 4w, C).

    Channel layout: ((2a+b)*4 + (2u+v))*C + cls places class cls of fine
    pixel (4i + 2a + u, 4j + 2b + v) — i.e. two nested 2x2 parity levels,
    the SAME convention the predict writer's two depth_to_space2 passes
    expect (tools/predict.py write_png), so train logits and predict bytes
    interleave identically.
    """
    n, h, w, c16 = head.shape
    c = c16 // (BLOCK * BLOCK)
    assert c == num_classes
    x = head.reshape(n, h, w, 2, 2, 2, 2, c)  # (a, b, u, v, cls)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (n, i, a, u, j, b, v, cls)
    return x.reshape(n, BLOCK * h, BLOCK * w, c)


def _walk48(x48, conv, upconv):
    """The shared layer walk on 4x4-blocked input with pluggable conv ops.

    `conv(name, x, stride=1, dilation=1)` returns the PRE-activation conv
    output (bias included where the tree carries one); `upconv(name, x)`
    the pre-activation fused upsample+conv. Residual adds and ReLUs stay
    out here so float, folded, and int8 walks share one topology and the
    int8 calibration sites line up positionally (models/int8._Sites).
    """
    relu = jax.nn.relu

    def block(name, x, stride=1, dilation=1, residual=None):
        y = conv(name, x, stride=stride, dilation=dilation)
        if residual is not None:
            y = y + residual
        return relu(y)

    t = block("stem", x48)
    e1 = block("b1", t, residual=t)
    t = block("down2", e1, stride=2)
    e2 = block("b2", t, residual=t)
    t = block("down3", e2, stride=2)
    e3 = block("b3", t, residual=t)
    t = block("down4", e3, stride=2)
    t = block("b4a", t, residual=t)
    e4 = block("b4b", t, dilation=2, residual=t)

    d = relu(upconv("u3", e4))
    d = relu(conv("d3", jnp.concatenate([e3, d], axis=-1)))
    d = relu(upconv("u2", d))
    d = relu(conv("d2", jnp.concatenate([e2, d], axis=-1)))
    d = relu(upconv("u1", d))
    return relu(conv("d1", jnp.concatenate([e1, d], axis=-1)))


def _check_side(h, w):
    assert h % SIDE_MULTIPLE == 0 and w % SIDE_MULTIPLE == 0, (
        "fastnet needs image sides divisible by {}".format(SIDE_MULTIPLE)
    )


def apply(params, state, x, train=False):
    """Training/eval forward on FINE input. Returns (logits, new_state).

    The 4x4 space-to-depth blocking traces in-graph (one transpose, ~1% of a
    train step); `rs predict` feeds pre-blocked input instead and never
    builds the fine grid on device.
    """
    n, h, w, c = x.shape
    _check_side(h, w)
    x48 = space_to_depth4(x)
    new_state = {}

    def conv(name, xx, stride=1, dilation=1):
        y = conv_apply(params[name], xx, stride=stride, dilation=dilation)
        if name + "_bn" in params:
            y, new_state[name + "_bn"] = bn_apply(params[name + "_bn"], state[name + "_bn"], y, train)
        return y

    def upconv(name, xx):
        return fused_upsample_conv3x3(params[name], xx)

    feats = _walk48(x48, conv, upconv)
    head = conv_apply({"w": params["final"]["w"]}, feats, stride=1) + params["final"]["b"].astype(feats.dtype)
    num_classes = params["final"]["b"].shape[0] // (BLOCK * BLOCK)
    return subpixel_to_fine(head, num_classes), new_state


def fold(params, state):
    """Inference params: encoder BNs folded into their convs (conv+bias);
    the BN-free decoder and head pass through unchanged."""
    folded = {}
    for name in _ENC:
        folded[name] = fold_conv_bn(params[name], params[name + "_bn"], state[name + "_bn"])
    for name in _DEC:
        folded[name] = dict(params[name])
    folded["final"] = dict(params["final"])
    return folded


def _walk48_folded(folded, x48):
    def conv(name, xx, stride=1, dilation=1):
        node = folded[name]
        if "b" in node:
            return conv_bias_apply(node, xx, stride=stride, dilation=dilation)
        return conv_apply(node, xx, stride=stride, dilation=dilation)

    def upconv(name, xx):
        return fused_upsample_conv3x3(folded[name], xx)

    return _walk48(x48, conv, upconv)


def apply_folded(folded, x):
    """BN-free inference forward on fine input; returns fine logits."""
    n, h, w, c = x.shape
    _check_side(h, w)
    feats = _walk48_folded(folded, space_to_depth4(x))
    head = conv_apply({"w": folded["final"]["w"]}, feats, stride=1) + folded["final"]["b"].astype(feats.dtype)
    return subpixel_to_fine(head, folded["final"]["b"].shape[0] // (BLOCK * BLOCK))


def predict_quantized_folded(folded, x, overlap=0):
    """bf16 fused predict: fine input -> quantized fg uint8 (fine, cropped).

    Margins compute on the coarse grid (ops.head.fused_prediction_head_
    subpixel); the device interleaves the blocked uint8 (the bf16 path takes
    fine input, so symmetric fine output keeps the tool contract).
    """
    from robosat_tpu.ops.head import fused_prediction_head_subpixel, interleave_subpixel_u8

    n, h, w, c = x.shape
    _check_side(h, w)
    feats = _walk48_folded(folded, space_to_depth4(x))
    blocked = fused_prediction_head_subpixel(feats, folded["final"]["w"], folded["final"]["b"], overlap=0)
    fine = interleave_subpixel_u8(blocked)
    if overlap:
        fine = fine[:, overlap:-overlap, overlap:-overlap]
    return fine


# ---------------------------------------------------------------------------
# Hybrid int8 datapath (the model-owned protocol, like models/deeplab.py):
# every conv except the float sub-pixel head runs int8 on the MXU with
# static per-site activation scales — all sites are >=128-lane so the whole
# walk quantizes (unlike the flagship, whose 3-channel stem stays bf16).
# ---------------------------------------------------------------------------


def quantize_folded_int8(folded, act_amaxes=None):
    """Folded tree -> int8 tree: per-output-channel weight quantization, the
    fused-upsample decoder kernels quantized in their 4x4 transposed-conv
    form (models/int8._fused_k4) so the int8 graph keeps the fast shapes;
    the sub-pixel head stays float.

    `act_amaxes` ("pc" calibration): per-site per-input-channel activation
    range vectors in walk order (_ENC then _DEC — exactly _walk48's conv
    order); balanced fold scales bake into the kernels (int8.ScaleCursor)
    and the function returns (qtree, scale_vectors) for the walk."""
    from robosat_tpu.models.int8 import ScaleCursor, _fused_k4, _qconv_pc, _qkernel_pc

    cursor = ScaleCursor(act_amaxes)
    q = {}
    for name in _ENC:
        q[name] = _qconv_pc(folded[name], cursor)
    for name in _DEC:
        if name.startswith("u"):
            q[name] = _qkernel_pc(_fused_k4(jnp.asarray(folded[name]["w"], jnp.float32)), cursor)
        else:
            q[name] = _qconv_pc(folded[name], cursor)
    cursor.assert_done()
    q["final"] = dict(folded["final"])
    if act_amaxes is not None:
        return q, cursor.out_scales
    return q


def _walk48_sites(tree, x48, sites, float_mode, compute_dtype=jnp.bfloat16, fake_quant=False):
    """The walk with positional conv-site scale consumption (calibration and
    int8 inference visit sites in the same order).

    `fake_quant` (float_mode with consumed scales — QAT): every site
    quantize-dequantizes its input with the static site scale and its kernel
    with live per-output-channel scales via the straight-through estimator
    (models/int8.fake_quant_{act,weight}), so the forward matches the int8
    datapath's values while staying differentiable. Up-convs fake-quant the
    REWRITTEN 4x4 transposed-conv kernel (int8._fused_k4) — the exact tensor
    quantize_folded_int8 grids."""
    from robosat_tpu.models.int8 import _fused_k4, _int8_conv, fake_quant_act, fake_quant_weight
    from robosat_tpu.models.layers import CONV_DIMS

    def conv(name, xx, stride=1, dilation=1):
        scale = sites.next_scale(xx)
        pad = ((dilation, dilation),) * 2 if dilation > 1 else "SAME"
        if float_mode:
            node = tree[name]
            if fake_quant:
                fq = {"w": fake_quant_weight(jnp.asarray(node["w"], jnp.float32)).astype(xx.dtype)}
                if "b" in node:
                    fq["b"] = node["b"]
                node, xx = fq, fake_quant_act(xx, scale)
            if "b" in node:
                return conv_bias_apply(node, xx, stride=stride, dilation=dilation, padding=pad)
            return conv_apply(node, xx, stride=stride, dilation=dilation, padding=pad)
        return _int8_conv(
            tree[name], xx, scale, stride=stride, dilation=dilation, padding=pad, compute_dtype=compute_dtype
        )

    def upconv(name, xx):
        scale = sites.next_scale(xx)
        if float_mode:
            if fake_quant:
                k4 = fake_quant_weight(_fused_k4(jnp.asarray(tree[name]["w"], jnp.float32))).astype(xx.dtype)
                return jax.lax.conv_general_dilated(
                    fake_quant_act(xx, scale), k4, (1, 1), ((2, 2), (2, 2)),
                    lhs_dilation=(2, 2), dimension_numbers=CONV_DIMS,
                )
            return fused_upsample_conv3x3(tree[name], xx)
        return _int8_conv(
            tree[name], xx, scale, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2), compute_dtype=compute_dtype
        )

    return _walk48(x48, conv, upconv)


def apply_logits_fake_quant(params, state, scales, x):
    """QAT training forward: in-graph BN fold (frozen at running stats), the
    int8 walk in fake-quant STE mode with the static per-site `scales`, then
    the float sub-pixel head — fine logits whose forward values match the
    shipped int8 datapath while gradients flow to the ORDINARY params, so a
    finetuned checkpoint stays a normal checkpoint and `rs predict` needs no
    changes (parallel/steps.make_qat_train_step)."""
    from robosat_tpu.models.int8 import _Sites

    n, h, w, c = x.shape
    _check_side(h, w)
    folded = fold(params, state)
    sites = _Sites(scales=list(scales))
    feats = _walk48_sites(folded, space_to_depth4(x), sites, float_mode=True, fake_quant=True)
    head = conv_apply({"w": folded["final"]["w"]}, feats, stride=1) + folded["final"]["b"].astype(feats.dtype)
    return subpixel_to_fine(head, folded["final"]["b"].shape[0] // (BLOCK * BLOCK))


def calibration_amaxes_int8(folded, x, blocked=False, percentile=None):
    """Per-conv-site input amaxes (or |x| percentiles) from one float forward.

    `x` is normalized input — fine (N, H, W, 3), or 4x4 space-to-depth
    (N, H/4, W/4, 48) with `blocked`."""
    from robosat_tpu.models.int8 import _Sites, is_per_channel

    x48 = x if blocked else space_to_depth4(x)
    sites = _Sites(scales=None, percentile=percentile)
    _walk48_sites(folded, x48.astype(jnp.float32), sites, float_mode=True)
    if is_per_channel(percentile):
        return [t.astype(jnp.float32) for t in sites.taps]
    return jnp.stack(sites.taps).astype(jnp.float32)


def predict_quantized_int8(qtree, scales, x, overlap=0, blocked=False):
    """Hybrid int8 predict step body.

    `x` is normalized bf16 — 4x4 host-blocked (N, H/4, W/4, 48) with
    `blocked`, else fine. Returns 4x4-blocked uint8
    (N, (H - 2*overlap)/4, (W - 2*overlap)/4, 16) when `blocked` and the
    overlap crops cleanly on the coarse grid (INT8_BLOCKED_OUT — the host
    writer interleaves); otherwise fine uint8 (N, H-2o, W-2o).
    """
    from robosat_tpu.models.int8 import _Sites
    from robosat_tpu.ops.head import fused_prediction_head_subpixel, interleave_subpixel_u8

    x48 = x if blocked else space_to_depth4(x)
    sites = _Sites(scales=list(scales))
    feats = _walk48_sites(qtree, x48, sites, float_mode=False)
    assert sites.idx == len(list(scales)), "conv-site count mismatch with calibration"

    if blocked and overlap % BLOCK == 0:
        return fused_prediction_head_subpixel(feats, qtree["final"]["w"], qtree["final"]["b"], overlap=overlap)
    out = fused_prediction_head_subpixel(feats, qtree["final"]["w"], qtree["final"]["b"], overlap=0)
    fine = interleave_subpixel_u8(out)
    if overlap:
        fine = fine[:, overlap:-overlap, overlap:-overlap]
    return fine
