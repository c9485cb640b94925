"""Hybrid int8 inference datapath: bf16 stem, int8 everywhere lane-aligned.

The chip sustains ~302 int8 TOPS vs ~130 bf16 TFLOPs and int8 activations
halve HBM bytes (docs/PERF.md), but per-op tracing (benchmarks/xplane.py)
shows WHERE int8 pays on this backend:

- wide lane-aligned convolutions (the ResNet bottleneck stacks and the
  decoder blocks incl. the space-to-depth tail, all >= 64 channels) fuse
  cleanly — XLA folds quantize/dequant epilogues into the convolutions and
  emits s8-in/bf16-out fusions;
- the FINE-resolution tail (dec4/dec5 at full res x 32ch, before the s2d
  rewrite) was a disaster in int8: XLA materialized the raw s32 accumulators
  (4 bytes/element at full resolution, ~340 MB/batch) plus layout copies —
  ~12 ms/step of pure overhead, making that graph SLOWER than bf16;
- conv1 (3 input channels) is im2col-bound, not contraction-bound; int8
  buys nothing there, so the stem stays bf16.

Datapath:

- weights: symmetric per-output-channel int8, quantized once at load; the
  decoder kernels are quantized in their REWRITTEN forms (the 4x4
  parity-combined transposed-conv kernel for center..dec3, the s2d kernels
  for dec4/dec5) so the int8 graph keeps the fast graph shapes;
- activations: symmetric per-tensor int8 with STATIC scales captured by a
  one-batch calibration pass (a dynamic amax would re-read every activation
  and give back the bandwidth win);
- convolutions: int8 x int8 -> int32 on the MXU
  (lax.conv_general_dilated(preferred_element_type=int32)); dequant + bias
  + ReLU + requant are elementwise epilogues XLA fuses into the convs;
- the final 1x1 head stays float (it feeds ops.head.fused_prediction_head_s2d).

`calibration_amaxes` and `apply_features_int8` walk the network in the SAME
order, so the amax vector indexes conv sites positionally. Reference
architecture: robosat/unet.py:76-141 (torchvision resnet50 bottleneck stack
+ DecoderBlock chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from robosat_tpu.models.layers import (
    CONV_DIMS,
    conv_bias_apply,
    fused_upsample_conv3x3,
    max_pool,
    s2d_conv3x3_kernel,
    s2d_up_conv3x3_kernel,
)
from robosat_tpu.models.resnet import RESNET50_STAGES

# (kernel-rewrite, conv kwargs) per decoder site; mirrors unet.decode_s2d.
_K4_SETS = ((0,), (0, 1), (1, 2), (2,))


def _fused_k4(w3):
    """The 4x4 parity-combined kernel of nearest-2x upsample + 3x3 conv
    (same rewrite as layers.fused_upsample_conv3x3)."""
    return jnp.stack(
        [
            jnp.stack([sum(w3[r, c] for r in rows for c in cols) for cols in _K4_SETS], axis=0)
            for rows in _K4_SETS
        ],
        axis=0,
    )


def _quantize_weight(w, act_scale=None):
    """HWIO float kernel -> (int8 kernel, float32 per-output-channel scale).

    With `act_scale` (per-INPUT-channel activation quantization scales, the
    "pc" calibration mode), the scales are FOLDED into the kernel before
    quantization: W'[..,c,:] = W[..,c,:] * s_c. The consumer then quantizes
    activations per channel (x_c / s_c) and dequantizes with the weight
    scale alone — sum_c (x_c/s_c)(W_c s_c) = sum_c x_c W_c — so a single
    outlier activation channel no longer blows the whole tensor's scale
    (docs/PERF.md round-4 int8 finding #4)."""
    w = jnp.asarray(w, jnp.float32)
    if act_scale is not None:
        w = w * jnp.asarray(act_scale, jnp.float32)[None, None, :, None]
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _qconv(node, act_scale=None):
    wq, ws = _quantize_weight(node["w"], act_scale)
    out = {"wq": wq, "ws": ws}
    if "b" in node:
        out["b"] = jnp.asarray(node["b"], jnp.float32)
    return out


def _qkernel(k, act_scale=None):
    """Pre-rewritten float kernel -> {"wq", "ws"} (per-output-channel).
    `act_scale` folds per-input-channel activation scales (rewritten-kernel
    input axis) before quantization — see _quantize_weight."""
    wq, ws = _quantize_weight(k, act_scale)
    return {"wq": wq, "ws": ws}


class ScaleCursor:
    """Positional per-site scale planner for the "pc" (per-channel)
    quantization mode.

    Quantizers call fold_scale(kernel) in the SAME conv-site order the
    inference walk consumes scales. For each site it balances the calibrated
    per-input-channel activation range a_c against the kernel's
    per-input-channel weight range w_c (SmoothQuant-style, alpha = 1/2):

        s_c  ∝  sqrt(a_c / w_c),  normalized so max_c(a_c / s_c) = 127.

    A pure activation-side fold (s_c = a_c / 127) would merely MOVE the
    outlier-channel disparity into the folded weights, where the
    per-OUTPUT-channel weight scale cannot absorb an input-axis spread; the
    square root splits the disparity evenly, so each channel's combined
    activation x weight quantization noise stays proportional to that
    channel's actual contribution a_c * w_c. The chosen vectors are recorded
    in out_scales — the exact vectors the inference walk must quantize
    activations with. fold_scale returns None when no amaxes were supplied
    (per-tensor mode — nothing to fold)."""

    def __init__(self, act_amaxes=None):
        self.act_amaxes = None if act_amaxes is None else list(act_amaxes)
        self.idx = 0
        self.out_scales = []

    def fold_scale(self, kernel):
        if self.act_amaxes is None:
            return None
        assert self.idx < len(self.act_amaxes), (
            "act-amax count mismatch: more conv sites than the {} amax vectors".format(len(self.act_amaxes))
        )
        a = jnp.maximum(jnp.asarray(self.act_amaxes[self.idx], jnp.float32), 1e-12)
        self.idx += 1
        k = jnp.asarray(kernel, jnp.float32)
        w_amax = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 3)), 1e-12)
        s = jnp.sqrt(a / w_amax)
        s = s * (jnp.max(a / s) / 127.0)
        self.out_scales.append(s)
        return s

    def assert_done(self):
        if self.act_amaxes is not None:
            assert self.idx == len(self.act_amaxes), (
                "act-amax count mismatch: consumed {} of {}".format(self.idx, len(self.act_amaxes))
            )


def is_per_channel(spec):
    """True for the per-channel calibration specs ("pc", "pc99.8", ...)."""
    return isinstance(spec, str) and spec.startswith("pc")


def _qconv_pc(node, cursor):
    """_qconv with the cursor planning this site's per-channel fold."""
    return _qconv(node, cursor.fold_scale(node["w"]))


def _qkernel_pc(k, cursor):
    """_qkernel on a pre-rewritten kernel, cursor-planned fold."""
    return _qkernel(k, cursor.fold_scale(k))


def quantize_encoder_stages(enc, cursor):
    """The four bottleneck stages quantized in WALK order (conv1, conv2,
    conv3, down_conv per block — the order walk_encoder consumes scales),
    folding per-site per-channel scales planned by `cursor` ("pc" mode).
    Shared by the U-Net and DeepLab quantizers."""
    qenc = {"conv1": dict(enc["conv1"])}  # stem stays float
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        stage = []
        for bi in range(blocks):
            fb = enc[name][bi]
            qb = {k: _qconv_pc(fb[k], cursor) for k in ("conv1", "conv2", "conv3")}
            if "down_conv" in fb:
                qb["down_conv"] = _qconv_pc(fb["down_conv"], cursor)
            stage.append(qb)
        qenc[name] = stage
    return qenc


def quantize_unet_folded(folded, act_amaxes=None):
    """BN-folded U-Net params -> hybrid tree: bottleneck stages + decoder
    quantized (in their rewritten kernel forms), stem + final head float.

    `act_amaxes` (per-channel "pc" calibration): per-site per-input-channel
    activation range vectors in conv-site walk order. Each site's balanced
    fold scales (ScaleCursor) bake into its kernel before weight
    quantization, and the function then returns (qtree, scale_vectors) —
    the inference walk MUST quantize activations with exactly those
    vectors. Decoder vectors are over the REWRITTEN kernels' input channels
    — the same tensors the calibration walk tapped."""
    cursor = ScaleCursor(act_amaxes)
    q = {"encoder": quantize_encoder_stages(folded["encoder"], cursor)}
    for name in ("center", "dec0", "dec1", "dec2", "dec3"):
        q[name] = _qkernel_pc(_fused_k4(jnp.asarray(folded[name]["w"], jnp.float32)), cursor)
    q["dec4"] = _qkernel_pc(s2d_up_conv3x3_kernel(jnp.asarray(folded["dec4"]["w"], jnp.float32)), cursor)
    q["dec5"] = _qkernel_pc(s2d_conv3x3_kernel(jnp.asarray(folded["dec5"]["w"], jnp.float32)), cursor)
    cursor.assert_done()
    q["final"] = dict(folded["final"])
    if act_amaxes is not None:
        return q, cursor.out_scales
    return q


def _quantize_act(x, scale):
    # Multiply by the f32 reciprocal instead of dividing: f32 multiplication
    # is single-rounding-deterministic on EVERY backend, while division gets
    # lowered to reciprocal approximations with backend-specific refinement
    # (TPU has no divider) and compilers fold constant divisors into
    # reciprocal-multiplies anyway (measured: Pallas interpret turns
    # round(v / 0.015) of 1.6875 into 113 where eager division gives 112).
    # Baking the reciprocal makes the Pallas kernels (qdec/qtail/qenc)
    # replicable bit for bit against this graph.
    if isinstance(scale, np.ndarray) and scale.ndim == 1:
        # Per-channel ("pc" calibration): a host f32 reciprocal VECTOR
        # broadcast over the channel axis; same single-rounding determinism
        # argument, elementwise.
        inv = jnp.asarray(np.float32(1.0) / np.asarray(scale, np.float32))
    else:
        inv = jnp.float32(np.float32(1.0) / np.float32(scale))
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)


def _int8_conv(node, x, scale, stride=1, padding="SAME", lhs_dilation=None, dilation=1, compute_dtype=jnp.bfloat16):
    """Quantize x with the static `scale`, int8 conv, dequant (+bias).

    `scale` is a host scalar (per-tensor) or a per-input-channel f32 vector
    ("pc" mode). In the vector case the scales were FOLDED into `wq` at
    quantize time (_quantize_weight), so dequantization uses the weight
    scale alone — the per-channel factors cancel inside the accumulation."""
    xq = _quantize_act(x, scale)
    acc = lax.conv_general_dilated(
        xq,
        node["wq"],
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation or (1, 1),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=CONV_DIMS,
        preferred_element_type=jnp.int32,
    )
    per_channel = isinstance(scale, np.ndarray) and scale.ndim == 1
    y = acc.astype(jnp.float32) * (node["ws"] if per_channel else node["ws"] * scale)
    if "b" in node:
        y = y + node["b"]
    return y.astype(compute_dtype)


# Candidate clip fractions for the "mse" calibration grid (of the site amax).
_MSE_GRID = np.geomspace(0.02, 1.0, 28).astype(np.float32)


def fake_quant_act(x, scale):
    """CLIPPED straight-through-estimator quantize-dequantize of an
    activation with the static per-tensor `scale` (QAT: forward sees exactly
    the int8 datapath's values; backward passes gradients through only
    INSIDE the representable range). Uses the same baked host-f32 reciprocal
    as _quantize_act so both paths put every value in the same int8 bin.

    Why clipped: an ungated STE lets the optimizer push activations
    arbitrarily far past the frozen clip boundary — the fake-quant (and
    int8) forward stays self-consistent because both clip, but the model's
    FLOAT forward then diverges from its own int8 path (measured: a
    400-step ungated QAT of FastNet kept int8 gt-IoU at 0.9988 while its
    float path collapsed to 0.0). Zeroing the gradient outside +-127 bins
    (Choi et al. PACT / standard QAT practice) keeps the finetuned weights
    meaningful for BOTH forwards."""
    inv = jnp.asarray(np.float32(1.0) / np.float32(scale), x.dtype)
    r = x * inv
    q = jnp.clip(jnp.round(r), -127, 127) * jnp.asarray(np.float32(scale), x.dtype)
    gate = (jnp.abs(r) <= 127.0).astype(x.dtype)
    return lax.stop_gradient(q) + (x - lax.stop_gradient(x)) * gate


def fake_quant_weight(w):
    """STE quantize-dequantize of a kernel with LIVE per-output-channel
    scales (recomputed from the current weights each step, exactly
    _quantize_weight's grid, so the finetuned weights land on the grid the
    predict-time quantizer will use)."""
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127) * scale
    return w + lax.stop_gradient(q - w)


class _Sites:
    """Positional conv-site cursor shared by calibration and inference."""

    def __init__(self, scales=None, percentile=None):
        self.scales = scales
        self.percentile = percentile
        self.taps = []
        self.idx = 0

    def next_scale(self, x):
        if self.scales is None:
            a = jnp.abs(x.astype(jnp.float32))
            if is_per_channel(self.percentile):
                # Per-channel taps ("pc" = per-channel amax, "pc99.8" = that
                # percentile per channel, over batch+space): the failure
                # mode per-tensor calibration cannot fix is ONE outlier
                # channel blowing the shared scale while the bulk quantizes
                # to ~0; a per-channel vector gives every channel its own
                # int8 range, and the consumer folds the vector into its
                # weights so the MXU path is unchanged (_quantize_weight).
                axes = tuple(range(a.ndim - 1))
                spec = self.percentile[2:]
                if spec in ("", "amax"):
                    self.taps.append(jnp.max(a, axis=axes))
                else:
                    self.taps.append(jnp.percentile(a.reshape(-1, a.shape[-1]), float(spec), axis=0))
            elif self.percentile in ("mse", "mae"):
                # Grid-optimal clip: per site, pick the clip value (a grid of
                # fractions of amax) minimizing the symmetric-int8
                # quantize-dequantize reconstruction error over the
                # calibration batch. A fixed percentile applies ONE outlier
                # policy to every layer; the grid search adapts per site
                # (layers without outliers keep ~amax, outlier layers clip).
                # Objective choice matters in the trained-model regime
                # (docs/PERF.md round 4: amax agreement-IoU 0.14 — outlier
                # channels blow the static per-tensor scale): under L2
                # ("mse") a single extreme outlier's squared error dominates
                # the bulk's quantization noise, pulling the optimum back to
                # ~amax — the exact failure mode. L1 ("mae") weights the
                # outlier linearly, so the optimum lands at the bulk's edge.
                amax = jnp.max(a)
                sq = self.percentile == "mse"
                errs = []
                for frac in _MSE_GRID:
                    clip = amax * jnp.float32(frac)
                    step = jnp.maximum(clip, 1e-12) / 127.0
                    resid = jnp.minimum(jnp.round(a / step), 127.0) * step - a
                    errs.append(jnp.mean(jnp.square(resid) if sq else jnp.abs(resid)))
                best = jnp.argmin(jnp.stack(errs))
                self.taps.append(amax * jnp.asarray(_MSE_GRID)[best])
            elif self.percentile is not None:
                # Percentile clipping: on models with activation outliers a
                # static amax scale wastes most of the int8 range — p99.9
                # measured int8 IoU 0.27 -> 0.70 on a weakly-trained model
                # (round 3). The one-off calibration sort is irrelevant.
                self.taps.append(jnp.percentile(a, self.percentile))
            else:
                self.taps.append(jnp.max(a))
            return 1.0  # calibration runs in float; scale unused
        s = self.scales[self.idx]
        self.idx += 1
        # Per-channel scales stay host f32 vectors (consumed by broadcast);
        # scalars stay floats for bit-compat with the Pallas kernels.
        return s if isinstance(s, np.ndarray) and s.ndim == 1 else float(s)



def walk_encoder(q_enc, out, conv, dilate_last_stage=False, stage_overrides=None):
    """The four bottleneck stages with a pluggable conv (int8 or float);
    site order per block: conv1, conv2, conv3, down_conv. Mirrors
    resnet.apply_folded_stages incl. the DeepLab output-stride-16 mode
    (layer4 stride 1, conv2 dilation 2). Returns (enc1..enc4).

    `stage_overrides` maps stage index -> fn(stage_blocks, x) -> y replacing
    that stage's walk wholesale (the Pallas bottleneck kernel, models/qenc);
    an override owns its stage's conv-site scale consumption."""
    relu = jax.nn.relu
    skips = []
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        if stage_overrides and si in stage_overrides:
            out = stage_overrides[si](q_enc[name], out)
            skips.append(out)
            continue
        last_dilated = dilate_last_stage and si == len(RESNET50_STAGES) - 1
        for bi in range(blocks):
            qb = q_enc[name][bi]
            stride = 2 if (bi == 0 and si > 0 and not last_dilated) else 1
            dilation = 2 if last_dilated else 1
            inner = relu(conv(qb["conv1"], out))
            # Torch-style symmetric padding: SAME would pad (0, 1) at
            # stride 2 (see resnet._bottleneck_apply).
            inner = relu(
                conv(qb["conv2"], inner, stride=stride, dilation=dilation, padding=((dilation, dilation),) * 2)
            )
            inner = conv(qb["conv3"], inner)
            shortcut = conv(qb["down_conv"], out, stride=stride) if "down_conv" in qb else out
            out = relu(inner + shortcut)
        skips.append(out)
    return tuple(skips)


def _walk(q, x, sites, compute_dtype, float_mode=False, blocked=False, stop_at=None,
          pallas_layer1=False, pallas_interpret=None, fake_quant=False):
    """Float stem, then bottleneck stacks and the decoder, visiting conv
    sites in a fixed order. Mirrors resnet.apply_folded + unet.decode_s2d;
    returns s2d parity-blocked decoder features.

    In float_mode (calibration) `q` is the plain folded tree and every site
    runs in float via the same rewrites the int8 kernels were built from.
    With `fake_quant` (float_mode with consumed scales — QAT), every site
    additionally quantize-dequantizes its input with the static site scale
    and its kernel with live per-output-channel scales, both via the
    straight-through estimator, so the forward matches the int8 datapath's
    values while staying differentiable. With `blocked`, `x` is 4x4
    space-to-depth host-blocked normalized input (N, H/4, W/4, 48) and the
    stem runs in its MXU-wide s2d form.
    """
    relu = jax.nn.relu

    def conv(node, xx, stride=1, dilation=1, padding="SAME"):
        scale = sites.next_scale(xx)
        if float_mode:  # every folded encoder conv carries a bias (BN fold)
            if fake_quant:
                fq_node = {"w": fake_quant_weight(jnp.asarray(node["w"], jnp.float32)).astype(xx.dtype)}
                if "b" in node:
                    fq_node["b"] = node["b"]
                xx = fake_quant_act(xx, scale)
                return conv_bias_apply(fq_node, xx, stride=stride, dilation=dilation, padding=padding)
            return conv_bias_apply(node, xx, stride=stride, dilation=dilation, padding=padding)
        return _int8_conv(
            node, xx, scale, stride=stride, dilation=dilation, padding=padding, compute_dtype=compute_dtype
        )

    if blocked:
        from robosat_tpu.models.resnet import stem_folded_s2d4

        out = stem_folded_s2d4(q["encoder"]["conv1"], x)
    else:
        out = relu(conv_bias_apply(q["encoder"]["conv1"], x, stride=2, padding=((3, 3), (3, 3))))
        out = max_pool(out, window=3, stride=2, padding=1)

    overrides = None
    if pallas_layer1 and not float_mode:
        # Encoder stages via the Pallas bottleneck kernels (models/qenc):
        # the narrow intermediates stay VMEM-resident instead of lane-
        # padding in HBM (docs/PERF.md round 3 — layer1 runs ~1.4 ms vs a
        # ~1.0 roofline under XLA). Bit-identical to the _int8_conv walk
        # (tests/test_qenc.py). True = layer1 only (the proven-below-peak
        # stage); "all" = every stage (stride-2 first blocks included).
        from robosat_tpu.models import qenc as _qenc

        def _stage_fn(si):
            def run(stage, xx):
                n_sites = sum(3 + ("down_conv" in qb) for qb in stage)
                stage_scales = [sites.next_scale(xx) for _ in range(n_sites)]
                return _qenc.apply_stage_blocks(
                    xx, stage, stage_scales, first_stride=2 if si else 1,
                    compute_dtype=compute_dtype, interpret=pallas_interpret,
                )

            return run

        stages = (0, 1, 2, 3) if pallas_layer1 == "all" else (0,)
        overrides = {si: _stage_fn(si) for si in stages}
    enc1, enc2, enc3, enc4 = walk_encoder(q["encoder"], out, conv, stage_overrides=overrides)

    def up_block(name, xx):
        # Fused upsample+conv in its 4x4 transposed-conv form.
        scale = sites.next_scale(xx)
        if float_mode:
            if fake_quant:
                # Fake-quant the REWRITTEN kernel — the tensor the predict
                # quantizer grids — not the raw 3x3 form.
                k4 = fake_quant_weight(_fused_k4(jnp.asarray(q[name]["w"], jnp.float32))).astype(xx.dtype)
                return relu(
                    lax.conv_general_dilated(
                        fake_quant_act(xx, scale), k4, (1, 1), ((2, 2), (2, 2)),
                        lhs_dilation=(2, 2), dimension_numbers=CONV_DIMS,
                    )
                )
            return relu(fused_upsample_conv3x3(q[name], xx))
        return relu(
            _int8_conv(q[name], xx, scale, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2), compute_dtype=compute_dtype)
        )

    def s2d_block(name, kernel_fn, xx):
        scale = sites.next_scale(xx)
        if float_mode:
            k = kernel_fn(jnp.asarray(q[name]["w"], jnp.float32))
            if fake_quant:
                k = fake_quant_weight(k)
                xx = fake_quant_act(xx, scale)
            return relu(
                lax.conv_general_dilated(xx, k.astype(xx.dtype), (1, 1), "SAME", dimension_numbers=CONV_DIMS)
            )
        return relu(_int8_conv(q[name], xx, scale, compute_dtype=compute_dtype))

    center = up_block("center", max_pool(enc4, window=2, stride=2, padding=0))
    dec0 = up_block("dec0", jnp.concatenate([enc4, center], axis=-1))
    dec1 = up_block("dec1", jnp.concatenate([enc3, dec0], axis=-1))
    dec2 = up_block("dec2", jnp.concatenate([enc2, dec1], axis=-1))
    cat3 = jnp.concatenate([enc1, dec2], axis=-1)
    if stop_at == "dec3_in":
        return cat3
    dec3 = up_block("dec3", cat3)
    if stop_at == "dec3":
        return dec3
    dec4 = s2d_block("dec4", s2d_up_conv3x3_kernel, dec3)
    return s2d_block("dec5", s2d_conv3x3_kernel, dec4)


def calibration_amaxes(folded, x, compute_dtype=jnp.float32, blocked=False, percentile=None):
    """Per-conv-site input amaxes (or |activation| percentiles) from one
    float forward over batch `x`.

    Returns a float32 vector indexed by conv-site order (the order
    apply_features_int8 consumes). Jit this with real imagery.
    """
    sites = _Sites(scales=None, percentile=percentile)
    _walk(folded, x.astype(compute_dtype), sites, compute_dtype, float_mode=True, blocked=blocked)
    if is_per_channel(percentile):
        # Ragged per-site channel vectors: a list pytree, not a stack.
        return [t.astype(jnp.float32) for t in sites.taps]
    return jnp.stack(sites.taps).astype(jnp.float32)


def apply_features_int8(qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=False,
                        pallas_layer1=False, pallas_interpret=None):
    """Hybrid int8 forward to s2d decoder features: float stem -> int8
    bottleneck stacks -> int8 decoder (rewritten kernel forms). `scales` is
    a host float sequence (amax/127 per conv site, calibration order);
    returns parity-blocked NHWC features for
    robosat_tpu.ops.head.fused_prediction_head_s2d. `pallas_layer1` runs
    encoder layer1 through the Pallas bottleneck kernel (models/qenc)."""
    sites = _Sites(scales=list(scales))
    features = _walk(qtree, x, sites, compute_dtype, blocked=blocked,
                     pallas_layer1=pallas_layer1, pallas_interpret=pallas_interpret)
    assert sites.idx == len(list(scales)), "conv-site count mismatch with calibration"
    return features


def apply_features_int8_to_dec3(qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=False,
                                pallas_layer1=False, pallas_interpret=None):
    """The int8 walk stopped at dec3: returns (dec3 activations, s4, s5) —
    the last two calibration scales left for a fused Pallas tail
    (robosat_tpu.models.qtail) to consume in-kernel."""
    scales = list(scales)
    sites = _Sites(scales=scales)
    dec3 = _walk(qtree, x, sites, compute_dtype, blocked=blocked, stop_at="dec3",
                 pallas_layer1=pallas_layer1, pallas_interpret=pallas_interpret)
    assert sites.idx == len(scales) - 2, "dec4/dec5 scales must remain for the fused tail"
    return dec3, scales[-2], scales[-1]


def apply_features_int8_to_dec3_input(qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=False,
                                      pallas_layer1=False, pallas_interpret=None):
    """The int8 walk stopped BEFORE dec3: returns (concat(enc1, dec2), s3,
    s4, s5) — dec3 then runs as the parity-separated Pallas kernel
    (qdec.parity_up_conv_separated) feeding the separated fused tail
    (qtail.fused_tail_features_sep), so dec3's fine-grid interleave never
    materializes."""
    scales = list(scales)
    sites = _Sites(scales=scales)
    cat3 = _walk(qtree, x, sites, compute_dtype, blocked=blocked, stop_at="dec3_in",
                 pallas_layer1=pallas_layer1, pallas_interpret=pallas_interpret)
    assert sites.idx == len(scales) - 3, "dec3/dec4/dec5 scales must remain for the separated tail"
    return cat3, scales[-3], scales[-2], scales[-1]


def scales_from_amaxes(amaxes, margin=1.0):
    """amax vector -> per-site static quantization scales (per-tensor modes;
    the per-channel "pc" mode plans its vectors in ScaleCursor instead)."""
    amaxes = np.asarray(amaxes, np.float64)
    return np.maximum(amaxes * margin, 1e-12) / 127.0
