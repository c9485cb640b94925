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


def _quantize_weight(w):
    """HWIO float kernel -> (int8 kernel, float32 per-output-channel scale)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _qconv(node):
    wq, ws = _quantize_weight(node["w"])
    out = {"wq": wq, "ws": ws}
    if "b" in node:
        out["b"] = jnp.asarray(node["b"], jnp.float32)
    return out


def _qkernel(k):
    """Pre-rewritten float kernel -> {"wq", "ws"} (per-output-channel)."""
    wq, ws = _quantize_weight(k)
    return {"wq": wq, "ws": ws}


def quantize_unet_folded(folded):
    """BN-folded U-Net params -> hybrid tree: bottleneck stages + decoder
    quantized (in their rewritten kernel forms), stem + final head float."""
    enc = folded["encoder"]
    qenc = {"conv1": dict(enc["conv1"])}  # stem stays float
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        stage = []
        for bi in range(blocks):
            fb = enc[name][bi]
            qb = {k: _qconv(fb[k]) for k in ("conv1", "conv2", "conv3")}
            if "down_conv" in fb:
                qb["down_conv"] = _qconv(fb["down_conv"])
            stage.append(qb)
        qenc[name] = stage

    q = {"encoder": qenc}
    for name in ("center", "dec0", "dec1", "dec2", "dec3"):
        q[name] = _qkernel(_fused_k4(jnp.asarray(folded[name]["w"], jnp.float32)))
    q["dec4"] = _qkernel(s2d_up_conv3x3_kernel(jnp.asarray(folded["dec4"]["w"], jnp.float32)))
    q["dec5"] = _qkernel(s2d_conv3x3_kernel(jnp.asarray(folded["dec5"]["w"], jnp.float32)))
    q["final"] = dict(folded["final"])
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
    inv = jnp.float32(np.float32(1.0) / np.float32(scale))
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)


def _int8_conv(node, x, scale, stride=1, padding="SAME", lhs_dilation=None, dilation=1, compute_dtype=jnp.bfloat16):
    """Quantize x with the static `scale`, int8 conv, dequant (+bias)."""
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
    y = acc.astype(jnp.float32) * (node["ws"] * scale)
    if "b" in node:
        y = y + node["b"]
    return y.astype(compute_dtype)


# Candidate clip fractions for the "mse" calibration grid (of the site amax).
_MSE_GRID = np.geomspace(0.02, 1.0, 28).astype(np.float32)


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
            if self.percentile in ("mse", "mae"):
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
        s = float(self.scales[self.idx])
        self.idx += 1
        return s



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
          pallas_layer1=False, pallas_interpret=None):
    """Float stem, then bottleneck stacks and the decoder, visiting conv
    sites in a fixed order. Mirrors resnet.apply_folded + unet.decode_s2d;
    returns s2d parity-blocked decoder features.

    In float_mode (calibration) `q` is the plain folded tree and every site
    runs in float via the same rewrites the int8 kernels were built from.
    With `blocked`, `x` is 4x4 space-to-depth host-blocked normalized input
    (N, H/4, W/4, 48) and the stem runs in its MXU-wide s2d form.
    """
    relu = jax.nn.relu

    def conv(node, xx, stride=1, dilation=1, padding="SAME"):
        scale = sites.next_scale(xx)
        if float_mode:  # every folded encoder conv carries a bias (BN fold)
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
            return relu(fused_upsample_conv3x3(q[name], xx))
        return relu(
            _int8_conv(q[name], xx, scale, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2), compute_dtype=compute_dtype)
        )

    def s2d_block(name, kernel_fn, xx):
        scale = sites.next_scale(xx)
        if float_mode:
            k = kernel_fn(jnp.asarray(q[name]["w"], jnp.float32))
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
    """amax vector -> per-site static quantization scales."""
    amaxes = np.asarray(amaxes, np.float64)
    return np.maximum(amaxes * margin, 1e-12) / 127.0
