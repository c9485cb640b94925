"""Pallas/Mosaic int8 kernel for ResNet bottleneck blocks (encoder layer1).

Per-op tracing (docs/PERF.md round 3) shows encoder layer1 — three stride-1
bottleneck blocks at 144^2 x (64 -> 64 -> 256) — running ~2.7 ms/batch-8
against a ~1.0 ms int8 roofline: XLA:TPU lane-pads the 64-channel
intermediate buffers 2x in HBM and schedules the narrow convs below peak.
This is the remaining below-peak stage BASELINE.json's north star reserves
hand-written kernels for (the decoder's got models/qdec.py / qtail.py).

One grid program computes a full bottleneck block for a strip of S rows
entirely in VMEM: quantize the (S+2)-row extended input once, 1x1 conv1 as a
single (S+2)W x Cin x 64 int8 matmul, requantize, 3x3 conv2 as nine
row-window taps over three column-shifted copies (the models/qdec.py
formulation), requantize, 1x1 conv3, plus the residual (identity rows or the
down_conv projection, quantized with its own site scale) — the 64-channel
tensors never exist in HBM, and the only HBM traffic is the block's input
and output.

Numerics are bit-identical to models.int8.walk_encoder with _int8_conv
(tests/test_qenc.py): quantization uses the same reciprocal-multiply/round/clip, int32
accumulation commutes with XLA's conv ordering, the dequant epilogue is
acc.f32 * (ws * s) + b cast to the compute dtype, relu placement matches
(relu(conv1), relu(conv2), no relu on conv3/down, relu(sum)).

Reference architecture: torchvision resnet50 bottlenecks as used by
robosat/unet.py:87-99 (rebuilt in robosat_tpu/models/resnet.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robosat_tpu.models.qdec import round_to


def _shift_cols(x, offset):
    """(R, W, C) shifted along W by `offset` with zero fill (SAME padding)."""
    if offset == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if offset < 0:
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def _quant(v, scale):
    # Reciprocal-multiply with the SAME host-f32 reciprocal as
    # int8._quantize_act — the single formulation that is bit-deterministic
    # across XLA:TPU, Mosaic, and interpret mode (see _quantize_act).
    inv = jnp.float32(np.float32(1.0) / np.float32(scale))
    return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)


def _matmul_i8(a2d, w, ws_scaled, b, compute_dtype, relu):
    """int8 matmul + dequant epilogue; the result is kept in f32 but rounded
    to compute_dtype precision (qdec.round_to) — the un-elidable equivalent
    of the XLA chain's materialized bf16 activation."""
    acc = jax.lax.dot_general(a2d, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = round_to(acc.astype(jnp.float32) * ws_scaled + b, compute_dtype)
    return jax.nn.relu(y) if relu else y


def _block_kernel(
    x_ref, top_ref, bot_ref,
    w1_ref, e1_ref, b1_ref, w2_ref, e2_ref, b2_ref, w3_ref, e3_ref, b3_ref,
    *rest,
    s1, s2, s3, sd, has_down, s_strips, compute_dtype,
):
    if has_down:
        wd_ref, ed_ref, bd_ref, o_ref = rest
    else:
        (o_ref,) = rest
    s = pl.program_id(1)

    x = x_ref[0]  # (S, W, Cin) compute dtype
    top = top_ref[0]  # (1, W, Cin)
    bot = bot_ref[0]
    S, W, cin = x.shape

    # conv1 (1x1) over the extended strip: conv2's 3x3 needs one h1 halo row
    # each side, and h1's halo rows recompute exactly from x's (1x1 conv).
    q1 = _quant(jnp.concatenate([top, x, bot], axis=0), s1)  # (S+2, W, Cin)
    h1 = _matmul_i8(q1.reshape((S + 2) * W, cin), w1_ref[:], e1_ref[:], b1_ref[:], compute_dtype, relu=True)
    cmid = w1_ref.shape[-1]
    h1 = h1.reshape(S + 2, W, cmid)

    # conv2 (3x3 SAME): zero the halo rows where they fall outside the image
    # (SAME padding zeros apply to conv2's INPUT h1, not to x).
    q2 = _quant(h1, s2)
    row0 = jnp.where(s == 0, jnp.zeros_like(q2[:1]), q2[:1])
    rowl = jnp.where(s == s_strips - 1, jnp.zeros_like(q2[-1:]), q2[-1:])
    q2 = jnp.concatenate([row0, q2[1:-1], rowl], axis=0)
    shifted = {b: _shift_cols(q2, b) for b in (-1, 0, 1)}
    acc = None
    for t, (a, b) in enumerate([(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]):
        operand = shifted[b][a + 1 : a + 1 + S].reshape(S * W, cmid)
        d = jax.lax.dot_general(operand, w2_ref[t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    h2 = jax.nn.relu(round_to(acc.astype(jnp.float32) * e2_ref[:] + b2_ref[:], compute_dtype))

    # conv3 (1x1, no relu).
    q3 = _quant(h2, s3)
    inner = _matmul_i8(q3, w3_ref[:], e3_ref[:], b3_ref[:], compute_dtype, relu=False)
    cout = w3_ref.shape[-1]

    # Residual: projection (its own site scale) or identity.
    if has_down:
        qd = _quant(x, sd).reshape(S * W, cin)
        shortcut = _matmul_i8(qd, wd_ref[:], ed_ref[:], bd_ref[:], compute_dtype, relu=False)
    else:
        shortcut = x.reshape(S * W, cin).astype(jnp.float32)  # bf16 input: exact

    # f32 add of compute-dtype-rounded operands, rounded once at the store —
    # identical to XLA's add(bf16, bf16) -> relu -> store chain (relu
    # commutes with RNE: both are monotone and fix 0).
    o_ref[0] = jax.nn.relu(inner + shortcut).reshape(S, W, cout).astype(o_ref.dtype)


def bottleneck_block(x, qb, s1, s2, s3, sd=None, strip_rows=None, compute_dtype=jnp.bfloat16, interpret=False):
    """One stride-1 int8 bottleneck block, bit-identical to

        inner = relu(_int8_conv(qb["conv1"], x, s1))
        inner = relu(_int8_conv(qb["conv2"], inner, s2, padding=((1,1),(1,1))))
        inner = _int8_conv(qb["conv3"], inner, s3)
        shortcut = _int8_conv(qb["down_conv"], x, sd) if "down_conv" in qb else x
        relu(inner + shortcut)

    (models.int8.walk_encoder's stride-1 case). `x` is (N, H, W, Cin) in the
    compute dtype; scales are the block's static calibration scales in site
    order (conv1, conv2, conv3[, down_conv])."""
    n, h, w, cin = x.shape
    has_down = "down_conv" in qb
    assert has_down == (sd is not None), "down_conv and its scale travel together"
    cmid = qb["conv1"]["wq"].shape[-1]
    cout = qb["conv3"]["wq"].shape[-1]
    if not has_down:
        assert cin == cout, "identity residual needs matching channels"
    S = strip_rows or max([s for s in (8, 9, 6, 4, 3, 2) if h % s == 0] or [h])
    assert h % S == 0, "strip_rows must divide H"
    strips = h // S

    def node_args(node, scale):
        wq = jnp.asarray(node["wq"])
        wq = wq.reshape(wq.shape[-2], wq.shape[-1]) if wq.ndim == 4 and wq.shape[0] == 1 else wq
        ws = (node["ws"].astype(jnp.float32) * jnp.float32(scale)).reshape(1, -1)
        b = jnp.asarray(node["b"], jnp.float32).reshape(1, -1) if "b" in node else jnp.zeros_like(ws)
        return wq, ws, b

    w1, e1, b1 = node_args(qb["conv1"], s1)
    w2q = jnp.asarray(qb["conv2"]["wq"]).reshape(9, cmid, cmid)
    e2 = (qb["conv2"]["ws"].astype(jnp.float32) * jnp.float32(s2)).reshape(1, cmid)
    b2 = (
        jnp.asarray(qb["conv2"]["b"], jnp.float32).reshape(1, cmid)
        if "b" in qb["conv2"]
        else jnp.zeros((1, cmid), jnp.float32)
    )
    w3, e3, b3 = node_args(qb["conv3"], s3)

    kernel = functools.partial(
        _block_kernel,
        s1=float(s1), s2=float(s2), s3=float(s3), sd=float(sd) if sd is not None else 0.0,
        has_down=has_down, s_strips=strips, compute_dtype=compute_dtype,
    )

    def top_map(i, s, S=S):
        return (i, jnp.maximum(s * S - 1, 0), 0, 0)

    def bot_map(i, s, S=S, last=h - 1):
        return (i, jnp.minimum((s + 1) * S, last), 0, 0)

    def rep2(i, s):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((1, S, w, cin), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, cin), top_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, cin), bot_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, cmid), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((9, cmid, cmid), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((cmid, cout), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w1, e1, b1, w2q, e2, b2, w3, e3, b3]
    if has_down:
        wd, ed, bd = node_args(qb["down_conv"], sd)
        in_specs += [
            pl.BlockSpec((cin, cout), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
        ]
        args += [wd, ed, bd]

    flops_inner = 2 * (cin * cmid + 9 * cmid * cmid + cmid * cout)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, S, w, cout), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * h * w * (flops_inner + (2 * cin * cout if has_down else 0)),
            bytes_accessed=x.size * x.dtype.itemsize + n * h * w * cout * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def apply_stage_blocks(x, stage, scales, compute_dtype=jnp.bfloat16, interpret=False):
    """Run a whole stride-1 stage (e.g. layer1) block by block; `scales` is
    the flat per-site scale list in walk_encoder order (conv1, conv2, conv3,
    down_conv when present)."""
    it = iter(scales)
    out = x
    for qb in stage:
        s1, s2, s3 = next(it), next(it), next(it)
        sd = next(it) if "down_conv" in qb else None
        out = bottleneck_block(out, qb, s1, s2, s3, sd=sd, compute_dtype=compute_dtype, interpret=interpret)
    return out
