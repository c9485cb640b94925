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

from robosat_tpu.models.qdec import _auto_interpret, round_to


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


def bottleneck_block(x, qb, s1, s2, s3, sd=None, strip_rows=None, compute_dtype=jnp.bfloat16, interpret=None):
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
        interpret=_auto_interpret(interpret),
    )(*args)


def _even_rows(x, parity):
    """(2R[+pad], W, C) -> rows of the given parity via reshape + static
    slice (no strided loads for Mosaic to trip on). Input must have an even
    row count; returns R rows."""
    r2, w, c = x.shape
    return x.reshape(r2 // 2, 2, w, c)[:, parity]


def _even_cols(x, parity):
    """(R, 2W, C) -> columns of the given parity (reshape + static slice)."""
    r, w2, c = x.shape
    return x.reshape(r, w2 // 2, 2, c)[:, :, parity]


def _block_s2_kernel(
    x_ref, top_ref,
    w1_ref, e1_ref, b1_ref, w2_ref, e2_ref, b2_ref, w3_ref, e3_ref, b3_ref, wd_ref, ed_ref, bd_ref,
    o_ref,
    *, s1, s2, s3, sd, s_strips, compute_dtype,
):
    """Stride-2 bottleneck block (layers 2-4 first blocks): conv1 1x1 ->
    conv2 3x3 stride 2 (torch pads (1,1)) -> conv3 1x1, plus the stride-2
    down projection. Output strip of So rows consumes input rows
    [2*o0 - 1, 2*o0 + 2*So): one top halo row, no bottom halo (the stride-2
    window never reaches past the last input row of the strip)."""
    s = pl.program_id(1)

    x = x_ref[0]  # (2*So, W, Cin)
    top = top_ref[0]  # (1, W, Cin) fine row 2*o0 - 1 (clamped at the image top)
    r2, W, cin = x.shape
    So = r2 // 2
    Wo = W // 2

    q1 = _quant(jnp.concatenate([top, x], axis=0), s1)  # (2*So + 1, W, Cin)
    h1 = _matmul_i8(q1.reshape((r2 + 1) * W, cin), w1_ref[:], e1_ref[:], b1_ref[:], compute_dtype, relu=True)
    cmid = w1_ref.shape[-1]
    h1 = h1.reshape(r2 + 1, W, cmid)

    # conv2's SAME-zero padding applies to its INPUT h1: the halo row is
    # fine row -1 on the first strip (conv1(0) != 0 — folded bias), zero it.
    q2 = _quant(h1, s2)
    row0 = jnp.where(s == 0, jnp.zeros_like(q2[:1]), q2[:1])
    q2 = jnp.concatenate([row0, q2[1:], jnp.zeros_like(q2[:1])], axis=0)  # pad to 2*So + 2 rows
    # Row taps a in {0,1,2} relative to q2 row 0 (fine 2*o0 - 1): output row
    # r reads q2[2r + a]. Even/odd row planes via reshape (q2 now has an
    # even row count); col taps select even columns of the col-shifted
    # copies the same way.
    even = _even_rows(q2, 0)  # rows 0, 2, ... (taps a=0 at [r], a=2 at [r+1])
    odd = _even_rows(q2, 1)  # rows 1, 3, ... (tap a=1 at [r])
    acc = None
    for t, (a, b) in enumerate([(a, b) for a in (0, 1, 2) for b in (-1, 0, 1)]):
        rows = even[a // 2 : a // 2 + So] if a != 1 else odd[:So]
        operand = _even_cols(_shift_cols(rows, b), 0).reshape(So * Wo, cmid)
        d = jax.lax.dot_general(operand, w2_ref[t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    h2 = jax.nn.relu(round_to(acc.astype(jnp.float32) * e2_ref[:] + b2_ref[:], compute_dtype))

    q3 = _quant(h2, s3)
    inner = _matmul_i8(q3, w3_ref[:], e3_ref[:], b3_ref[:], compute_dtype, relu=False)
    cout = w3_ref.shape[-1]

    # Stride-2 projection reads the even rows/cols of the strip.
    xd = _even_cols(_even_rows(x, 0), 0)  # (So, Wo, Cin)
    qd = _quant(xd, sd).reshape(So * Wo, cin)
    shortcut = _matmul_i8(qd, wd_ref[:], ed_ref[:], bd_ref[:], compute_dtype, relu=False)

    o_ref[0] = jax.nn.relu(inner + shortcut).reshape(So, Wo, cout).astype(o_ref.dtype)


def bottleneck_block_s2(x, qb, s1, s2, s3, sd, strip_rows=None, compute_dtype=jnp.bfloat16, interpret=None):
    """One stride-2 int8 bottleneck block (always carries the down
    projection), bit-identical to walk_encoder's stride-2 case:

        inner = relu(_int8_conv(qb["conv1"], x, s1))
        inner = relu(_int8_conv(qb["conv2"], inner, s2, stride=2, padding=((1,1),(1,1))))
        inner = _int8_conv(qb["conv3"], inner, s3)
        relu(inner + _int8_conv(qb["down_conv"], x, sd, stride=2))

    `x` is (N, H, W, Cin), output (N, H/2, W/2, Cout)."""
    n, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, "stride-2 block needs even spatial dims"
    assert "down_conv" in qb, "stride-2 bottlenecks always project"
    ho = h // 2
    cmid = qb["conv1"]["wq"].shape[-1]
    cout = qb["conv3"]["wq"].shape[-1]
    So = strip_rows or max([s for s in (8, 9, 6, 4, 3, 2) if ho % s == 0] or [ho])
    assert ho % So == 0, "strip_rows must divide H/2"
    strips = ho // So

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
    wd, ed, bd = node_args(qb["down_conv"], sd)

    kernel = functools.partial(
        _block_s2_kernel,
        s1=float(s1), s2=float(s2), s3=float(s3), sd=float(sd), s_strips=strips, compute_dtype=compute_dtype,
    )

    def top_map(i, s, So=So):
        return (i, jnp.maximum(2 * s * So - 1, 0), 0, 0)

    def rep2(i, s):
        return (0, 0)

    wo = w // 2
    flops = 2 * n * (h * w * cin * cmid + ho * wo * (9 * cmid * cmid + cmid * cout + cin * cout))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ho, w // 2, cout), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, 2 * So, w, cin), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, cin), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((cin, cmid), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, cmid, cmid), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((cmid, cout), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((cin, cout), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), rep2, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, So, w // 2, cout), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + n * ho * wo * cout * 2,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, w1, e1, b1, w2q, e2, b2, w3, e3, b3, wd, ed, bd)


def apply_stage_blocks(x, stage, scales, first_stride=1, compute_dtype=jnp.bfloat16, interpret=None):
    """Run a whole stage block by block; `scales` is the flat per-site scale
    list in walk_encoder order (conv1, conv2, conv3, down_conv when
    present). `first_stride=2` runs block 0 as the stride-2 kernel (layers
    2-4); remaining blocks are always stride 1."""
    it = iter(scales)
    out = x
    for bi, qb in enumerate(stage):
        s1, s2, s3 = next(it), next(it), next(it)
        sd = next(it) if "down_conv" in qb else None
        if bi == 0 and first_stride == 2:
            out = bottleneck_block_s2(out, qb, s1, s2, s3, sd, compute_dtype=compute_dtype, interpret=interpret)
        else:
            out = bottleneck_block(out, qb, s1, s2, s3, sd=sd, compute_dtype=compute_dtype, interpret=interpret)
    return out
