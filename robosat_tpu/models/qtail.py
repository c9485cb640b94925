"""Fused Pallas tail: dec4 + dec5 + prediction head in one VMEM-resident pass.

The deployed int8 predict graph's tail runs three full passes over the
288x288x128 half-resolution feature map (batch 8, 576px buffered input):
dec4's s2d-up conv, dec5's s2d conv, and the fused margin head — with each
intermediate round-tripping HBM (~85-170 MB per pass; per-op trace in
docs/PERF.md "round 3"). XLA fuses elementwise chains into convolutions but
never fuses conv -> conv, so that traffic is structural to the XLA graph.

This kernel is the cross-conv fusion XLA cannot do: each grid program loads
one row-strip of dec3's output (plus halo rows), quantizes it, runs BOTH
3x3 convolutions as 9-tap int8 matmuls (K=128, N=128 — exact MXU lane
sizes) entirely in VMEM, applies the margin head, and writes only the final
uint8 tile bytes. The 3x3 SAME convs operate on the plain 288-space grid —
the space-to-depth structure lives in the (pre-rewritten) kernels
(robosat_tpu.models.layers.s2d_up_conv3x3_kernel / s2d_conv3x3_kernel), so
no parity interleaves appear anywhere.

Numerics: the int32 accumulators match lax.conv_general_dilated's exactly
(integer addition commutes), and the dequant epilogues replicate
models.int8._int8_conv bit for bit (acc * (ws * s) in f32, cast to the
compute dtype, relu). The head replicates ops.head's margin-sigmoid-digitize
chain; only the 32-wide f32 channel reduction has fp reassociation freedom
vs the XLA einsum (tests pin exact agreement on the shipped graphs).

Reference tail: robosat/unet.py:47-73 (DecoderBlock chain) +
robosat/tools/predict.py:87-113 (softmax/digitize/crop).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robosat_tpu.models.qdec import _auto_interpret, round_to
from robosat_tpu.ops.head import _digitize_exact


def _shift_cols(x, offset):
    """(R, W, C) shifted along W by `offset` with zero fill (SAME padding)."""
    if offset == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if offset < 0:  # tap reads column j-1: prepend zeros
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def _conv3x3_strip(q_ext, w_taps, ws_scaled, rows_out, compute_dtype):
    """9-tap 3x3 SAME conv over an extended (rows_out + 2, W, C) int8 strip.

    `w_taps` is (9, Cin, Cout) int8 in (dr, dc) row-major tap order;
    `ws_scaled` the (1, Cout) f32 dequant scale (weight scale x act scale).
    Returns the relu'd compute-dtype (rows_out, W, Cout) strip.
    """
    R, W, cin = q_ext.shape
    shifted = {b: _shift_cols(q_ext, b) for b in (-1, 0, 1)}
    acc = None
    for t, (a, b) in enumerate([(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]):
        operand = shifted[b][a + 1 : a + 1 + rows_out].reshape(rows_out * W, cin)
        d = jax.lax.dot_general(
            operand, w_taps[t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = d if acc is None else acc + d
    cout = w_taps.shape[-1]
    # Round to the compute dtype's precision THEN relu — the exact order of
    # int8._int8_conv + _walk's relu. round_to (qdec) keeps the value in f32
    # but applies the bf16 RNE un-elidably: an astype(bf16).astype(f32) pair
    # would be folded away inside the fused kernel, shifting the next
    # quantization at exact .5 boundaries. The caller's o_ref store performs
    # the final (single) conversion.
    y = round_to(acc.astype(jnp.float32) * ws_scaled, compute_dtype)
    return jax.nn.relu(y).reshape(rows_out, W, cout)


def _tail_kernel(
    x_ref, top_ref, bot_ref, w4_ref, s4_ref, w5_ref, s5_ref, wb_ref, bm_ref, o_ref,
    *, s4_in, s5_in, s_strips, compute_dtype,
):
    s = pl.program_id(1)

    def quant(v, scale):
        # Reciprocal-multiply with the same host-f32 reciprocal as
        # int8._quantize_act — bit-deterministic on every backend.
        inv = jnp.float32(np.float32(1.0) / np.float32(scale))
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    S = x_ref.shape[1]
    x = quant(x_ref[0], s4_in)  # (S, W, C)
    top = quant(top_ref[0], s4_in)  # (2, W, C)
    bot = quant(bot_ref[0], s4_in)
    # Clamped halo indices alias interior rows at the edges; zero them there
    # (SAME padding is zero). Top halo rows are [strip_start-2, strip_start);
    # only the first strip needs zeros (both rows), symmetric at the bottom.
    top = jnp.where(s == 0, jnp.zeros_like(top), top)
    bot = jnp.where(s == s_strips - 1, jnp.zeros_like(bot), bot)

    ext4 = jnp.concatenate([top, x, bot], axis=0)  # (S + 4, W, C)

    # dec4 over S + 2 rows (dec5 needs one halo row each side).
    y4 = _conv3x3_strip(ext4, w4_ref, s4_ref[:], S + 2, compute_dtype)
    q5 = quant(y4, s5_in)
    # First/last strips: dec5's halo rows beyond the image are zero. q5's
    # edge rows were computed from zero-padded dec4 input, which yields
    # relu(bias-free dequant of 0) = 0 only when taps cancel — they don't,
    # so zero them explicitly where they fall outside the image.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, q5.shape, 0)
    first_bad = jnp.logical_and(s == 0, row_idx == 0)
    last_bad = jnp.logical_and(s == s_strips - 1, row_idx == q5.shape[0] - 1)
    q5 = jnp.where(jnp.logical_or(first_bad, last_bad), jnp.zeros_like(q5), q5)

    y5 = _conv3x3_strip(q5, w5_ref, s5_ref[:], S, compute_dtype)  # (S, W, C) f32, bf16-rounded

    # Margin head: the SAME block-diagonal margin matmul the XLA blocked
    # head runs (ops.head.fused_prediction_head_s2d_blocked's
    # kron(eye(4), wm) einsum) — the original reshape-reduce formulation
    # ((S, W, 4, 32).sum(-1)) crashes the Mosaic compiler (tpu.reshape
    # cannot split the 128-lane dim; bisected in
    # benchmarks/bisect_mosaic_head.py), so the MXU does the reduction.
    W = y5.shape[1]
    margin = jax.lax.dot_general(
        y5.astype(jnp.float32).reshape(S * W, 128), wb_ref[:],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(S, W, 4) + bm_ref[0]
    # No clip: the int32 -> uint8 cast carries the reference's p == 1.0
    # wraparound quirk (digitize index 256 -> palette 0). The output block
    # pads the 4 parity lanes to 128 — every narrower uint8 minormost block
    # (4, 8) and the (W, 4) -> 4W row-major merge crash Mosaic (bisect
    # rungs digitize_mm_pad4/pad8/merge_mm); the caller slices [..., :4].
    q = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)
    o_ref[0] = jnp.pad(q, ((0, 0), (0, 0), (0, 124)))


def _tail_features_kernel(
    x_ref, top_ref, bot_ref, w4_ref, s4_ref, w5_ref, s5_ref, o_ref,
    *, s4_in, s5_in, s_strips, compute_dtype,
):
    """dec4 + dec5 only (no head): the portion of _tail_kernel that is
    proven to compile and run through the remote Mosaic compiler (the head
    stage crashes it — docs/PERF.md round 3). Emits the relu'd dec5
    activations for the existing XLA fused head."""
    s = pl.program_id(1)

    def quant(v, scale):
        # Same reciprocal-multiply contract as int8._quantize_act.
        inv = jnp.float32(np.float32(1.0) / np.float32(scale))
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    S = x_ref.shape[1]
    x = quant(x_ref[0], s4_in)
    top = quant(top_ref[0], s4_in)
    bot = quant(bot_ref[0], s4_in)
    top = jnp.where(s == 0, jnp.zeros_like(top), top)
    bot = jnp.where(s == s_strips - 1, jnp.zeros_like(bot), bot)

    ext4 = jnp.concatenate([top, x, bot], axis=0)
    y4 = _conv3x3_strip(ext4, w4_ref, s4_ref[:], S + 2, compute_dtype)
    q5 = quant(y4, s5_in)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, q5.shape, 0)
    first_bad = jnp.logical_and(s == 0, row_idx == 0)
    last_bad = jnp.logical_and(s == s_strips - 1, row_idx == q5.shape[0] - 1)
    q5 = jnp.where(jnp.logical_or(first_bad, last_bad), jnp.zeros_like(q5), q5)

    o_ref[0] = _conv3x3_strip(q5, w5_ref, s5_ref[:], S, compute_dtype).astype(o_ref.dtype)


def fused_tail_features(x, node4, s4, node5, s5, strip_rows=8, compute_dtype=jnp.bfloat16, interpret=None):
    """dec3 activations (N, H, W, 128) bf16 -> dec5 activations (N, H, W,
    128), matching

        y4 = relu(_int8_conv(node4, x, s4))          # s2d_up dec4
        y5 = relu(_int8_conv(node5, y4, s5))         # s2d dec5

    bit for bit (tests/test_qtail.py) with both convolutions VMEM-resident
    per strip — one HBM read of dec3 and one write of dec5 instead of the
    XLA chain's three full passes. The caller applies the existing fused
    head (ops.head.fused_prediction_head_s2d_blocked)."""
    n, h, w, c = x.shape
    assert c == 128 and node4["wq"].shape[-1] == 128 and node5["wq"].shape[-1] == 128
    S = strip_rows
    assert h % S == 0, "strip_rows must divide H"
    strips = h // S

    w4 = tap_weights(node4["wq"])
    ws4 = (node4["ws"].astype(jnp.float32) * jnp.float32(s4)).reshape(1, 128)
    w5 = tap_weights(node5["wq"])
    ws5 = (node5["ws"].astype(jnp.float32) * jnp.float32(s5)).reshape(1, 128)

    kernel = functools.partial(
        _tail_features_kernel, s4_in=float(s4), s5_in=float(s5), s_strips=strips, compute_dtype=compute_dtype
    )

    def top_map(i, s, S=S):
        return (i, jnp.maximum(s * S - 2, 0) // 2, 0, 0)

    def bot_map(i, s, S=S, h=h):
        return (i, jnp.minimum((s + 1) * S, h - 2) // 2, 0, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, S, w, c), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, w, c), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, w, c), bot_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, c, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((9, c, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, w, c), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h * w * 9 * 128 * 128,
            bytes_accessed=x.size * x.dtype.itemsize + n * h * w * c * 2,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, x, w4, ws4, w5, ws5)


def tap_weights(wq):
    """(3, 3, Cin, Cout) int8 kernel -> (9, Cin, Cout) in row-major tap order."""
    return jnp.asarray(wq).reshape(9, wq.shape[2], wq.shape[3])


# ---------------------------------------------------------------------------
# Parity-SEPARATED tail: consumes dec3 in space-to-depth2 layout
# ---------------------------------------------------------------------------


def _sep_conv3x3(shifted, w_ref, ws_scaled, row_lo_off, rows_out, Wc, cin, compute_dtype):
    """The four fine-parity outputs of a 3x3 SAME conv over a fine grid held
    as parity planes.

    `shifted[(p, sc)]` is parity plane p (fine position (2i + p//2,
    2j + p%2)) column-shifted by `sc` coarse columns with zero fill; planes
    span coarse rows [row_lo, row_lo + R). The output for fine parity
    q = (qr, qc) at coarse row k (absolute coarse row row_lo + row_lo_off
    + k) decomposes per tap (a, b) into plane (qr+a)&1 / (qc+b)&1 at coarse
    shift ((qr+a)>>1, (qc+b)>>1) — 9 dense int8 matmuls per parity, no
    dilation, no interleave. Returns {(qr, qc): (rows_out, Wc, Cout) f32
    rounded to compute_dtype} (qdec.round_to keeps the RNE un-elidable)."""
    outs = {}
    for qr in (0, 1):
        for qc in (0, 1):
            acc = None
            for a in (-1, 0, 1):
                pr, sr = (qr + a) & 1, (qr + a) >> 1
                for b in (-1, 0, 1):
                    pc, sc = (qc + b) & 1, (qc + b) >> 1
                    lo = row_lo_off + sr
                    operand = shifted[(2 * pr + pc, sc)][lo : lo + rows_out].reshape(rows_out * Wc, cin)
                    d = jax.lax.dot_general(
                        operand, w_ref[3 * (a + 1) + (b + 1)], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = d if acc is None else acc + d
            y = round_to(acc.astype(jnp.float32) * ws_scaled, compute_dtype)
            outs[(qr, qc)] = jax.nn.relu(y).reshape(rows_out, Wc, -1)
    return outs


def _tail_features_sep_kernel(
    x_ref, top_ref, bot_ref, w4_ref, s4_ref, w5_ref, s5_ref, o_ref, *, s4_in, s5_in, s_strips, compute_dtype
):
    """dec4 + dec5 over a SEPARATED strip: input and output are parity
    planes (space_to_depth2 of the 288-grid, channels [p*128, (p+1)*128)).
    The fine-grid rows never materialize — each conv runs as the 4x9 plane
    matmuls of _sep_conv3x3 — so the ~0.9 ms in-VMEM parity interleave the
    interleaved dec3 kernel pays (docs/PERF.md round 3) does not exist on
    this path."""
    s = pl.program_id(1)

    def quant(v, scale):
        # Same reciprocal-multiply contract as int8._quantize_act.
        inv = jnp.float32(np.float32(1.0) / np.float32(scale))
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    Sc = x_ref.shape[1]
    x = quant(x_ref[0], s4_in)  # (Sc, Wc, 4C)
    top = quant(top_ref[0], s4_in)  # (2, Wc, 4C) coarse halo rows
    bot = quant(bot_ref[0], s4_in)
    # Out-of-image halos (clamped block maps alias interior rows): dec4's
    # SAME padding is zero beyond the fine image, which in coarse rows is
    # exactly the first/last strip's halo block.
    top = jnp.where(s == 0, jnp.zeros_like(top), top)
    bot = jnp.where(s == s_strips - 1, jnp.zeros_like(bot), bot)

    ext = jnp.concatenate([top, x, bot], axis=0)  # (Sc+4, Wc, 4C)
    Wc = ext.shape[1]
    C = ext.shape[-1] // 4

    shifted4 = {
        (p, sc): _shift_cols(ext[:, :, p * C : (p + 1) * C], sc) for p in range(4) for sc in (-1, 0, 1)
    }
    # dec4 over coarse rows [strip-1, strip+Sc+1): one halo row each side for
    # dec5. ext row 0 is absolute coarse strip-2, so row_lo_off = 1.
    y4 = _sep_conv3x3(shifted4, w4_ref, s4_ref[:], 1, Sc + 2, Wc, C, compute_dtype)

    # dec5's SAME padding: the fine rows beyond the image are zero, but y4's
    # out-of-image coarse rows were computed from zero-padded INPUT and are
    # nonzero dec4 outputs — replace them (coarse row strip-1 covers fine
    # rows -2/-1 on the first strip; symmetric at the bottom).
    q5 = {}
    for key, y in y4.items():
        q = quant(y, s5_in)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
        first_bad = jnp.logical_and(s == 0, row_idx == 0)
        last_bad = jnp.logical_and(s == s_strips - 1, row_idx == q.shape[0] - 1)
        q5[key] = jnp.where(jnp.logical_or(first_bad, last_bad), jnp.zeros_like(q), q)

    shifted5 = {
        (2 * qr + qc, sc): _shift_cols(q5[(qr, qc)], sc)
        for qr in (0, 1)
        for qc in (0, 1)
        for sc in (-1, 0, 1)
    }
    y5 = _sep_conv3x3(shifted5, w5_ref, s5_ref[:], 1, Sc, Wc, C, compute_dtype)
    o_ref[0] = jnp.concatenate([y5[(0, 0)], y5[(0, 1)], y5[(1, 0)], y5[(1, 1)]], axis=-1).astype(o_ref.dtype)


def fused_tail_features_sep(x, node4, s4, node5, s5, strip_rows=4, compute_dtype=jnp.bfloat16, interpret=None):
    """`fused_tail_features` on space-to-depth2 layout end to end:
    (N, Hc, Wc, 512) separated dec3 (qdec.parity_up_conv_separated) ->
    (N, Hc, Wc, 512) separated dec5 activations, bit-identical to
    space_to_depth2(fused_tail_features(depth_to_space2-input)). The caller
    applies ops.head.fused_prediction_head_s2d_blocked_sep."""
    n, hc, wc, c4 = x.shape
    assert c4 == 512 and node4["wq"].shape[-1] == 128 and node5["wq"].shape[-1] == 128
    Sc = strip_rows
    assert Sc % 2 == 0, "halo block maps index in 2-coarse-row blocks"
    assert hc % Sc == 0, "strip_rows must divide the coarse height"
    strips = hc // Sc

    w4 = tap_weights(node4["wq"])
    ws4 = (node4["ws"].astype(jnp.float32) * jnp.float32(s4)).reshape(1, 128)
    w5 = tap_weights(node5["wq"])
    ws5 = (node5["ws"].astype(jnp.float32) * jnp.float32(s5)).reshape(1, 128)

    kernel = functools.partial(
        _tail_features_sep_kernel, s4_in=float(s4), s5_in=float(s5), s_strips=strips, compute_dtype=compute_dtype
    )

    def top_map(i, s, S=Sc):
        return (i, jnp.maximum(s * S - 2, 0) // 2, 0, 0)

    def bot_map(i, s, S=Sc, hc=hc):
        return (i, jnp.minimum((s + 1) * S, hc - 2) // 2, 0, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hc, wc, c4), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, Sc, wc, c4), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, wc, c4), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, wc, c4), bot_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, 128, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((9, 128, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Sc, wc, c4), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * (4 * hc * wc) * 9 * 128 * 128,
            bytes_accessed=x.size * x.dtype.itemsize + n * hc * wc * c4 * 2,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, x, w4, ws4, w5, ws5)


def fused_tail(
    x, node4, s4, node5, s5, w_final, b_final, overlap=0, strip_rows=8, compute_dtype=jnp.bfloat16, interpret=None
):
    """dec3 activations (N, H, W, 128) bf16 -> parity-blocked quantized
    uint8 (N, H - overlap, W - overlap, 4), matching

        y4 = relu(_int8_conv(node4, x, s4))          # s2d_up dec4
        y5 = relu(_int8_conv(node5, y4, s5))         # s2d dec5
        fused_prediction_head_s2d_blocked(y5, w_final, b_final, overlap)

    on the shipped int8 graph (models/int8._walk tail).
    """
    n, h, w, c = x.shape
    assert c == 128 and node4["wq"].shape[-1] == 128 and node5["wq"].shape[-1] == 128
    S = strip_rows
    assert h % S == 0, "strip_rows must divide H"
    strips = h // S

    w4 = tap_weights(node4["wq"])
    ws4 = (node4["ws"].astype(jnp.float32) * jnp.float32(s4)).reshape(1, 128)
    w5 = tap_weights(node5["wq"])
    ws5 = (node5["ws"].astype(jnp.float32) * jnp.float32(s5)).reshape(1, 128)

    w2 = jnp.asarray(w_final).reshape(32, 2)
    b2 = jnp.asarray(b_final).reshape(2)
    # Block-diagonal margin matrix — identical to the XLA blocked head's
    # kron(eye(4), wm) operand (ops/head.py:142).
    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    wblock = jnp.kron(jnp.eye(4, dtype=jnp.float32), wm.reshape(32, 1))  # (128, 4)
    bm = (b2[1] - b2[0]).astype(jnp.float32).reshape(1)

    kernel = functools.partial(
        _tail_kernel, s4_in=float(s4), s5_in=float(s5), s_strips=strips, compute_dtype=compute_dtype
    )

    def top_map(i, s, S=S):
        # 2-row halo block above the strip; block height 2 => index in 2-row
        # units, clamped to 0 at the first strip (zeroed in-kernel).
        return (i, jnp.maximum(s * S - 2, 0) // 2, 0, 0)

    def bot_map(i, s, S=S, h=h):
        return (i, jnp.minimum((s + 1) * S, h - 2) // 2, 0, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, 128), jnp.uint8),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, S, w, c), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, w, c), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, w, c), bot_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, c, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((9, c, 128), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 4), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, S, w, 128), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h * w * 9 * 128 * 128,
            bytes_accessed=x.size * x.dtype.itemsize + n * h * w * 128,
            transcendentals=n * h * w * 4,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, x, w4, ws4, w5, ws5, wblock, bm)

    out = out[..., :4]  # drop the Mosaic lane padding
    o = overlap // 2
    if o:
        out = out[:, o:-o, o:-o, :]
    return out
