"""Pallas/Mosaic int8 kernels for the decoder's transposed convolutions.

The fused upsample+conv3x3 decoder blocks run as lax.conv with
lhs_dilation=2 over the 4x4 parity-combined kernel
(robosat_tpu.models.layers.fused_upsample_conv3x3; reference decoder:
robosat/unet.py:47-73). XLA:TPU schedules those dilated convolutions at
~35-55% of the chip's int8 peak (docs/PERF.md "Remaining per-step budget"),
which is exactly the case BASELINE.json's north star reserves hand-written
kernels for.

This kernel computes the transposed conv as its four dense parity sub-convs.
Derivation (per axis, x dilated by 2, padded 2, correlated with k4[0..3]):

    out[2i]   = x[i-1] * k4[0] + x[i]   * k4[2]
    out[2i+1] = x[i]   * k4[1] + x[i+1] * k4[3]

so output parity (di, dj) is a 2x2-tap convolution whose taps K-stack into
one (4*Cin, Cout) int8 matmul — a dense contraction with no dilation for
the MXU to trip on. The int32 accumulator equals the XLA conv's accumulator
exactly (integer addition commutes), and the epilogue replicates
models.int8._int8_conv bit for bit: acc * (w_scale * act_scale) + bias in
f32, cast to the compute dtype, relu. Each grid program computes a strip of
S coarse rows for all four parities and interleaves them into the
fine-resolution NHWC output in VMEM.

Inputs arrive as the SAME bf16 activations the XLA path sees; quantization
with the site's static scale happens in-kernel (fused, like XLA's epilogue
fusion). Output is the relu'd compute-dtype activation, drop-in for
models.int8._walk's up_block.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel rows of the 4x4 parity-combined kernel used by each output parity,
# in increasing coarse-offset order (see module docstring derivation).
_PARITY_TAPS = {0: ((-1, 0), (0, 2)), 1: ((0, 1), (1, 3))}  # parity -> (offsets, k4 rows)

def _auto_interpret(interpret):
    """Pallas compiles for TPU only; default to interpret elsewhere (tests
    and tool-level CPU runs exercise the same code path)."""
    return jax.default_backend() != "tpu" if interpret is None else interpret



def round_to(v32, dtype):
    """Round f32 to `dtype`'s precision IN f32, without a convert pair the
    compiler could elide.

    The XLA graphs these kernels replace materialize compute-dtype (bf16)
    activations between convolutions — each one a round-to-nearest-even.
    Inside a single fused kernel, an astype(bf16).astype(f32) chain can be
    folded away (measured in Pallas interpret mode), which shifts the next
    quantization step at exact .5 boundaries and breaks byte-identity with
    the shipped graph. Rounding via the integer bit pattern (u + 0x7fff +
    lsb, truncate the low 16) is the same RNE result and cannot be elided.
    Finite values only (post-epilogue activations are)."""
    if dtype == jnp.float32:
        return v32
    assert dtype == jnp.bfloat16, "only bf16 compute is rounded"
    u = jax.lax.bitcast_convert_type(v32, jnp.uint32)
    u = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)


def parity_tap_weights(wq):
    """(4, 4, Cin, Cout) int8 K4 kernel -> (4, 4, Cin, Cout) per-parity
    per-tap weights: [p = 2*di + dj, tap] with taps in
    ((a0,b0),(a0,b1),(a1,b0),(a1,b1)) order."""
    blocks = []
    for di in (0, 1):
        t_rows = _PARITY_TAPS[di][1]
        for dj in (0, 1):
            t_cols = _PARITY_TAPS[dj][1]
            taps = [wq[tr, tc] for tr in t_rows for tc in t_cols]  # 4 x (Cin, Cout)
            blocks.append(jnp.stack(taps, axis=0))  # (4, Cin, Cout)
    return jnp.stack(blocks, axis=0)


def _shift_cols(x, offset):
    """(S, W, C) shifted along W by `offset` with zero fill (SAME padding)."""
    if offset == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if offset < 0:  # tap reads column j-1: prepend zeros
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def _dec_kernel(x_ref, top_ref, bot_ref, w_ref, ws_ref, b_ref, o_ref, *, s_in, s_strips, compute_dtype):
    """One strip: quantize input rows, per-tap parity matmuls, requant,
    interleave.

    The K-stacked formulation (one (S*W, 4*Cin) operand per parity) measured
    SLOWER than XLA's dilated conv — 16 strip-sized VMEM concat copies per
    program drowned the matmul win. This form materializes only the three
    column-shifted copies of the strip (shared by all parities and taps);
    every operand is then a contiguous row-window view, and each parity
    accumulates four (S*W, Cin) x (Cin, Cout) int32 dots.
    """
    s = pl.program_id(1)
    inv = jnp.float32(np.float32(1.0) / np.float32(s_in))

    def quant(v):
        # Reciprocal-multiply with the same host-f32 reciprocal as
        # int8._quantize_act — bit-deterministic on every backend (division
        # gets reciprocal-approximated differently per backend).
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    x = quant(x_ref[0])  # (S, W, Cin)
    top = quant(top_ref[0])  # (1, W, Cin)
    bot = quant(bot_ref[0])
    # Clamped halo indices alias interior rows at the edges; zero them there
    # (the dilated conv's SAME padding is zero).
    top = jnp.where(s == 0, jnp.zeros_like(top), top)
    bot = jnp.where(s == s_strips - 1, jnp.zeros_like(bot), bot)

    S, W, cin = x.shape
    cout = o_ref.shape[-1]

    # (S+2, W, Cin) extended strip, then its three column-shifted copies —
    # the only strip-sized materializations in the kernel.
    ext = jnp.concatenate([top, x, bot], axis=0)
    shifted = {b: _shift_cols(ext, b) for b in (-1, 0, 1)}

    fine = []
    for di in (0, 1):
        a_offs = _PARITY_TAPS[di][0]
        row_pair = []
        for dj in (0, 1):
            b_offs = _PARITY_TAPS[dj][0]
            p = 2 * di + dj
            acc = None
            for t, (a, b) in enumerate([(a, b) for a in a_offs for b in b_offs]):
                # Row window [a+1, a+1+S) of the extended strip: contiguous.
                operand = shifted[b][a + 1 : a + 1 + S].reshape(S * W, cin)
                d = jax.lax.dot_general(
                    operand, w_ref[p, t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                acc = d if acc is None else acc + d
            y = acc.astype(jnp.float32) * ws_ref[:] + b_ref[:]
            row_pair.append(jax.nn.relu(y.astype(compute_dtype)).reshape(S, W, cout))
        # Interleave columns: (S, W, 2, Cout) -> (S, 2W, Cout).
        fine.append(jnp.stack(row_pair, axis=2).reshape(S, 2 * W, cout))
    # Interleave rows: (S, 2, 2W, Cout) -> (2S, 2W, Cout).
    o_ref[0] = jnp.stack(fine, axis=1).reshape(2 * S, 2 * W, cout)


def _dec_kernel_sep(x_ref, top_ref, bot_ref, w_ref, ws_ref, b_ref, o_ref, *, s_in, s_strips, compute_dtype):
    """Parity-SEPARATED variant of _dec_kernel: the four parity outputs are
    written channel-grouped, (S, W, 4*Cout) with parity p in channels
    [p*Cout, (p+1)*Cout) — i.e. the space-to-depth2 layout of the fine
    output. Skipping the in-VMEM interleave (stack + reshape, ~0.9 ms at
    dec3 shapes) is what makes this form BEAT XLA's dilated conv: 1.44 ms
    vs 1.65 at dec3, batch 8 (docs/PERF.md round 3). A consumer must accept
    blocked layout (the fused tail kernel, models/qtail.py)."""
    s = pl.program_id(1)
    inv = jnp.float32(np.float32(1.0) / np.float32(s_in))

    def quant(v):
        # Same reciprocal-multiply contract as int8._quantize_act.
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    x = quant(x_ref[0])
    top = quant(top_ref[0])
    bot = quant(bot_ref[0])
    top = jnp.where(s == 0, jnp.zeros_like(top), top)
    bot = jnp.where(s == s_strips - 1, jnp.zeros_like(bot), bot)

    S, W, cin = x.shape
    cout = o_ref.shape[-1] // 4

    ext = jnp.concatenate([top, x, bot], axis=0)
    shifted = {b: _shift_cols(ext, b) for b in (-1, 0, 1)}

    outs = []
    for di in (0, 1):
        a_offs = _PARITY_TAPS[di][0]
        for dj in (0, 1):
            b_offs = _PARITY_TAPS[dj][0]
            p = 2 * di + dj
            acc = None
            for t, (a, b) in enumerate([(a, b) for a in a_offs for b in b_offs]):
                operand = shifted[b][a + 1 : a + 1 + S].reshape(S * W, cin)
                d = jax.lax.dot_general(
                    operand, w_ref[p, t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                acc = d if acc is None else acc + d
            y = acc.astype(jnp.float32) * ws_ref[:] + b_ref[:]
            outs.append(jax.nn.relu(y.astype(compute_dtype)).reshape(S, W, cout))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def parity_up_conv_separated(x, node, s_in, strip_rows=None, compute_dtype=jnp.bfloat16, interpret=None):
    """parity_up_conv with space-to-depth2 (channel-grouped parity) output:
    (N, H, W, Cin) -> (N, H, W, 4*Cout), bit-identical to
    layers.space_to_depth2(parity_up_conv(...))."""
    n, h, w, cin = x.shape
    cout = node["wq"].shape[-1]
    S = strip_rows or max([s for s in (2, 3, 4, 8, 9) if h % s == 0] or [h])
    assert h % S == 0, "strip_rows must divide H"
    strips = h // S

    wp = parity_tap_weights(node["wq"])
    ws = (node["ws"].astype(jnp.float32) * jnp.float32(s_in)).reshape(1, cout)
    bias = node.get("b")
    bias = jnp.zeros((1, cout), jnp.float32) if bias is None else jnp.asarray(bias, jnp.float32).reshape(1, cout)

    kernel = functools.partial(_dec_kernel_sep, s_in=float(s_in), s_strips=strips, compute_dtype=compute_dtype)

    def top_map(i, s, S=S):
        return (i, jnp.maximum(s * S - 1, 0), 0, 0)

    def bot_map(i, s, S=S, last=h - 1):
        return (i, jnp.minimum((s + 1) * S, last), 0, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, 4 * cout), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, S, w, cin), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, cin), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, cin), bot_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 4, cin, cout), lambda i, s: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, w, 4 * cout), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 4 * h * w * 4 * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize + n * 4 * h * w * cout * 2,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, x, wp, ws, bias)


def parity_up_conv(x, node, s_in, strip_rows=None, compute_dtype=jnp.bfloat16, interpret=None):
    """Pallas transposed-conv up_block: bf16 x (N, H, W, Cin) -> relu'd
    (N, 2H, 2W, Cout), bit-identical to models.int8._int8_conv with
    padding (2,2) / lhs_dilation (2,2) on node's 4x4 int8 kernel.

    `node` is the quantized tree entry {"wq": (4,4,Cin,Cout) i8, "ws": f32
    (Cout,)}; `s_in` the site's static activation scale.
    """
    n, h, w, cin = x.shape
    cout = node["wq"].shape[-1]
    S = strip_rows or max([s for s in (2, 3, 4, 8, 9) if h % s == 0] or [h])
    assert h % S == 0, "strip_rows must divide H"
    strips = h // S

    wp = parity_tap_weights(node["wq"])
    ws = (node["ws"].astype(jnp.float32) * jnp.float32(s_in)).reshape(1, cout)
    bias = node.get("b")
    bias = jnp.zeros((1, cout), jnp.float32) if bias is None else jnp.asarray(bias, jnp.float32).reshape(1, cout)

    kernel = functools.partial(_dec_kernel, s_in=float(s_in), s_strips=strips, compute_dtype=compute_dtype)

    def top_map(i, s, S=S):
        return (i, jnp.maximum(s * S - 1, 0), 0, 0)

    def bot_map(i, s, S=S, last=h - 1):
        return (i, jnp.minimum((s + 1) * S, last), 0, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, cout), compute_dtype),
        grid_spec=pl.GridSpec(
            grid=(n, strips),
            in_specs=[
                pl.BlockSpec((1, S, w, cin), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
                # One-row halos; clamped at the edges and zeroed in-kernel.
                pl.BlockSpec((1, 1, w, cin), top_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, cin), bot_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 4, cin, cout), lambda i, s: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2 * S, 2 * w, cout), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 4 * h * w * 4 * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize + n * 4 * h * w * cout * 2,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(x, x, x, wp, ws, bias)
