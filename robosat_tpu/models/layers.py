"""Functional neural-net building blocks for TPU (NHWC, pytree params).

The compute path is plain JAX traced under jit/pjit: convolutions lower onto
the MXU via lax.conv_general_dilated, batch norm and activations fuse into the
surrounding convs under XLA. Parameters and batch-norm running statistics are
nested dicts of arrays (pytrees) so sharding/checkpointing stay trivial.

Layout: NHWC activations, HWIO conv kernels — the TPU-native layout (channels
in the minormost, 128-lane dimension).
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

# NHWC activations / HWIO weights everywhere.
CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def init_rng(seed_or_key):
    """A host-side numpy Generator from an int seed or a jax PRNGKey.

    Parameter init runs once on the host; numpy avoids dispatching hundreds
    of tiny XLA programs (one per layer) during model construction.
    """
    if isinstance(seed_or_key, np.random.Generator):
        return seed_or_key
    seed = np.asarray(seed_or_key).ravel()
    return np.random.default_rng([int(s) for s in seed])


def he_normal(rng, shape, fan_out=True):
    """Kaiming/He normal init (fan_out mode, like torchvision's ResNet)."""
    kh, kw, cin, cout = shape
    fan = kh * kw * (cout if fan_out else cin)
    std = np.sqrt(2.0 / fan)
    return (std * rng.standard_normal(shape)).astype(np.float32)


def conv_init(rng, kh, kw, cin, cout):
    return {"w": he_normal(rng, (kh, kw, cin, cout))}


def conv_apply(params, x, stride=1, padding="SAME", dilation=1):
    w = params["w"].astype(x.dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=CONV_DIMS,
    )


def bn_init(channels):
    params = {
        "scale": np.ones((channels,), np.float32),
        "bias": np.zeros((channels,), np.float32),
    }
    state = {
        "mean": np.zeros((channels,), np.float32),
        "var": np.ones((channels,), np.float32),
    }
    return params, state


def bn_apply(params, state, x, train, momentum=0.1, eps=1e-5):
    """Batch normalization over (N, H, W) with running statistics.

    In training mode the statistics are computed over the *global* batch: when
    the batch axis is sharded over a mesh under pjit, the mean/var reductions
    compile to cross-replica collectives automatically, i.e. sync-BN for free
    (the reference's DataParallel computes per-replica stats instead; see
    SURVEY.md section 7 "BatchNorm under data parallelism").
    """
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = lax.rsqrt(var + eps) * params["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


def fold_conv_bn(conv_params, bn_params, bn_state, eps=1e-5):
    """Fold an inference-mode batch norm into the preceding conv.

    conv -> BN(affine with frozen stats) == conv with per-output-channel
    rescaled weights plus a bias:

      W' = W * scale / sqrt(var + eps)      b' = bias - mean * scale / sqrt(..)

    Removes every BN elementwise pass from the prediction graph — the eval
    path becomes pure conv(+bias)+relu chains, cutting HBM round trips. Uses
    jnp so it works both on host arrays and traced inside the jitted step
    (the per-step folding cost is one pass over the weights, ~0.4 ms).
    """
    inv = jnp.asarray(bn_params["scale"]) * lax.rsqrt(jnp.asarray(bn_state["var"], jnp.float32) + eps)
    w = jnp.asarray(conv_params["w"]) * inv  # broadcast over HWIO's O axis
    b = jnp.asarray(bn_params["bias"]) - jnp.asarray(bn_state["mean"]) * inv
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def conv_bias_apply(params, x, stride=1, padding="SAME", dilation=1):
    return conv_apply(params, x, stride=stride, padding=padding, dilation=dilation) + params["b"].astype(x.dtype)


def max_pool(x, window, stride, padding):
    """Max pooling; `padding` is an int applied symmetrically to H and W."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsampling (the reference decoder's interpolate,
    robosat/unet.py:73)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def fused_upsample_conv3x3(params, x):
    """Nearest-2x upsample followed by 3x3 SAME conv, without materializing
    the upsampled tensor — an algebraic rewrite XLA cannot discover.

    nearest-up(x) is a transposed conv of x with a 2x2 box kernel at stride 2,
    so up+conv3x3 composes into ONE transposed convolution with the 4x4
    parity-combined kernel (per axis, taps d=-1..1 on the upsampled grid
    collapse onto low-res taps with summed weights):

      K4 rows = [W0, W0+W1, W1+W2, W2]   (same along columns)

    expressed as lax.conv with lhs_dilation=2 and padding 2. One op replaces
    upsample + conv (+ any interleave): 4/9 of the naive MACs, no 4x-sized
    upsampled intermediate in HBM, and XLA's TPU lowering splits the dilation
    into dense parity convolutions internally (measured: ~18% fewer program
    bytes than a hand-written parity-plane interleave). Equivalent to
    upsample+conv up to fp summation order (weights are pre-summed).
    """
    w3 = params["w"]  # (3, 3, Cin, Cout)
    kh, kw, cin, cout = w3.shape
    assert kh == 3 and kw == 3, "rewrite is specific to 3x3 kernels"

    sets = ((0,), (0, 1), (1, 2), (2,))
    k4 = jnp.stack(
        [
            jnp.stack([sum(w3[r, c] for r in rows for c in cols) for cols in sets], axis=0)
            for rows in sets
        ],
        axis=0,
    )  # (4, 4, Cin, Cout)

    return lax.conv_general_dilated(
        x,
        k4.astype(x.dtype),
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=CONV_DIMS,
    )


# ---------------------------------------------------------------------------
# Space-to-depth decoder tail
#
# Fine-resolution activations with few channels (576px x 32ch in the U-Net
# tail) are lane-padded by XLA:TPU toward the 128-lane register width: the
# buffers cost up to 4x their logical bytes and the tail runs far off the
# bandwidth roofline (measured: the dec5 3x3 conv at 8x576px/32ch takes
# 4.5 ms standalone vs 1.25 ms for the algebraically identical 288px/128ch
# space-to-depth form, despite the latter's denser kernel). The rewrites
# below keep the tail at half resolution with parity-blocked channels
# (block p = 2*di + dj holds fine pixel (2i+di, 2j+dj)) so every buffer is
# exactly 128 lanes. Equivalent to the fine-grid ops up to fp summation
# order; tests/test_s2d.py pins both transforms against the naive path.
# ---------------------------------------------------------------------------

# Row/col tap maps: for output parity d, coarse offset a, which fine conv taps
# t (kernel rows 0..2 = offsets -1..1) land there. Derivation: fine index
# q = 2i + d + t - 1 has coarse cell i + floor((d+t-1)/2).
_UPS_TAPS = {  # nearest-2x upsample + conv3x3: input is coarse (pre-upsample)
    0: {-1: (0,), 0: (1, 2), 1: ()},
    1: {-1: (), 0: (0, 1), 1: (2,)},
}


def s2d_up_conv3x3_kernel(w3):
    """Kernel for nearest-2x upsample + 3x3 SAME conv emitting space-to-depth
    output: (3, 3, Cin, Cout) -> (3, 3, Cin, 4*Cout), parity-blocked."""
    kh, kw, cin, cout = w3.shape
    assert kh == 3 and kw == 3
    blocks = []
    for di in (0, 1):
        for dj in (0, 1):
            rows = []
            for a in (-1, 0, 1):
                cols = []
                for b in (-1, 0, 1):
                    taps = [w3[t, s] for t in _UPS_TAPS[di][a] for s in _UPS_TAPS[dj][b]]
                    cols.append(sum(taps) if taps else jnp.zeros((cin, cout), w3.dtype))
                rows.append(jnp.stack(cols, axis=0))
            blocks.append(jnp.stack(rows, axis=0))  # (3, 3, Cin, Cout)
    return jnp.concatenate(blocks, axis=-1)  # (3, 3, Cin, 4*Cout)


def s2d_conv3x3_kernel(w3):
    """Kernel for a fine-grid 3x3 SAME conv expressed on the space-to-depth
    grid: (3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout), parity-blocked both
    sides. Fine tap t from output parity d reads input parity (d+t-1) mod 2
    at coarse offset floor((d+t-1)/2); each (d, t) maps to a unique slot."""
    kh, kw, cin, cout = w3.shape
    assert kh == 3 and kw == 3
    k = jnp.zeros((3, 3, 4 * cin, 4 * cout), w3.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for t in range(3):
                for s in range(3):
                    a, ei = (di + t - 1) // 2, (di + t - 1) % 2
                    b, ej = (dj + s - 1) // 2, (dj + s - 1) % 2
                    k = k.at[
                        a + 1,
                        b + 1,
                        (2 * ei + ej) * cin : (2 * ei + ej + 1) * cin,
                        (2 * di + dj) * cout : (2 * di + dj + 1) * cout,
                    ].set(w3[t, s])
    return k


# ---------------------------------------------------------------------------
# Space-to-depth STEM (input side)
#
# The ResNet stem (7x7/s2 conv on 3-channel input + 3x3/s2 max pool,
# robosat/resnet torchvision layout; reference robosat/unet.py:87-97 reuses
# torchvision's) is im2col-bound on TPU: with 3 input channels the MXU
# contraction is ~21 elements wide and the conv sustains <8 of ~130 TFLOPs
# (measured: 1.65 ms of a ~12 GFLOP conv at 8x576px). Blocking the input
# 4x4 space-to-depth (= the stem's total stride) turns it into a 3x3 conv
# over 16*Cin = 48 channels emitting all four 2x2 output parities at once —
# a ~432-wide contraction that runs near MXU speed. The blocking itself is
# a pure numpy reshape done on the HOST (the predict loader's decode
# workers): on-device u8 transposes of the same data cost ~1 ms/batch.
# Algebraically identical to conv7x7/s2 + pool up to fp summation order.
# ---------------------------------------------------------------------------


def space_to_depth4(x):
    """(N, 4H, 4W, C) -> (N, H, W, 16C), block slot (er, ec) channel-minor:
    out channel index = (er * 4 + ec) * C + c. Works on numpy or jnp arrays."""
    n, h4, w4, c = x.shape
    x = x.reshape(n, h4 // 4, 4, w4 // 4, 4, c)
    if isinstance(x, np.ndarray):
        return np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5)).reshape(n, h4 // 4, w4 // 4, 16 * c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h4 // 4, w4 // 4, 16 * c)


def stem_s2d4_kernel(w7):
    """7x7/stride-2 stem kernel -> its 4x4-space-to-depth form.

    (7, 7, Cin, Cout) -> (3, 3, 16*Cin, 4*Cout): a 3x3 SAME conv over the
    4x4-blocked grid computing all four output parities (fi, fj) of the
    stride-2 fine conv. Output parity p = 2*fi + fj occupies channels
    [p*Cout, (p+1)*Cout); input slot (er, ec) holds fine pixel
    (4I + er, 4J + ec). Fine tap (t, s) of output parity at coarse (a, b):
    t = 4a + er + 3 - 2*fi (pad-3 fine conv), kept when 0 <= t <= 6.
    """
    kh, kw, cin, cout = w7.shape
    assert kh == 7 and kw == 7, "rewrite is specific to the 7x7 stem"
    # Pad taps to 8x8 so index 7 reads zeros; gather with static index maps
    # (traceable: `w7` may be a jit-traced parameter).
    w7p = jnp.pad(jnp.asarray(w7), ((0, 1), (0, 1), (0, 0), (0, 0)))
    blocks = []
    for fi in (0, 1):
        for fj in (0, 1):
            t_map = np.full((3, 3, 16), 7)
            s_map = np.full((3, 3, 16), 7)
            for ai, a in enumerate((-1, 0, 1)):
                for bi, b in enumerate((-1, 0, 1)):
                    for er in range(4):
                        for ec in range(4):
                            t = 4 * a + er + 3 - 2 * fi
                            s = 4 * b + ec + 3 - 2 * fj
                            if 0 <= t <= 6 and 0 <= s <= 6:
                                t_map[ai, bi, er * 4 + ec] = t
                                s_map[ai, bi, er * 4 + ec] = s
            blocks.append(w7p[t_map, s_map].reshape(3, 3, 16 * cin, cout))
    return jnp.concatenate(blocks, axis=-1)


def pool3s2_from_parity(x, cout):
    """3x3/stride-2/pad-1 max pool of a fine grid given as 2x2 parity blocks.

    x: (N, H, W, 4*cout) parity-blocked (p = 2*fi + fj holds fine pixel
    (2I + fi, 2J + fj)); returns the pooled fine grid (N, H, W, cout).
    Pool output (I, J) covers fine rows 2I-1..2I+1 = parity-1 of block I-1
    and parities 0, 1 of block I (same for columns): nine shifted candidates
    reduced with max — XLA fuses them into one pass over the four planes.
    """
    p = [x[..., k * cout : (k + 1) * cout] for k in range(4)]
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min

    def up(t):
        return jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)), constant_values=neg)[:, :-1]

    def left(t):
        return jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)), constant_values=neg)[:, :, :-1]

    cands = []
    for fi, row_shift in ((1, True), (0, False), (1, False)):
        for fj, col_shift in ((1, True), (0, False), (1, False)):
            t = p[fi * 2 + fj]
            if row_shift:
                t = up(t)
            if col_shift:
                t = left(t)
            cands.append(t)
    out = cands[0]
    for t in cands[1:]:
        out = jnp.maximum(out, t)
    return out


def space_to_depth2(x):
    """(N, 2H, 2W, C) -> (N, H, W, 4C), parity-blocked (p = 2*di + dj)."""
    n, h2, w2, c = x.shape
    x = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 // 2, w2 // 2, 4 * c)


def depth_to_space2(x):
    """(N, H, W, 4C) -> (N, 2H, 2W, C), inverse of space_to_depth2."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)
