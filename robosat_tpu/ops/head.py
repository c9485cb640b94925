"""Fused prediction head: final 1x1 conv + binary softmax + digitize + crop.

The tail of the predict program (robosat/tools/predict.py:87-113: final conv,
softmax over 2 classes, 256-bin digitize, overlap crop) fuses into a single
XLA loop over the feature map. For a binary model the softmax foreground
probability collapses to a sigmoid of the logit margin,

  p_fg = softmax([l0, l1])[1] = sigmoid(l1 - l0)
       = sigmoid(dot(features, w1 - w0) + (b1 - b0)),

so the 32->2 convolution becomes a 32->1 channel reduction. XLA fuses the
fp32 multiply-reduce, sigmoid, digitize, crop, and the uint8 store into one
bandwidth-optimal pass: measured 0.15 ms/batch (8 x 576px bf16) on a v5e —
against 6.3 ms for the hand-written Pallas kernel this replaces
(`pallas_prediction_head` below, kept as a documented negative result), and
~13 GB of lane-padded fp32 logit buffers for the naive 2-channel conv path.

The margin reduction runs with exact fp32 products on the VPU, which is
*more* faithful to the fp32 torch reference than the Pallas kernel's MXU dot
(default matmul precision truncates the fp32 weights to bf16 on TPU).

Digitize parity: q = searchsorted(anchors, p, side='right') with the 256
np.linspace anchors (robosat/tools/predict.py:102-103, including the p == 1.0
uint8 wraparound). The fp32 cast of those anchors is bitwise-equal to
k / 255.0f for every k (verified), so no anchor table is needed: with
k = round(p * 255) the right-rule index can only be k-1, k, or k+1, and
three exact comparisons pin it:

  q = (k - 1) + [a(k-1) <= p] + [a(k) <= p] + [a(k+1) <= p],  a(k) = k/255.0f

(bounds need no special casing: a(-1) < 0 <= p always, a(256) > 1 >= p never).
Bit-identical to the jnp searchsorted path in robosat_tpu.ops.quantize.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _digitize_exact(p):
    k = jnp.round(p * 255.0).astype(jnp.int32)
    kf = k.astype(jnp.float32)

    def a(off):
        return (kf + off) / jnp.float32(255.0)

    q = (k - 1) + (a(-1.0) <= p).astype(jnp.int32) + (a(0.0) <= p).astype(jnp.int32) + (a(1.0) <= p).astype(jnp.int32)
    return q


def fused_prediction_head(features, w, b, overlap=0):
    """Decoder features (N, H, W, C) -> quantized fg uint8 (N, H-2o, W-2o).

    Args:
      features: final decoder activations (any float dtype).
      w: final conv kernel (1, 1, C, 2) or (C, 2).
      b: final conv bias (2,).
      overlap: border pixels to crop from each side of the output.
    """
    n, height, width, cin = features.shape
    w2 = jnp.asarray(w).reshape(cin, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(b).reshape(2)

    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)

    # Exact fp32 products on the VPU (bf16 features widen losslessly); the
    # channel reduce + sigmoid + digitize + crop fuse into the feature read.
    margin = jnp.sum(features.astype(jnp.float32) * wm, axis=-1) + bm
    quantized = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)

    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized


def fused_prediction_head_s2d(features, w, b, overlap=0):
    """`fused_prediction_head` on space-to-depth decoder features.

    Args:
      features: parity-blocked activations (N, H, W, 4*C) from the s2d
        decoder tail (robosat_tpu.models.layers.s2d_conv3x3_kernel).
      w, b: final 1x1 conv kernel (1, 1, C, 2)/(C, 2) and bias (2,) — on the
        ORIGINAL fine-grid channel count C.
      overlap: border pixels (fine grid) to crop from each side.

    Returns quantized fg uint8 (N, 2H - 2*overlap, 2W - 2*overlap).
    """
    n, h, w_, c4 = features.shape
    cin = c4 // 4
    w2 = jnp.asarray(w).reshape(cin, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(b).reshape(2)

    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)

    # Margin per parity block as ONE dot against a block-diagonal (4C, 4)
    # matrix: reshaping to (N, H, W, 4, C) and reducing instead breaks XLA's
    # fusion (a relu+convert materializes the features in fp32 plus a layout
    # copy — measured 3.3 ms vs 0.9 ms for this dot at 8 x 288px/128ch).
    # HIGHEST precision keeps fp32-accurate products on the MXU.
    wblock = jnp.kron(jnp.eye(4, dtype=jnp.float32), wm.reshape(cin, 1))  # (4C, 4)
    margin = (
        jnp.einsum("nhwc,cp->nhwp", features.astype(jnp.float32), wblock, precision=jax.lax.Precision.HIGHEST)
        + bm
    )
    q = _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)

    # Depth-to-space on the uint8 result (C = 1): (N, H, W, 2, 2) -> fine.
    quantized = q.reshape(n, h, w_, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w_)

    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized


def fused_prediction_head_s2d_blocked(features, w, b, overlap=0):
    """`fused_prediction_head_s2d` that RETURNS the parity-blocked uint8.

    Crops in blocked space before the margin dot (overlap must be even) and
    skips the device-side depth-to-space — u8 interleave transposes cost
    ~0.6 ms/batch on this backend while the host does the same shuffle on
    2 MB of bytes for free in the writer pool (layers.depth_to_space2 works
    on numpy arrays). Returns (N, H - overlap, W - overlap, 4) uint8; margin
    values are bit-identical to the unblocked head.
    """
    n, h, w_, c4 = features.shape
    cin = c4 // 4
    w2 = jnp.asarray(w).reshape(cin, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    assert overlap % 2 == 0, "blocked head crops on the coarse grid"
    b2 = jnp.asarray(b).reshape(2)

    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)

    o = overlap // 2
    if o:
        features = features[:, o:-o, o:-o, :]
    wblock = jnp.kron(jnp.eye(4, dtype=jnp.float32), wm.reshape(cin, 1))  # (4C, 4)
    margin = (
        jnp.einsum("nhwc,cp->nhwp", features.astype(jnp.float32), wblock, precision=jax.lax.Precision.HIGHEST)
        + bm
    )
    return _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)


def fused_prediction_head_s2d_blocked_sep(features, w, b, overlap=0):
    """`fused_prediction_head_s2d_blocked` on doubly-blocked features.

    `features` is the SEPARATED tail output (robosat_tpu.models.qtail.
    fused_tail_features_sep): (N, Hc, Wc, 512) where channel p288*128 + c
    holds the s2d feature channel c at 288-grid parity p288 of coarse pixel
    — i.e. space_to_depth2 of the (N, 2Hc, 2Wc, 128) blocked features. The
    margin dot is block-diagonal over 16 blocks of 32 channels; outputs
    (N, Hc - overlap/2, Wc - overlap/2, 16) uint8 with channel
    p288*4 + p576. The host writer interleaves with two depth_to_space2
    passes. Margin values are bit-identical to the unblocked heads."""
    n, h, w_, c16 = features.shape
    cin = c16 // 16
    w2 = jnp.asarray(w).reshape(cin, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    assert overlap % 4 == 0, "doubly-blocked head crops on the coarse-coarse grid"
    b2 = jnp.asarray(b).reshape(2)

    wm = (w2[:, 1] - w2[:, 0]).astype(jnp.float32)
    bm = (b2[1] - b2[0]).astype(jnp.float32)

    o = overlap // 4
    if o:
        features = features[:, o:-o, o:-o, :]
    wblock = jnp.kron(jnp.eye(16, dtype=jnp.float32), wm.reshape(cin, 1))  # (16C, 16)
    margin = (
        jnp.einsum("nhwc,cp->nhwp", features.astype(jnp.float32), wblock, precision=jax.lax.Precision.HIGHEST)
        + bm
    )
    return _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)


def fused_prediction_head_subpixel(features, w, b, overlap=0, block=4):
    """Fused head for a learned sub-pixel (pixel-shuffle) classifier
    (robosat_tpu.models.fastnet): coarse features (N, h, w, C) carry a 1x1
    conv to block*block per-position class logits; for a binary model each
    position's softmax collapses to sigmoid of a margin, so the whole head
    is ONE dense (C, block^2) margin dot + sigmoid + digitize on the coarse
    grid — the fine grid never exists on device.

    Args:
      features: (N, h, w, C) final decoder activations.
      w: head kernel (1, 1, C, block^2 * 2) or (C, block^2 * 2); channel
         layout position*2 + class (fastnet.subpixel_to_fine convention).
      b: head bias (block^2 * 2,).
      overlap: FINE border pixels to crop per side (must divide by block).

    Returns (N, h - 2*overlap/block, w - 2*overlap/block, block^2) uint8,
    channel = sub-pixel position; the host writer interleaves (for block=4,
    two depth_to_space2 passes — same contract as the "sep" blocked head).
    """
    n, h, w_, cin = features.shape
    p2 = block * block
    w2 = jnp.asarray(w).reshape(cin, p2, 2)
    b2 = jnp.asarray(b).reshape(p2, 2)
    assert overlap % block == 0, "sub-pixel head crops on the coarse grid"

    wm = (w2[:, :, 1] - w2[:, :, 0]).astype(jnp.float32)  # (C, p2)
    bm = (b2[:, 1] - b2[:, 0]).astype(jnp.float32)  # (p2,)

    o = overlap // block
    if o:
        features = features[:, o:-o, o:-o, :]
    margin = (
        jnp.einsum("nhwc,cp->nhwp", features.astype(jnp.float32), wm, precision=jax.lax.Precision.HIGHEST) + bm
    )
    return _digitize_exact(jax.nn.sigmoid(margin)).astype(jnp.uint8)


def interleave_subpixel_u8(blocked, block=4):
    """(N, h, w, block^2) uint8 -> fine (N, block*h, block*w): the device-
    side inverse of the sub-pixel channel layout (two nested 2x2 parity
    levels for block=4 — what the host writer does with numpy for free on
    the blocked fast path). Used by the fine-output predict contract paths
    (bf16 and strip modes)."""
    n, h, w, p2 = blocked.shape
    assert p2 == block * block
    x = blocked.reshape(n, h, w, 2, 2, 2, 2)  # (a, b, u, v)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # (n, i, a, u, j, b, v)
    return x.reshape(n, block * h, block * w)


# ---------------------------------------------------------------------------
# Pallas variant (negative result, kept for the record + as a Mosaic example)
# ---------------------------------------------------------------------------

BLOCK_ROWS = 8


def _head_kernel(feat_ref, w_ref, b_ref, out_ref):
    feats = feat_ref[0].astype(jnp.float32)  # (block_rows, S, 32)
    rows, cols, cin = feats.shape
    w = w_ref[...].astype(jnp.float32)  # (32, 2)
    b = b_ref[...].astype(jnp.float32)  # (1, 2)

    logits = jnp.dot(feats.reshape(rows * cols, cin), w, preferred_element_type=jnp.float32) + b
    p_fg = jax.nn.sigmoid(logits[:, 1] - logits[:, 0])  # (rows*cols,)

    q = _digitize_exact(p_fg)
    out_ref[0] = q.astype(jnp.uint8).reshape(rows, cols)


def pallas_prediction_head(features, w, b, overlap=0):
    """Hand-written Pallas version of `fused_prediction_head`.

    Measured 42x SLOWER than the XLA fusion on a v5e (6.3 vs 0.15 ms/batch at
    8 x 576px): the 32-channel minormost blocks waste 3/4 of each (8, 128)
    vector register and force lane-padded HBM tiles, while XLA's reduce-fusion
    reads the features in their natural layout. Kept as the counterexample the
    docs cite — "don't hand-schedule what the compiler already does" — and to
    pin that both formulations agree (tests/test_head.py).
    """
    n, height, width, cin = features.shape
    w2 = jnp.asarray(w).reshape(cin, -1)
    assert w2.shape[1] == 2, "fused head requires a binary model"
    b2 = jnp.asarray(b).reshape(1, 2)

    # Cap the block's pixel count (~8 rows x 576 cols worth) so wide inputs
    # (strip mode) stay within scoped VMEM: largest divisor of height that
    # keeps rows*width under budget, else fall back to one row per block.
    budget = BLOCK_ROWS * 576
    target = max(1, min(BLOCK_ROWS, budget // width))
    block_rows = 1
    for rows in range(target, 0, -1):
        if height % rows == 0:
            block_rows = rows
            break

    quantized = pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((n, height, width), jnp.uint8),
        grid=(n, height // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, width, cin), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((cin, 2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, width), lambda i, j: (i, j, 0)),
        interpret=_should_interpret(),
    )(features, w2, b2)

    if overlap:
        quantized = quantized[:, overlap:-overlap, overlap:-overlap]
    return quantized


def _should_interpret():
    """Pallas compiles for TPU only; interpret elsewhere (tests run on CPU)."""
    return jax.default_backend() != "tpu"
