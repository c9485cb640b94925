"""U-Net with a ResNet-50 encoder ("AlbuNet"), functional JAX, NHWC.

Channel math matches the reference exactly (robosat/unet.py:99-141):
center DecoderBlock(2048->256) on an extra 2x2-maxpooled enc4, then
dec0(2048+256->256), dec1(1024+256->256), dec2(512+256->64),
dec3(256+64->128), dec4(128->32), dec5=ConvRelu(32->32), final 1x1 conv to
`num_classes`. Decoder blocks are nearest-2x upsample + 3x3 conv (no bias) +
ReLU, with no batch norm (robosat/unet.py:18-73).

TPU-first choices: NHWC layout, channel-axis concat lands in the 128-lane
dimension, optional bfloat16 activations (params stay fp32), everything traced
once under jit — the upsample+conv+concat chain fuses under XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np

from robosat_tpu.models import resnet
from robosat_tpu.models.layers import (
    conv_apply,
    conv_init,
    fused_upsample_conv3x3,
    init_rng,
    max_pool,
    upsample_nearest_2x,
)

NUM_FILTERS = 32

# The fused decoder rewrite (4/9 FLOPs, no upsampled intermediate) is the
# default; flip for a bit-exact-to-naive reference path when debugging.
FUSED_DECODER = True


def _convrelu_init(rng, cin, cout):
    return conv_init(rng, 3, 3, cin, cout)


def _convrelu_apply(params, x):
    return jax.nn.relu(conv_apply(params, x, stride=1))


def _decoder_apply(params, x):
    if FUSED_DECODER:
        return jax.nn.relu(fused_upsample_conv3x3(params, x))
    return _convrelu_apply(params, upsample_nearest_2x(x))


def init(rng, num_classes, num_filters=NUM_FILTERS, in_channels=3):
    """Initialize U-Net params and state. Returns (params, state).

    `rng` is an int seed, jax PRNGKey, or numpy Generator (host-side init).
    """
    rng = init_rng(rng)
    enc_params, enc_state = resnet.init(rng, in_channels=in_channels)

    nf = num_filters
    params = {
        "encoder": enc_params,
        "center": _convrelu_init(rng, 2048, nf * 8),
        "dec0": _convrelu_init(rng, 2048 + nf * 8, nf * 8),
        "dec1": _convrelu_init(rng, 1024 + nf * 8, nf * 8),
        "dec2": _convrelu_init(rng, 512 + nf * 8, nf * 2),
        "dec3": _convrelu_init(rng, 256 + nf * 2, nf * 2 * 2),
        "dec4": _convrelu_init(rng, nf * 2 * 2, nf),
        "dec5": _convrelu_init(rng, nf, nf),
        "final": {
            "w": conv_init(rng, 1, 1, nf, num_classes)["w"],
            "b": np.zeros((num_classes,), np.float32),
        },
    }
    state = {"encoder": enc_state}
    return params, state


def apply_features(params, state, x, train=False):
    """Backbone + decoder up to dec5; returns (features, new_state).

    Split out so the prediction path can fuse the final 1x1 conv + softmax +
    quantize into one sigmoid-of-margin pass (robosat_tpu.ops.head).
    """
    n, h, w, c = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32 for resnet"

    (enc1, enc2, enc3, enc4), enc_state = resnet.apply(params["encoder"], state["encoder"], x, train)

    center = _decoder_apply(params["center"], max_pool(enc4, window=2, stride=2, padding=0))

    dec0 = _decoder_apply(params["dec0"], jnp.concatenate([enc4, center], axis=-1))
    dec1 = _decoder_apply(params["dec1"], jnp.concatenate([enc3, dec0], axis=-1))
    dec2 = _decoder_apply(params["dec2"], jnp.concatenate([enc2, dec1], axis=-1))
    dec3 = _decoder_apply(params["dec3"], jnp.concatenate([enc1, dec2], axis=-1))
    dec4 = _decoder_apply(params["dec4"], dec3)
    dec5 = _convrelu_apply(params["dec5"], dec4)
    return dec5, {"encoder": enc_state}


def apply(params, state, x, train=False):
    """Forward pass. x: NHWC float (normalized). Returns (logits, new_state).

    Requires H and W divisible by 32 (robosat/unet.py:120).
    """
    dec5, new_state = apply_features(params, state, x, train)
    logits = conv_apply({"w": params["final"]["w"]}, dec5, stride=1) + params["final"]["b"].astype(dec5.dtype)
    return logits, new_state


def apply_s2d(params, state, x, train=False):
    """Training/eval forward with the space-to-depth decoder TAIL; returns
    (fine logits, new_state) — the same math as `apply` up to fp summation
    order.

    Why: in train mode the plain walk runs dec4/dec5/head on full-resolution
    32-channel buffers that XLA:TPU lane-pads 4x; at batch 16 x 512px those
    fine-tail passes (forward + backward) were the largest non-loss block of
    the step profile (docs/PERF.md round 4). The s2d forms run the same ops
    at half resolution with 4*32 = 128-lane channels — the rewrite predict
    shipped in round 2 — and gradients flow through the rearranged kernels
    exactly. The decoder is BN-free (robosat/unet.py:18-44) so the s2d
    decoder works on raw params; only the encoder carries train-mode BN.

    The head's 1x1 conv applies per-parity in blocked space; only the final
    (N, H, W, num_classes) logits ever exist at fine resolution (one
    depth_to_space2 transpose feeding the loss).
    """
    from robosat_tpu.models.layers import depth_to_space2

    n, h, w, c = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32 for resnet"

    skips, enc_state = resnet.apply(params["encoder"], state["encoder"], x, train)
    feats = decode_s2d(params, skips)  # (N, H/2, W/2, 4*32) parity-major

    nb, hb, wb, cb = feats.shape
    wf = params["final"]["w"].reshape(NUM_FILTERS, -1)  # (32, C)
    blocked = jnp.einsum("nhwpf,fc->nhwpc", feats.reshape(nb, hb, wb, 4, NUM_FILTERS), wf.astype(feats.dtype))
    logits = depth_to_space2(blocked.reshape(nb, hb, wb, -1))
    return logits + params["final"]["b"].astype(logits.dtype), {"encoder": enc_state}


def fold(params, state):
    """Inference-folded params: encoder BNs folded into convs; the decoder has
    no BN (robosat/unet.py:18-44), so its params pass through unchanged."""
    folded = dict(params)
    folded["encoder"] = resnet.fold(params["encoder"], state["encoder"])
    return folded


def apply_features_folded(folded, x):
    """BN-free inference forward up to dec5 (pairs with the fused Pallas head)."""
    n, h, w, c = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32 for resnet"

    enc1, enc2, enc3, enc4 = resnet.apply_folded(folded["encoder"], x)

    center = _decoder_apply(folded["center"], max_pool(enc4, window=2, stride=2, padding=0))

    dec0 = _decoder_apply(folded["dec0"], jnp.concatenate([enc4, center], axis=-1))
    dec1 = _decoder_apply(folded["dec1"], jnp.concatenate([enc3, dec0], axis=-1))
    dec2 = _decoder_apply(folded["dec2"], jnp.concatenate([enc2, dec1], axis=-1))
    dec3 = _decoder_apply(folded["dec3"], jnp.concatenate([enc1, dec2], axis=-1))
    dec4 = _decoder_apply(folded["dec4"], dec3)
    return _convrelu_apply(folded["dec5"], dec4)


def apply_folded(folded, x):
    """BN-free inference forward; returns logits."""
    dec5 = apply_features_folded(folded, x)
    return conv_apply({"w": folded["final"]["w"]}, dec5, stride=1) + folded["final"]["b"].astype(dec5.dtype)


def decode_s2d(folded, skips):
    """Decoder over encoder skips with the space-to-depth tail.

    dec4/dec5 run at half resolution with parity-blocked 4*32 = 128 channels
    (exactly one TPU lane register wide) instead of full resolution with 32
    channels that XLA lane-pads 4x — algebraically the same ops up to fp
    summation order (robosat_tpu.models.layers, s2d_* kernels). Returns
    (N, H/2, W/2, 128) parity-blocked features for
    robosat_tpu.ops.head.fused_prediction_head_s2d.
    """
    import jax.numpy as jnp
    from jax import lax

    from robosat_tpu.models.layers import CONV_DIMS, s2d_conv3x3_kernel, s2d_up_conv3x3_kernel

    enc1, enc2, enc3, enc4 = skips
    center = _decoder_apply(folded["center"], max_pool(enc4, window=2, stride=2, padding=0))
    dec0 = _decoder_apply(folded["dec0"], jnp.concatenate([enc4, center], axis=-1))
    dec1 = _decoder_apply(folded["dec1"], jnp.concatenate([enc3, dec0], axis=-1))
    dec2 = _decoder_apply(folded["dec2"], jnp.concatenate([enc2, dec1], axis=-1))
    dec3 = _decoder_apply(folded["dec3"], jnp.concatenate([enc1, dec2], axis=-1))

    def conv_same(k, xx):
        return lax.conv_general_dilated(xx, k.astype(xx.dtype), (1, 1), "SAME", dimension_numbers=CONV_DIMS)

    dec4 = jax.nn.relu(conv_same(s2d_up_conv3x3_kernel(folded["dec4"]["w"]), dec3))
    return jax.nn.relu(conv_same(s2d_conv3x3_kernel(folded["dec5"]["w"]), dec4))


def apply_features_folded_s2d(folded, x):
    """BN-free inference forward with the space-to-depth decoder tail."""
    n, h, w, c = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32 for resnet"
    return decode_s2d(folded, resnet.apply_folded(folded["encoder"], x))


def apply_features_folded_s2d_from48(folded, x48):
    """Space-to-depth end to end: 4x4 host-blocked normalized input
    (N, H/4, W/4, 48) -> blocked stem -> stages -> s2d decoder features."""
    return decode_s2d(folded, resnet.apply_folded_s2d4(folded["encoder"], x48))


def apply_logits_fake_quant(params, state, scales, x):
    """QAT training forward: in-graph BN fold (frozen at running stats), the
    hybrid-int8 walk in fake-quant STE mode with the static per-site `scales`
    (models/int8._walk fake_quant — float stem, every quantized site
    quantize-dequantizes its input and its REWRITTEN kernel exactly as the
    int8 predict datapath will), then the float 1x1 head applied per-parity
    on the blocked features (same math as apply_s2d's tail). Returns fine
    logits. Gradients flow to the ORDINARY params through the fold, so a
    finetuned checkpoint stays a normal checkpoint and the shipped int8
    predict path needs zero changes (parallel/steps.make_qat_train_step)."""
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models.layers import depth_to_space2

    n, h, w, c = x.shape
    assert h % 32 == 0 and w % 32 == 0, "image resolution has to be divisible by 32 for resnet"
    folded = fold(params, state)
    sites = q8._Sites(scales=list(scales))
    feats = q8._walk(folded, x, sites, x.dtype, float_mode=True, fake_quant=True)

    nb, hb, wb, cb = feats.shape
    wf = folded["final"]["w"].reshape(NUM_FILTERS, -1)
    blocked = jnp.einsum("nhwpf,fc->nhwpc", feats.reshape(nb, hb, wb, 4, NUM_FILTERS), wf.astype(feats.dtype))
    logits = depth_to_space2(blocked.reshape(nb, hb, wb, -1))
    return logits + folded["final"]["b"].astype(logits.dtype)
