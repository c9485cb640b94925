"""From-scratch ResNet-50 encoder (bottleneck blocks) in functional JAX.

Mirrors the torchvision resnet50 the reference uses as its U-Net encoder
(robosat/unet.py:94, reference stem/layers walked in robosat/unet.py:122-130)
but is written NHWC/TPU-first: convs lower onto the MXU, BN+ReLU fuse under
XLA. Only the feature-extractor part exists — no classification head, since
the U-Net consumes the four stage outputs as skip connections.

ImageNet-pretrained weights are not bundled (no network egress); weights
convert from a torch state_dict via robosat_tpu.checkpoint.convert_torch_resnet50
when available.
"""

import jax
import jax.numpy as jnp

from robosat_tpu.models.layers import (
    bn_apply,
    bn_init,
    conv_apply,
    conv_bias_apply,
    conv_init,
    fold_conv_bn,
    init_rng,
    max_pool,
)

# (blocks, mid_channels) per stage; expansion 4 => stage outputs 256/512/1024/2048.
RESNET50_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))
EXPANSION = 4


def _bottleneck_init(rng, cin, mid, stride):
    cout = mid * EXPANSION
    params = {}
    state = {}
    params["conv1"] = conv_init(rng, 1, 1, cin, mid)
    params["bn1"], state["bn1"] = bn_init(mid)
    params["conv2"] = conv_init(rng, 3, 3, mid, mid)
    params["bn2"], state["bn2"] = bn_init(mid)
    params["conv3"] = conv_init(rng, 1, 1, mid, cout)
    params["bn3"], state["bn3"] = bn_init(cout)
    if stride != 1 or cin != cout:
        params["down_conv"] = conv_init(rng, 1, 1, cin, cout)
        params["down_bn"], state["down_bn"] = bn_init(cout)
    return params, state


def _bottleneck_apply(params, state, x, stride, train, dilation=1):
    new_state = {}
    out = conv_apply(params["conv1"], x, stride=1)
    out, new_state["bn1"] = bn_apply(params["bn1"], state["bn1"], out, train)
    out = jax.nn.relu(out)
    # Explicit torch-style symmetric padding: XLA's SAME pads (0, 1) for the
    # stride-2 case where torch pads (1, 1) — one-pixel shift vs torchvision.
    out = conv_apply(params["conv2"], out, stride=stride, dilation=dilation, padding=((dilation, dilation),) * 2)
    out, new_state["bn2"] = bn_apply(params["bn2"], state["bn2"], out, train)
    out = jax.nn.relu(out)
    out = conv_apply(params["conv3"], out, stride=1)
    out, new_state["bn3"] = bn_apply(params["bn3"], state["bn3"], out, train)

    if "down_conv" in params:
        shortcut = conv_apply(params["down_conv"], x, stride=stride)
        shortcut, new_state["down_bn"] = bn_apply(params["down_bn"], state["down_bn"], shortcut, train)
    else:
        shortcut = x

    return jax.nn.relu(out + shortcut), new_state


def init(rng, in_channels=3):
    """Initialize ResNet-50 encoder params and BN state.

    `rng` is an int seed, jax PRNGKey, or numpy Generator (host-side init).
    """
    rng = init_rng(rng)
    params, state = {}, {}

    params["conv1"] = conv_init(rng, 7, 7, in_channels, 64)
    params["bn1"], state["bn1"] = bn_init(64)

    cin = 64
    for si, (blocks, mid) in enumerate(RESNET50_STAGES):
        stage_p, stage_s = [], []
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            bp, bs = _bottleneck_init(rng, cin, mid, stride)
            stage_p.append(bp)
            stage_s.append(bs)
            cin = mid * EXPANSION
        params["layer{}".format(si + 1)] = stage_p
        state["layer{}".format(si + 1)] = stage_s

    return params, state


def fold(params, state):
    """Fold every BN into its conv for inference; returns folded params."""
    folded = {"conv1": fold_conv_bn(params["conv1"], params["bn1"], state["bn1"])}
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        stage = []
        for bi in range(blocks):
            bp, bs = params[name][bi], state[name][bi]
            fb = {
                "conv1": fold_conv_bn(bp["conv1"], bp["bn1"], bs["bn1"]),
                "conv2": fold_conv_bn(bp["conv2"], bp["bn2"], bs["bn2"]),
                "conv3": fold_conv_bn(bp["conv3"], bp["bn3"], bs["bn3"]),
            }
            if "down_conv" in bp:
                fb["down_conv"] = fold_conv_bn(bp["down_conv"], bp["down_bn"], bs["down_bn"])
            stage.append(fb)
        folded[name] = stage
    return folded


def _bottleneck_apply_folded(params, x, stride, dilation=1):
    out = jax.nn.relu(conv_bias_apply(params["conv1"], x, stride=1))
    out = jax.nn.relu(
        conv_bias_apply(params["conv2"], out, stride=stride, dilation=dilation, padding=((dilation, dilation),) * 2)
    )
    out = conv_bias_apply(params["conv3"], out, stride=1)
    shortcut = conv_bias_apply(params["down_conv"], x, stride=stride) if "down_conv" in params else x
    return jax.nn.relu(out + shortcut)


def apply_folded_stages(folded, out, dilate_last_stage=False):
    """The four bottleneck stages on a pooled stem output; returns (enc1..enc4)."""
    skips = []
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        last_dilated = dilate_last_stage and si == len(RESNET50_STAGES) - 1
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0 and not last_dilated) else 1
            dilation = 2 if last_dilated else 1
            out = _bottleneck_apply_folded(folded[name][bi], out, stride, dilation)
        skips.append(out)
    return tuple(skips)


def apply_folded(folded, x, dilate_last_stage=False):
    """Inference forward over BN-folded params; returns (enc1..enc4)."""
    out = jax.nn.relu(conv_bias_apply(folded["conv1"], x, stride=2, padding=((3, 3), (3, 3))))
    out = max_pool(out, window=3, stride=2, padding=1)
    return apply_folded_stages(folded, out, dilate_last_stage)


def stem_folded_s2d4(folded_conv1, x48):
    """The folded stem (conv7x7/s2 + bias + relu + maxpool3/s2) on 4x4
    space-to-depth input: x48 (N, H/4, W/4, 16*Cin) normalized — one MXU-wide
    3x3 conv emitting the four stride-2 output parities, pooled in parity
    space. Returns (N, H/4, W/4, 64), identical to the fine stem up to fp
    summation order (the 3-channel fine conv is im2col-bound; see
    robosat_tpu.models.layers stem notes)."""
    from robosat_tpu.models.layers import CONV_DIMS, pool3s2_from_parity, stem_s2d4_kernel
    from jax import lax

    w = folded_conv1["w"]
    cout = w.shape[-1]
    k = stem_s2d4_kernel(w)
    out = lax.conv_general_dilated(x48, k.astype(x48.dtype), (1, 1), "SAME", dimension_numbers=CONV_DIMS)
    b4 = jnp.tile(folded_conv1["b"], 4).astype(out.dtype)
    return pool3s2_from_parity(jax.nn.relu(out + b4), cout)


def apply_folded_s2d4(folded, x48, dilate_last_stage=False):
    """`apply_folded` on 4x4 space-to-depth (host-blocked) normalized input."""
    out = stem_folded_s2d4(folded["conv1"], x48)
    return apply_folded_stages(folded, out, dilate_last_stage)


def apply(params, state, x, train=False, dilate_last_stage=False):
    """Run the encoder; returns ((enc1, enc2, enc3, enc4), new_state).

    enc1..enc4 are the four stage outputs (256/512/1024/2048 channels at
    1/4..1/32 resolution) consumed as U-Net skips (robosat/unet.py:127-130).
    With `dilate_last_stage`, layer4 keeps stride 1 and dilates its 3x3 convs
    by 2 (output stride 16 — the DeepLab trick; note the stride-2 downsample
    shortcut becomes stride 1, so converted torchvision weights still load).
    """
    new_state = {}
    out = conv_apply(params["conv1"], x, stride=2, padding=((3, 3), (3, 3)))
    out, new_state["bn1"] = bn_apply(params["bn1"], state["bn1"], out, train)
    out = jax.nn.relu(out)
    out = max_pool(out, window=3, stride=2, padding=1)

    skips = []
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        last_dilated = dilate_last_stage and si == len(RESNET50_STAGES) - 1
        stage_state = []
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0 and not last_dilated) else 1
            dilation = 2 if last_dilated else 1
            out, bs = _bottleneck_apply(params[name][bi], state[name][bi], out, stride, train, dilation)
            stage_state.append(bs)
        new_state[name] = stage_state
        skips.append(out)

    return tuple(skips), new_state
