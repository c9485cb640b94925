"""Int8 inference datapath for the BN-folded U-Net.

The chip sustains ~302 int8 TOPS vs ~130 bf16 TFLOPs (docs/PERF.md), and
int8 activations halve HBM bytes on a bandwidth-bound predict graph, so the
whole folded forward (robosat_tpu/models/unet.apply_features_folded +
resnet.apply_folded — reference architecture robosat/unet.py:76-141) runs
quantized:

- weights: symmetric per-output-channel int8, quantized once at load;
- activations: symmetric per-tensor int8 with STATIC scales captured by a
  one-batch calibration pass (a dynamic amax would re-read every activation
  and give back the bandwidth win);
- convolutions: int8 x int8 -> int32 on the MXU
  (lax.conv_general_dilated(preferred_element_type=int32));
- dequant + bias + ReLU + requant are elementwise epilogues XLA fuses into
  the convolutions; residual adds and pooling stay in `compute_dtype`.

`calibration_amaxes` and `apply_features_int8` walk the network in the SAME
order, so the amax vector indexes conv sites positionally. The final 1x1
head stays in float (it feeds the fused Pallas softmax/digitize head).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from robosat_tpu.models.layers import CONV_DIMS, max_pool
from robosat_tpu.models.resnet import RESNET50_STAGES


def _fused_k4(w3):
    """The 4x4 parity-combined kernel of nearest-2x upsample + 3x3 conv
    (same rewrite as layers.fused_upsample_conv3x3)."""
    sets = ((0,), (0, 1), (1, 2), (2,))
    return jnp.stack(
        [jnp.stack([sum(w3[r, c] for r in rows for c in cols) for cols in sets], axis=0) for rows in sets],
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


def _qdecoder(node):
    """Decoder 3x3 conv quantized in its fused-upsample 4x4 form."""
    wq, ws = _quantize_weight(_fused_k4(jnp.asarray(node["w"], jnp.float32)))
    return {"wq": wq, "ws": ws}


def quantize_unet_folded(folded):
    """BN-folded U-Net params -> int8 tree (same nesting, quantized leaves)."""
    enc = folded["encoder"]
    qenc = {"conv1": _qconv(enc["conv1"])}
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
    for name in ("center", "dec0", "dec1", "dec2", "dec3", "dec4"):
        q[name] = _qdecoder(folded[name])
    q["dec5"] = _qconv(folded["dec5"])  # plain 3x3, no upsample
    q["final"] = {
        "w": jnp.asarray(folded["final"]["w"], jnp.float32),
        "b": jnp.asarray(folded["final"]["b"], jnp.float32),
    }
    return q


def _quantize_act(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


def _int8_conv(node, x, scale, stride=1, padding="SAME", lhs_dilation=None, compute_dtype=jnp.bfloat16):
    """Quantize x with the static `scale`, int8 conv, dequant (+bias)."""
    xq = _quantize_act(x, scale)
    acc = lax.conv_general_dilated(
        xq,
        node["wq"],
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation or (1, 1),
        dimension_numbers=CONV_DIMS,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (node["ws"] * scale)
    if "b" in node:
        y = y + node["b"]
    return y.astype(compute_dtype)


class _Sites:
    """Positional conv-site cursor shared by calibration and inference."""

    def __init__(self, scales=None):
        self.scales = scales
        self.taps = []
        self.idx = 0

    def next_scale(self, x):
        if self.scales is None:
            self.taps.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            return 1.0  # calibration runs in float; scale unused
        s = float(self.scales[self.idx])
        self.idx += 1
        return s


def _walk(q, x, sites, compute_dtype, float_conv=None):
    """The folded U-Net forward, visiting conv sites in a fixed order.

    With `float_conv` set (calibration) convolutions run in float via the
    given fn; otherwise each site consumes the next static scale and runs
    int8. Mirrors unet.apply_features_folded + resnet.apply_folded.
    """

    def conv(node, xx, **kw):
        scale = sites.next_scale(xx)
        if float_conv is not None:
            return float_conv(node, xx, **kw)
        return _int8_conv(node, xx, scale, compute_dtype=compute_dtype, **kw)

    relu = jax.nn.relu

    enc = q["encoder"]
    out = relu(conv(enc["conv1"], x, stride=2, padding=((3, 3), (3, 3))))
    out = max_pool(out, window=3, stride=2, padding=1)

    skips = []
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        name = "layer{}".format(si + 1)
        for bi in range(blocks):
            qb = enc[name][bi]
            stride = 2 if (bi == 0 and si > 0) else 1
            inner = relu(conv(qb["conv1"], out, stride=1))
            inner = relu(conv(qb["conv2"], inner, stride=stride))
            inner = conv(qb["conv3"], inner, stride=1)
            shortcut = conv(qb["down_conv"], out, stride=stride) if "down_conv" in qb else out
            out = relu(inner + shortcut)
        skips.append(out)
    enc1, enc2, enc3, enc4 = skips

    def decoder(name, xx):
        # Fused upsample+conv: the quantized kernel is already the 4x4 form.
        return relu(conv(q[name], xx, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2)))

    center = decoder("center", max_pool(enc4, window=2, stride=2, padding=0))
    dec0 = decoder("dec0", jnp.concatenate([enc4, center], axis=-1))
    dec1 = decoder("dec1", jnp.concatenate([enc3, dec0], axis=-1))
    dec2 = decoder("dec2", jnp.concatenate([enc2, dec1], axis=-1))
    dec3 = decoder("dec3", jnp.concatenate([enc1, dec2], axis=-1))
    dec4 = decoder("dec4", dec3)
    return relu(conv(q["dec5"], dec4, stride=1))


def calibration_amaxes(folded, x, compute_dtype=jnp.float32):
    """Per-conv-site input amaxes from one float forward over batch `x`.

    Returns a float32 vector indexed by conv-site order (the order
    apply_features_int8 consumes). Jit this with real imagery.
    """
    from robosat_tpu.models.layers import conv_bias_apply, fused_upsample_conv3x3

    def float_conv(node, xx, lhs_dilation=None, **kw):
        if lhs_dilation is not None:  # fused decoder site: node holds the 3x3
            return fused_upsample_conv3x3(node, xx)
        if "b" in node:
            return conv_bias_apply(node, xx, **kw)
        return lax.conv_general_dilated(
            xx, node["w"].astype(xx.dtype), window_strides=(kw.get("stride", 1),) * 2,
            padding=kw.get("padding", "SAME"), dimension_numbers=CONV_DIMS,
        )

    sites = _Sites(scales=None)
    _walk(folded, x.astype(compute_dtype), sites, compute_dtype, float_conv=float_conv)
    return jnp.stack(sites.taps).astype(jnp.float32)


def apply_features_int8(qtree, scales, x, compute_dtype=jnp.bfloat16):
    """Int8 forward up to dec5 features. `scales` is a host float sequence
    (amax/127 per conv site, calibration order); returns compute_dtype NHWC."""
    sites = _Sites(scales=list(scales))
    features = _walk(qtree, x, sites, compute_dtype)
    assert sites.idx == len(list(scales)), "conv-site count mismatch with calibration"
    return features


def scales_from_amaxes(amaxes, margin=1.0):
    """amax vector -> per-site static quantization scales."""
    amaxes = np.asarray(amaxes, np.float64)
    return np.maximum(amaxes * margin, 1e-12) / 127.0
