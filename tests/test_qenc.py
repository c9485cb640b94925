"""Pallas bottleneck-block kernel (encoder layer1): parity vs the XLA chain.

robosat_tpu.models.qenc.bottleneck_block must reproduce walk_encoder's
stride-1 block — relu(int8 conv1) -> relu(int8 conv2 3x3) -> int8 conv3,
plus identity/projection residual and the outer relu — bit for bit on the
same quantized nodes (integer accumulation commutes; identical epilogues).
Runs in Pallas interpreter mode on CPU; the compiled Mosaic path is A/B'd on
TPU by benchmarks/bench_qenc.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models import int8 as q8
from robosat_tpu.models import qenc


def _make_node(rng, kh, kw, cin, cout, bias=True):
    node = q8._qconv(
        {"w": jnp.asarray(rng.normal(0, 0.1, (kh, kw, cin, cout)).astype(np.float32)),
         **({"b": jnp.asarray(rng.normal(0, 0.05, (cout,)).astype(np.float32))} if bias else {})}
    )
    return node


def _ref_block(qb, x, s1, s2, s3, sd):
    inner = jax.nn.relu(q8._int8_conv(qb["conv1"], x, s1, compute_dtype=jnp.bfloat16))
    inner = jax.nn.relu(
        q8._int8_conv(qb["conv2"], inner, s2, padding=((1, 1), (1, 1)), compute_dtype=jnp.bfloat16)
    )
    inner = q8._int8_conv(qb["conv3"], inner, s3, compute_dtype=jnp.bfloat16)
    if "down_conv" in qb:
        shortcut = q8._int8_conv(qb["down_conv"], x, sd, compute_dtype=jnp.bfloat16)
    else:
        shortcut = x
    return jax.nn.relu(inner + shortcut)


@pytest.mark.parametrize("down", [True, False])
def test_bottleneck_block_bit_exact(down):
    rng = np.random.default_rng(6)
    cin, cmid, cout, h = (64, 16, 64, 16) if down else (64, 16, 64, 16)
    qb = {
        "conv1": _make_node(rng, 1, 1, cin, cmid),
        "conv2": _make_node(rng, 3, 3, cmid, cmid),
        "conv3": _make_node(rng, 1, 1, cmid, cout),
    }
    if down:
        qb["down_conv"] = _make_node(rng, 1, 1, cin, cout)
    x = jnp.asarray(rng.normal(0, 1.0, (2, h, h, cin)), jnp.bfloat16)
    s1, s2, s3, sd = 0.02, 0.015, 0.01, 0.02

    ref = np.asarray(_ref_block(qb, x, s1, s2, s3, sd), np.float32)
    got = np.asarray(
        qenc.bottleneck_block(
            x, qb, s1, s2, s3, sd=sd if down else None, strip_rows=4, interpret=True
        ),
        np.float32,
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_apply_stage_matches_walk_encoder():
    """A two-block stage through apply_stage_blocks equals walk_encoder's
    stride-1 walk with _int8_conv on the same scales."""
    rng = np.random.default_rng(7)
    cin, cmid, cout, h = 32, 8, 32, 8
    stage = []
    for bi in range(2):
        qb = {
            "conv1": _make_node(rng, 1, 1, cin if bi else cin, cmid),
            "conv2": _make_node(rng, 3, 3, cmid, cmid),
            "conv3": _make_node(rng, 1, 1, cmid, cout),
        }
        if bi == 0:
            qb["down_conv"] = _make_node(rng, 1, 1, cin, cout)
        stage.append(qb)
    x = jnp.asarray(rng.normal(0, 1.0, (1, h, h, cin)), jnp.bfloat16)
    scales = [0.02, 0.015, 0.01, 0.02, 0.018, 0.012, 0.011]

    it = iter(scales)
    out = x
    for qb in stage:
        s1, s2, s3 = next(it), next(it), next(it)
        sd = next(it) if "down_conv" in qb else None
        out = _ref_block(qb, out, s1, s2, s3, sd)
    ref = np.asarray(out, np.float32)

    got = np.asarray(qenc.apply_stage_blocks(x, stage, scales, interpret=True), np.float32)
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_bottleneck_block_s2_bit_exact():
    """The stride-2 kernel reproduces walk_encoder's stride-2 case (torch
    pads (1,1), stride-2 projection) bit for bit."""
    rng = np.random.default_rng(9)
    cin, cmid, cout, h = 32, 8, 64, 16
    qb = {
        "conv1": _make_node(rng, 1, 1, cin, cmid),
        "conv2": _make_node(rng, 3, 3, cmid, cmid),
        "conv3": _make_node(rng, 1, 1, cmid, cout),
        "down_conv": _make_node(rng, 1, 1, cin, cout),
    }
    x = jnp.asarray(rng.normal(0, 1.0, (2, h, h, cin)), jnp.bfloat16)
    s1, s2, s3, sd = 0.02, 0.015, 0.01, 0.02

    inner = jax.nn.relu(q8._int8_conv(qb["conv1"], x, s1, compute_dtype=jnp.bfloat16))
    inner = jax.nn.relu(
        q8._int8_conv(qb["conv2"], inner, s2, stride=2, padding=((1, 1), (1, 1)), compute_dtype=jnp.bfloat16)
    )
    inner = q8._int8_conv(qb["conv3"], inner, s3, compute_dtype=jnp.bfloat16)
    shortcut = q8._int8_conv(qb["down_conv"], x, sd, stride=2, compute_dtype=jnp.bfloat16)
    ref = np.asarray(jax.nn.relu(inner + shortcut), np.float32)

    got = np.asarray(
        qenc.bottleneck_block_s2(x, qb, s1, s2, s3, sd, strip_rows=4, interpret=True), np.float32
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_walk_pallas_all_stages_matches_plain_walk():
    """apply_features_int8(pallas_layer1='all') — every encoder stage through
    the Pallas kernels incl. the stride-2 first blocks — reproduces the plain
    int8 walk bit for bit."""
    from robosat_tpu.models import unet

    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0, jnp.bfloat16)
    amaxes = np.asarray(q8.calibration_amaxes(folded, x.astype(jnp.float32)))
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = q8.quantize_unet_folded(folded)

    ref = np.asarray(q8.apply_features_int8(qtree, scales, x), np.float32)
    got = np.asarray(
        q8.apply_features_int8(qtree, scales, x, pallas_layer1="all", pallas_interpret=True), np.float32
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_walk_pallas_layer1_matches_plain_walk():
    """apply_features_int8(pallas_layer1=True) reproduces the plain int8 walk
    bit for bit on a real quantized U-Net — the contract
    make_int8_predict_step(pallas_enc=True) builds on."""
    from robosat_tpu.models import unet

    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0, jnp.bfloat16)
    amaxes = np.asarray(q8.calibration_amaxes(folded, x.astype(jnp.float32)))
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = q8.quantize_unet_folded(folded)

    ref = np.asarray(q8.apply_features_int8(qtree, scales, x), np.float32)
    got = np.asarray(
        q8.apply_features_int8(qtree, scales, x, pallas_layer1=True, pallas_interpret=True), np.float32
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0
