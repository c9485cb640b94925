"""Fused Pallas tail (dec4 + dec5 + head): parity vs the shipped int8 chain.

robosat_tpu.models.qtail.fused_tail must reproduce the three-op XLA tail —
relu(int8 dec4) -> relu(int8 dec5) -> fused_prediction_head_s2d_blocked —
on the same quantized nodes. The conv stages are bit-exact (integer
accumulation commutes, identical epilogues); the head's 32-wide f32 channel
reduction has fp reassociation freedom vs XLA's einsum, so the quantized
output may differ only where a probability lands exactly on a 1/255 bin
boundary — asserted to be zero pixels here and at most a handful in general.
Runs in Pallas interpreter mode on CPU (the compiled Mosaic path is
exercised on TPU by bench.py / rs predict).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models import int8 as q8
from robosat_tpu.models import qtail
from robosat_tpu.ops.head import fused_prediction_head_s2d_blocked


def _ref_tail(x, node4, s4, node5, s5, w_final, b_final, overlap):
    y4 = jax.nn.relu(q8._int8_conv(node4, x, s4, compute_dtype=jnp.bfloat16))
    y5 = jax.nn.relu(q8._int8_conv(node5, y4, s5, compute_dtype=jnp.bfloat16))
    return fused_prediction_head_s2d_blocked(y5, w_final, b_final, overlap=overlap)


@pytest.mark.parametrize("overlap,h", [(0, 16), (8, 24)])
def test_fused_tail_matches_shipped_chain(overlap, h):
    rng = np.random.default_rng(0)
    c = 128
    node4 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    node5 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    w_final = jnp.asarray(rng.normal(0, 0.3, (1, 1, 32, 2)).astype(np.float32))
    b_final = jnp.asarray(rng.normal(0, 0.1, (2,)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1.0, (2, h, h, c)), jnp.bfloat16)
    s4, s5 = 0.021, 0.013

    ref = np.asarray(_ref_tail(x, node4, s4, node5, s5, w_final, b_final, overlap))
    got = np.asarray(
        qtail.fused_tail(
            x, node4, s4, node5, s5, w_final, b_final, overlap=overlap, strip_rows=8, interpret=True
        )
    )
    assert got.shape == ref.shape
    mismatches = int((got != ref).sum())
    assert mismatches == 0, "fused tail diverged on {} / {} bytes".format(mismatches, ref.size)


def test_fused_tail_edge_rows_zero_padded():
    """The strip halos must implement zero SAME padding at the image borders:
    compare against the reference on an input whose borders are large (so a
    wrong halo would flip the quantized output there)."""
    rng = np.random.default_rng(1)
    c = 128
    node4 = q8._qkernel(jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32)))
    node5 = q8._qkernel(jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32)))
    w_final = jnp.asarray(rng.normal(0, 0.5, (1, 1, 32, 2)).astype(np.float32))
    b_final = jnp.zeros((2,), jnp.float32)
    x = jnp.asarray(np.full((1, 16, 16, c), 3.0, np.float32), jnp.bfloat16)
    s4, s5 = 0.05, 0.05

    ref = np.asarray(_ref_tail(x, node4, s4, node5, s5, w_final, b_final, 0))
    got = np.asarray(
        qtail.fused_tail(x, node4, s4, node5, s5, w_final, b_final, overlap=0, strip_rows=8, interpret=True)
    )
    assert int((got != ref).sum()) == 0


def test_fused_tail_features_bit_exact():
    """The no-head variant (dec4 + dec5 only — the portion proven to compile
    through the remote Mosaic compiler) is BIT-exact vs the shipped two-conv
    chain: integer accumulation commutes and the dequant epilogues are
    identical, so unlike the full tail there is no fp-reassociation caveat."""
    rng = np.random.default_rng(2)
    c = 128
    node4 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    node5 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    x = jnp.asarray(rng.normal(0, 1.0, (2, 24, 24, c)), jnp.bfloat16)
    s4, s5 = 0.021, 0.013

    y4 = jax.nn.relu(q8._int8_conv(node4, x, s4, compute_dtype=jnp.bfloat16))
    ref = np.asarray(jax.nn.relu(q8._int8_conv(node5, y4, s5, compute_dtype=jnp.bfloat16)), np.float32)
    got = np.asarray(
        qtail.fused_tail_features(x, node4, s4, node5, s5, strip_rows=8, interpret=True), np.float32
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_fused_tail_features_sep_bit_exact():
    """The parity-SEPARATED tail (dec4 + dec5 over space-to-depth2 planes)
    equals space_to_depth2 of the interleaved tail bit for bit — same int32
    accumulations, same epilogues, only the layout moves."""
    from robosat_tpu.models.layers import space_to_depth2

    rng = np.random.default_rng(3)
    c = 128
    node4 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    node5 = q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)))
    x = jnp.asarray(rng.normal(0, 1.0, (2, 24, 24, c)), jnp.bfloat16)
    s4, s5 = 0.021, 0.013

    ref = np.asarray(
        space_to_depth2(qtail.fused_tail_features(x, node4, s4, node5, s5, strip_rows=8, interpret=True)),
        np.float32,
    )
    got = np.asarray(
        qtail.fused_tail_features_sep(
            space_to_depth2(x), node4, s4, node5, s5, strip_rows=4, interpret=True
        ),
        np.float32,
    )
    assert got.shape == ref.shape
    assert int((got != ref).sum()) == 0


def test_fused_tail_features_sep_edges():
    """Border handling of the separated tail: constant large input so a
    wrong (non-zero-padded) halo flips values at the edges."""
    from robosat_tpu.models.layers import space_to_depth2

    rng = np.random.default_rng(5)
    c = 128
    node4 = q8._qkernel(jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32)))
    node5 = q8._qkernel(jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32)))
    x = jnp.asarray(np.full((1, 16, 16, c), 3.0, np.float32), jnp.bfloat16)
    s4, s5 = 0.05, 0.05

    ref = np.asarray(
        space_to_depth2(qtail.fused_tail_features(x, node4, s4, node5, s5, strip_rows=8, interpret=True)),
        np.float32,
    )
    got = np.asarray(
        qtail.fused_tail_features_sep(space_to_depth2(x), node4, s4, node5, s5, strip_rows=4, interpret=True),
        np.float32,
    )
    assert int((got != ref).sum()) == 0


def test_head_sep_matches_blocked_head():
    """fused_prediction_head_s2d_blocked_sep on space_to_depth2(features)
    equals space_to_depth2 of the blocked head output (same margins, same
    digitize; one extra parity level)."""
    from robosat_tpu.models.layers import space_to_depth2
    from robosat_tpu.ops.head import fused_prediction_head_s2d_blocked_sep

    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.normal(0, 2.0, (2, 16, 16, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.3, (1, 1, 32, 2)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (2,)).astype(np.float32))

    for overlap in (0, 4):
        ref = np.asarray(fused_prediction_head_s2d_blocked(feats, w, b, overlap=overlap))
        got = np.asarray(fused_prediction_head_s2d_blocked_sep(space_to_depth2(feats), w, b, overlap=overlap))
        # One depth_to_space2 peels the extra (288-grid) parity level.
        from robosat_tpu.models.layers import depth_to_space2

        assert int((np.asarray(depth_to_space2(got)) != ref).sum()) == 0


def test_sep_predict_step_matches_shipped_step():
    """make_int8_predict_step(pallas_tail='sep') reproduces the shipped int8
    blocked step byte for byte after the host's two depth_to_space2 passes —
    the end-to-end contract `rs predict` ships (Pallas kernels run in
    interpreter mode on CPU)."""
    from robosat_tpu.models import unet
    from robosat_tpu.models.layers import depth_to_space2, space_to_depth4
    from robosat_tpu.parallel.steps import make_int8_predict_step

    params, state = unet.init(0, num_classes=2)
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    raw48 = space_to_depth4(raw)

    step_ref, qtree_ref = make_int8_predict_step(
        unet, params, state, raw48, overlap=0, fused_head=True, host_s2d=True
    )
    step_sep, qtree_sep = make_int8_predict_step(
        unet, params, state, raw48, overlap=0, fused_head=True, host_s2d=True, pallas_tail="sep"
    )
    ref = np.asarray(step_ref(qtree_ref, raw48))  # (1, 32, 32, 4)
    sep = np.asarray(step_sep(qtree_sep, raw48))  # (1, 16, 16, 16)
    assert sep.shape[-1] == 16
    fine = np.asarray(depth_to_space2(depth_to_space2(sep)))[..., 0]
    fine_ref = np.asarray(depth_to_space2(ref))[..., 0]
    assert fine.shape == fine_ref.shape
    assert int((fine != fine_ref).sum()) == 0


def test_to_dec3_walk_matches_full_walk():
    """apply_features_int8_to_dec3 + the XLA dec4/dec5 chain reproduces
    apply_features_int8 bit for bit on a real quantized U-Net — the contract
    make_int8_predict_step(pallas_tail=...) builds on (the Pallas tail then
    replaces that chain, itself pinned bit-exact above)."""
    from robosat_tpu.models import unet

    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0, jnp.bfloat16)
    amaxes = np.asarray(q8.calibration_amaxes(folded, x.astype(jnp.float32)))
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = q8.quantize_unet_folded(folded)

    full = np.asarray(q8.apply_features_int8(qtree, scales, x), np.float32)
    dec3, s4, s5 = q8.apply_features_int8_to_dec3(qtree, scales, x)
    y4 = jax.nn.relu(q8._int8_conv(qtree["dec4"], dec3, s4, compute_dtype=jnp.bfloat16))
    y5 = np.asarray(jax.nn.relu(q8._int8_conv(qtree["dec5"], y4, s5, compute_dtype=jnp.bfloat16)), np.float32)
    assert y5.shape == full.shape
    assert int((y5 != full).sum()) == 0
