"""SegFormer hybrid-int8 datapath (VERDICT r3 item 4).

Pins: calibration/inference site-count agreement (54 sites for B0), near-
total quantized-mask agreement with the float fused head, the s2d4 blocked
patch-embed rewrite (bit-level vs the fine stage-0 conv at fp32), and the
tool-level make_int8_predict_step protocol dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models import segformer
from robosat_tpu.models import int8 as q8
from robosat_tpu.ops.augment import normalize


@pytest.fixture(scope="module")
def sf():
    params, state = segformer.init(0, num_classes=2)
    folded = segformer.fold(params, state)
    return params, state, folded


def test_patch0_s2d4_kernel_matches_fine(sf):
    """The stride-4 7x7 patch embed on 4x4-blocked input equals the fine
    conv exactly at fp32 (pure index rewrite: every tap is the same fp
    multiply-add, only gathered into one MXU-wide conv)."""
    from robosat_tpu.models.layers import space_to_depth4

    params, _, _ = sf
    patch = params["stages"][0]["patch"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    fine = np.asarray(
        jax.jit(lambda p, v: segformer._patch0_apply(p, v, blocked=False))(patch, x)
    )
    blocked = np.asarray(
        jax.jit(lambda p, v: segformer._patch0_apply(p, v, blocked=True))(patch, space_to_depth4(x))
    )
    assert blocked.shape == fine.shape == (2, 16, 16, 32)
    np.testing.assert_allclose(blocked, fine, rtol=1e-5, atol=1e-5)


def test_segformer_int8_matches_folded(sf):
    """int8 walk agrees with the float fused head: same site count between
    calibration and inference, near-total quantized mask agreement."""
    params, state, folded = sf
    raw = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x = normalize(raw).astype(jnp.float32)

    amaxes = np.asarray(jax.jit(lambda f, r: segformer.calibration_amaxes_int8(f, r))(folded, x))
    # 3 patch convs (stages 1-3) + blocks (2*(6+6+6+5)) + 4 proj + fuse = 54.
    assert amaxes.shape == (54,)
    assert np.all(amaxes > 0)

    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(segformer.quantize_folded_int8)(folded)

    fp_q = np.asarray(jax.jit(lambda f, r: segformer.predict_quantized_folded(f, r))(folded, x))
    q_q = np.asarray(
        jax.jit(
            lambda qt, r: segformer.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32)
        )(qtree, x)
    )
    assert q_q.shape == fp_q.shape
    agreement = ((fp_q >= 128) == (q_q >= 128)).mean()
    assert agreement >= 0.97, agreement


def test_segformer_int8_blocked_input_matches_fine(sf):
    """The s2d4 host-blocked variant matches the fine path. The rewrite is
    tap-exact but sums in a different fp order; on random weights that
    fp-level delta cascades through 8 pre-LN attention blocks and flips
    quantized bytes near the 0.5 margin, so assert mask agreement at the
    same 0.99 bound the DeepLab blocked test uses (test_deeplab.py)."""
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.parallel.steps import _normalize_s2d4

    params, state, folded = sf
    raw = np.random.default_rng(1).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x_fine = normalize(raw).astype(jnp.float32)
    x48 = _normalize_s2d4(space_to_depth4(raw)).astype(jnp.float32)

    amaxes = np.asarray(
        jax.jit(lambda f, r: segformer.calibration_amaxes_int8(f, r, blocked=True))(folded, x48)
    )
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(segformer.quantize_folded_int8)(folded)

    fine = np.asarray(
        jax.jit(
            lambda qt, r: segformer.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32)
        )(qtree, x_fine)
    )
    blocked = np.asarray(
        jax.jit(
            lambda qt, r: segformer.predict_quantized_int8(
                qt, scales, r, compute_dtype=jnp.float32, blocked=True
            )
        )(qtree, x48)
    )
    assert blocked.shape == fine.shape == (2, 64, 64)
    agreement = ((fine >= 128) == (blocked >= 128)).mean()
    assert agreement >= 0.99, agreement


def test_make_int8_predict_step_dispatches_segformer(sf):
    """make_int8_predict_step takes the model-owned protocol branch and
    produces cropped fine uint8 from host-blocked input."""
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.parallel.steps import make_int8_predict_step

    params, state, _ = sf
    raw = np.random.default_rng(2).integers(0, 256, (2, 96, 96, 3), dtype=np.uint8)
    raw48 = space_to_depth4(raw)
    step, qtree = make_int8_predict_step(
        segformer, params, state, raw48, overlap=16, host_s2d=True
    )
    out = np.asarray(step(qtree, raw48))
    assert out.shape == (2, 64, 64)
    assert out.dtype == np.uint8
