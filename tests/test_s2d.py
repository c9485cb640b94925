"""Space-to-depth decoder tail: algebraic equivalence with the fine-grid path.

The rewrites (robosat_tpu/models/layers.py s2d_* kernels) keep the U-Net tail
at half resolution with parity-blocked 128-lane channels; these tests pin
them against the naive fine-grid ops they replace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from robosat_tpu.models.layers import (
    CONV_DIMS,
    depth_to_space2,
    fused_upsample_conv3x3,
    s2d_conv3x3_kernel,
    s2d_up_conv3x3_kernel,
    space_to_depth2,
)


def _conv_same(k, x):
    return lax.conv_general_dilated(x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=CONV_DIMS)


def test_space_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    assert np.array_equal(np.asarray(depth_to_space2(space_to_depth2(x))), np.asarray(x))


def test_space_to_depth_block_order():
    """Block p = 2*di + dj holds fine pixel (2i+di, 2j+dj)."""
    fine = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    s2d = np.asarray(space_to_depth2(jnp.asarray(fine)))
    for di in (0, 1):
        for dj in (0, 1):
            assert np.array_equal(s2d[0, :, :, 2 * di + dj], fine[0, di::2, dj::2, 0])


@pytest.mark.parametrize("seed", [0, 1])
def test_s2d_up_conv_matches_fused_upsample_conv(seed):
    rng = np.random.default_rng(seed)
    cin, cout = 16, 8
    x = jnp.asarray(rng.normal(size=(2, 9, 7, cin)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)

    fine = np.asarray(fused_upsample_conv3x3({"w": w3}, x))
    s2d = np.asarray(depth_to_space2(_conv_same(s2d_up_conv3x3_kernel(w3), x)))
    np.testing.assert_allclose(s2d, fine, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_s2d_conv3x3_matches_fine_conv(seed):
    rng = np.random.default_rng(seed)
    cin, cout = 8, 8
    fine_x = jnp.asarray(rng.normal(size=(2, 12, 10, cin)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)

    fine = np.asarray(_conv_same(w3, fine_x))
    s2d = np.asarray(depth_to_space2(_conv_same(s2d_conv3x3_kernel(w3), space_to_depth2(fine_x))))
    np.testing.assert_allclose(s2d, fine, rtol=1e-5, atol=1e-5)


def test_s2d_head_matches_fine_head():
    """fused_prediction_head_s2d on blocked features == fused_prediction_head
    on the fine features (same margins up to dot-product summation order;
    knife-edge pixels may land one quantization bin apart)."""
    from robosat_tpu.ops.head import fused_prediction_head, fused_prediction_head_s2d

    rng = np.random.default_rng(3)
    fine = jnp.asarray(rng.normal(size=(2, 32, 32, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 32, 2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32) * 0.1)

    for overlap in (0, 8):
        a = np.asarray(fused_prediction_head(fine, w, b, overlap=overlap))
        s = np.asarray(fused_prediction_head_s2d(space_to_depth2(fine), w, b, overlap=overlap))
        diff = np.abs(a.astype(int) - s.astype(int))
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.999


def test_predict_step_s2d_matches_reference_path():
    """The full s2d predict step agrees with the unoptimized step on a real
    (randomly initialized) U-Net: knife-edge pixels may move one bin."""
    from robosat_tpu.models import unet
    from robosat_tpu.parallel.steps import make_predict_step

    params, state = unet.init(0, num_classes=2)
    raw = np.random.default_rng(5).integers(0, 255, (2, 64, 64, 3), np.uint8)

    step_ref = make_predict_step(unet, overlap=8, fold_bn=False, fused_head=False)
    step_s2d = make_predict_step(unet, overlap=8, fold_bn=True, fused_head=True, s2d=True)
    a = np.asarray(step_ref(params, state, raw))
    b = np.asarray(step_s2d(params, state, raw))

    assert a.shape == b.shape
    diff = np.abs(a.astype(int) - b.astype(int))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.995


# ---------------------------------------------------------------------------
# Space-to-depth STEM (host-blocked input)
# ---------------------------------------------------------------------------


def test_stem_s2d4_matches_fine_stem():
    """Blocked 3x3 stem conv + parity pool == conv7x7/s2 + bias + relu +
    maxpool3/s2 (fp32, exact up to summation order)."""
    from robosat_tpu.models.layers import (
        max_pool,
        pool3s2_from_parity,
        space_to_depth4,
        stem_s2d4_kernel,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    fine = lax.conv_general_dilated(x, w7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=CONV_DIMS)
    fine = max_pool(jax.nn.relu(fine + b), window=3, stride=2, padding=1)

    x48 = space_to_depth4(x)
    out = _conv_same(stem_s2d4_kernel(w7), x48)
    blocked = pool3s2_from_parity(jax.nn.relu(out + jnp.tile(b, 4)), 8)

    np.testing.assert_allclose(np.asarray(blocked), np.asarray(fine), rtol=1e-4, atol=1e-4)


def test_space_to_depth4_numpy_and_jnp_agree():
    rng = np.random.default_rng(3)
    from robosat_tpu.models.layers import space_to_depth4

    x = rng.integers(0, 255, (2, 16, 24, 3), dtype=np.uint8)
    a = space_to_depth4(x)
    bjnp = np.asarray(space_to_depth4(jnp.asarray(x)))
    assert a.shape == (2, 4, 6, 48)
    assert np.array_equal(a, bjnp)


def test_unet_from48_matches_s2d_path():
    """Full folded forward from host-blocked input == the fine-input s2d
    path (fp32)."""
    from robosat_tpu.models import unet
    from robosat_tpu.models.layers import space_to_depth4

    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    ref = np.asarray(jax.jit(unet.apply_features_folded_s2d)(folded, x))
    got = np.asarray(jax.jit(unet.apply_features_folded_s2d_from48)(folded, space_to_depth4(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_unet_apply_s2d_train_matches_apply():
    """The s2d TRAIN forward (default tail in make_train_step) matches the
    plain walk — logits to fp tolerance, BN state updates identical, and
    gradients through a scalar loss equal to fp summation order."""
    from robosat_tpu.models import unet

    params, state = unet.init(0, num_classes=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    l_ref, s_ref = jax.jit(lambda p, s, xx: unet.apply(p, s, xx, True))(params, state, x)
    l_s2d, s_s2d = jax.jit(lambda p, s, xx: unet.apply_s2d(p, s, xx, True))(params, state, x)
    scale = float(jnp.max(jnp.abs(l_ref)))
    np.testing.assert_allclose(np.asarray(l_s2d), np.asarray(l_ref), rtol=0, atol=1e-5 * scale)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_s2d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(apply_fn, p):
        logits, _ = apply_fn(p, state, x, True)
        return jnp.sum(jnp.tanh(logits))

    g_ref = jax.grad(lambda p: loss(unet.apply, p))(params)
    g_s2d = jax.grad(lambda p: loss(unet.apply_s2d, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_s2d)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-4 * (np.abs(a).max() + 1e-9))
