"""DeepLabv3+ family: shapes, registry, train-step compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robosat_tpu.models import deeplab, get_model


@pytest.fixture(scope="module")
def dl_params():
    return deeplab.init(0, num_classes=2)


def test_registry_exposes_deeplab():
    assert get_model("deeplabv3plus") is deeplab


def test_output_shape(dl_params):
    params, state = dl_params
    x = jax.ShapeDtypeStruct((2, 128, 128, 3), jnp.float32)
    logits, _ = jax.eval_shape(lambda p, s, v: deeplab.apply(p, s, v, train=False), params, state, x)
    assert logits.shape == (2, 128, 128, 2)


def test_rejects_bad_resolution(dl_params):
    params, state = dl_params
    with pytest.raises(AssertionError):
        jax.eval_shape(
            lambda p, s, v: deeplab.apply(p, s, v, train=False),
            params,
            state,
            jax.ShapeDtypeStruct((1, 72, 72, 3), jnp.float32),
        )


def test_train_step_runs(dl_params):
    """The generic train step works unchanged with the second family."""
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    params, state = dl_params
    optimizer = optax.adam(1e-4)
    step = make_train_step(deeplab, get_loss("Lovasz"), optimizer, augment=False)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 64, 64)).astype(np.int32)

    p, s, o, loss, counts = step(params, state, optimizer.init(params), jax.random.PRNGKey(0), images, masks)
    assert np.isfinite(float(loss))
    # BN state moved (train mode).
    before = np.asarray(state["aspp_proj"]["bn"]["mean"])
    after = np.asarray(s["aspp_proj"]["bn"]["mean"])
    assert not np.allclose(before, after)


def test_folded_forward_matches_apply(dl_params):
    """BN folding preserves the inference forward."""
    params, state = dl_params
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    ref, _ = jax.jit(lambda p, s, xx: deeplab.apply(p, s, xx, train=False))(params, state, x)
    folded = jax.jit(deeplab.fold)(params, state)
    got = jax.jit(deeplab.apply_folded)(folded, x)
    # random-init logits reach |l| ~ 2000; fold rounding is ~5e-6 relative.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_fused_margin_head_matches_softmax_quantize(dl_params):
    """The margin-then-resize fused head equals resize(logits) -> softmax ->
    digitize (bilinear resize is linear, so the margin commutes with it)."""
    from robosat_tpu.ops.quantize import softmax_quantize

    params, state = dl_params
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    folded = jax.jit(deeplab.fold)(params, state)
    logits = jax.jit(deeplab.apply_folded)(folded, x)
    ref = np.asarray(softmax_quantize(logits))
    got = np.asarray(jax.jit(lambda f, xx: deeplab.predict_quantized_folded(f, xx, overlap=8))(folded, x))
    assert got.shape == (1, 48, 48)
    ref_crop = ref[:, 8:-8, 8:-8]
    # fp reassociation at digitize boundaries can move isolated pixels by 1.
    mismatches = (got != ref_crop).mean()
    assert mismatches < 2e-3, "fused deeplab head diverged: {} mismatch".format(mismatches)
    assert np.abs(got.astype(np.int32) - ref_crop.astype(np.int32)).max() <= 1


def test_predict_step_uses_fused_deeplab_path(dl_params):
    """make_predict_step picks the model-specific fused head for deeplab."""
    from robosat_tpu.parallel.steps import make_predict_step

    params, state = dl_params
    step = make_predict_step(deeplab, overlap=16, fused_head=True, fold_bn=True)
    raw = np.random.default_rng(7).integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    out = np.asarray(step(params, state, raw))
    assert out.shape == (1, 64, 64)
    assert out.dtype == np.uint8
