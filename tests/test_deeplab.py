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
