"""Model tests: shapes, channel math, jit-compilability, checkpoint roundtrip.

Shape/structure checks use jax.eval_shape (trace-only, no XLA compile) so the
suite stays fast on CPU; one real jitted forward covers numerics and BN state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.checkpoint import load_checkpoint, save_checkpoint
from robosat_tpu.models import get_model
from robosat_tpu.models import resnet, unet


@pytest.fixture(scope="module")
def unet_params():
    return unet.init(0, num_classes=2)


def test_encoder_feature_shapes():
    params, state = resnet.init(0)
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    (enc1, enc2, enc3, enc4), _ = jax.eval_shape(lambda p, s, v: resnet.apply(p, s, v, train=False), params, state, x)
    assert enc1.shape == (1, 16, 16, 256)
    assert enc2.shape == (1, 8, 8, 512)
    assert enc3.shape == (1, 4, 4, 1024)
    assert enc4.shape == (1, 2, 2, 2048)


def test_unet_output_shape(unet_params):
    params, state = unet_params
    x = jax.ShapeDtypeStruct((2, 256, 256, 3), jnp.float32)
    logits, _ = jax.eval_shape(lambda p, s, v: unet.apply(p, s, v, train=False), params, state, x)
    assert logits.shape == (2, 256, 256, 2)


def test_unet_rejects_bad_resolution(unet_params):
    params, state = unet_params
    with pytest.raises(AssertionError):
        jax.eval_shape(
            lambda p, s, v: unet.apply(p, s, v, train=False),
            params,
            state,
            jax.ShapeDtypeStruct((1, 100, 100, 3), jnp.float32),
        )


def test_unet_bfloat16_compute_dtype(unet_params):
    params, state = unet_params
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.bfloat16)
    logits, _ = jax.eval_shape(lambda p, s, v: unet.apply(p, s, v, train=False), params, state, x)
    assert logits.dtype == jnp.bfloat16


def test_unet_jit_and_bn_state_update(unet_params):
    params, state = unet_params

    from functools import partial

    @partial(jax.jit, static_argnames="train")
    def fwd(p, s, x, train):
        return unet.apply(p, s, x, train=train)

    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    logits, new_state = fwd(params, state, x, train=True)
    assert logits.shape == (1, 64, 64, 2)
    assert bool(jnp.isfinite(logits).all())
    # Running BN stats must move in training mode.
    before = np.asarray(state["encoder"]["bn1"]["mean"])
    after = np.asarray(new_state["encoder"]["bn1"]["mean"])
    assert not np.allclose(before, after)

    # Eval mode leaves state untouched.
    _, eval_state = fwd(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(eval_state["encoder"]["bn1"]["mean"]), before)


def test_registry():
    assert get_model("unet") is unet
    with pytest.raises(ValueError):
        get_model("nope")


def test_checkpoint_roundtrip(tmp_path, unet_params):
    params, state = unet_params
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"params": params, "state": state}, meta={"epoch": 3})
    trees, meta = load_checkpoint(path)
    assert meta["epoch"] == 3

    flat_before = jax.tree_util.tree_leaves(params)
    flat_after = jax.tree_util.tree_leaves(trees["params"])
    assert len(flat_before) == len(flat_after)
    for a, b in zip(flat_before, flat_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Structure restored exactly (lists stay lists).
    assert isinstance(trees["params"]["encoder"]["layer1"], list)
    assert len(trees["params"]["encoder"]["layer1"]) == 3


def test_torch_resnet_converter_shapes():
    """The converter maps a synthetic torchvision-style state_dict to our layout."""
    from robosat_tpu.checkpoint import convert_torch_resnet50

    sd = {}

    def add_bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    add_bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    mids = (64, 128, 256, 512)
    cin = 64
    for si, (nb, mid) in enumerate(zip(blocks, mids)):
        for bi in range(nb):
            base = "layer{}.{}".format(si + 1, bi)
            sd[base + ".conv1.weight"] = np.zeros((mid, cin, 1, 1), np.float32)
            add_bn(base + ".bn1", mid)
            sd[base + ".conv2.weight"] = np.zeros((mid, mid, 3, 3), np.float32)
            add_bn(base + ".bn2", mid)
            sd[base + ".conv3.weight"] = np.zeros((mid * 4, mid, 1, 1), np.float32)
            add_bn(base + ".bn3", mid * 4)
            if bi == 0:
                sd[base + ".downsample.0.weight"] = np.zeros((mid * 4, cin, 1, 1), np.float32)
                add_bn(base + ".downsample.1", mid * 4)
            cin = mid * 4

    params, state = convert_torch_resnet50(sd)

    # Shapes must line up with our own init.
    ref_params, ref_state = resnet.init(0)

    def shapes(tree):
        return [np.shape(leaf) for leaf in jax.tree_util.tree_leaves(tree)]

    assert shapes(params) == shapes(ref_params)
    assert shapes(state) == shapes(ref_state)
