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

    opt_state = optimizer.init(params)
    losses = []
    p, s = params, state
    for i in range(6):
        p, s, opt_state, loss, counts = step(p, s, opt_state, jax.random.PRNGKey(0), images, masks)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # The family LEARNS under the shared step, not just runs: the loss
    # descends over a few Adam steps on a fixed batch.
    assert losses[-1] < losses[0], losses
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


def test_deeplab_int8_matches_folded():
    """The hybrid-int8 DeepLab walk agrees with the folded fp32 path: same
    site count between calibration and inference, and near-total quantized
    mask agreement (random-init logits saturate, so int8 noise flips almost
    nothing; a structural walk mismatch collapses agreement)."""
    import numpy as np
    from robosat_tpu.models import deeplab
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.ops.augment import normalize

    params, state = deeplab.init(0, num_classes=2)
    folded = jax.jit(deeplab.fold)(params, state)
    raw = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x = normalize(raw).astype(jnp.float32)

    amaxes = np.asarray(
        jax.jit(lambda f, r: deeplab.calibration_amaxes_int8(f, r))(folded, x)
    )
    # 53 backbone sites + aspp1 + 3 dilated + aspp_proj + dec1 + dec2 = 59.
    assert amaxes.shape == (59,)
    assert np.all(amaxes > 0)

    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(deeplab.quantize_folded_int8)(folded)

    fp_q = np.asarray(jax.jit(lambda f, r: deeplab.predict_quantized_folded(f, r))(folded, x))
    q_q = np.asarray(
        jax.jit(lambda qt, r: deeplab.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32))(
            qtree, x
        )
    )
    assert q_q.shape == fp_q.shape
    agreement = ((fp_q >= 128) == (q_q >= 128)).mean()
    assert agreement >= 0.97, agreement


def test_deeplab_int8_blocked_input_matches_fine():
    """The s2d4 host-blocked stem variant of the int8 walk matches the fine
    path (same scales, same weights; stem summation order differs only at fp
    level)."""
    import numpy as np
    from robosat_tpu.models import deeplab
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.ops.augment import normalize
    from robosat_tpu.parallel.steps import _normalize_s2d4

    params, state = deeplab.init(1, num_classes=2)
    folded = jax.jit(deeplab.fold)(params, state)
    raw = np.random.default_rng(1).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x_fine = normalize(raw).astype(jnp.float32)
    x48 = _normalize_s2d4(space_to_depth4(raw)).astype(jnp.float32)

    amaxes = np.asarray(jax.jit(lambda f, r: deeplab.calibration_amaxes_int8(f, r, blocked=True))(folded, x48))
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(deeplab.quantize_folded_int8)(folded)

    fine = np.asarray(
        jax.jit(lambda qt, r: deeplab.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32))(qtree, x_fine)
    )
    blocked = np.asarray(
        jax.jit(
            lambda qt, r: deeplab.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32, blocked=True)
        )(qtree, x48)
    )
    assert blocked.shape == fine.shape
    assert ((fine >= 128) == (blocked >= 128)).mean() >= 0.99


@pytest.mark.slow
def test_rs_predict_deeplab_int8_mode(tmp_path, slippy_fixtures):
    """`rs predict` with model = deeplabv3plus + int8 = true produces valid
    probability tiles through the real tool (model-owned int8 protocol +
    host-blocked s2d input)."""
    import argparse

    from PIL import Image

    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.models import deeplab
    from robosat_tpu.tools import predict

    params, state = deeplab.init(0, num_classes=2)
    chk = tmp_path / "model.npz"
    save_checkpoint(str(chk), {"params": params, "state": state}, meta={"epoch": 1})

    save_config(
        {
            "common": {
                "cuda": False, "batch_size": 2, "image_size": 128,
                "checkpoint": str(tmp_path), "int8": True, "model": "deeplabv3plus",
            }
        },
        str(tmp_path / "model.toml"),
    )
    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    predict.main(
        argparse.Namespace(
            batch_size=2, checkpoint=str(chk), overlap=32, strip=1, tile_size=128, workers=2,
            tiles=str(slippy_fixtures / "images"), probs=str(tmp_path / "probs"),
            model=str(tmp_path / "model.toml"), dataset=str(tmp_path / "dataset.toml"), profile=None,
        )
    )

    outs = list((tmp_path / "probs").rglob("*.png"))
    assert len(outs) == 3
    img = Image.open(outs[0])
    assert img.mode == "P" and img.size == (128, 128)
