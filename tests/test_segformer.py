"""SegFormer family: registry, shapes, train-step compatibility, fused head."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robosat_tpu.models import get_model, segformer


@pytest.fixture(scope="module")
def sf_params():
    return segformer.init(0, num_classes=2)


def test_registry_exposes_segformer():
    assert get_model("segformer") is segformer


def test_output_shape(sf_params):
    params, state = sf_params
    x = jax.ShapeDtypeStruct((2, 128, 128, 3), jnp.float32)
    logits, _ = jax.eval_shape(lambda p, s, v: segformer.apply(p, s, v, train=False), params, state, x)
    assert logits.shape == (2, 128, 128, 2)


def test_rejects_bad_resolution(sf_params):
    params, state = sf_params
    with pytest.raises(AssertionError):
        jax.eval_shape(
            lambda p, s, v: segformer.apply(p, s, v, train=False),
            params,
            state,
            jax.ShapeDtypeStruct((1, 72, 72, 3), jnp.float32),
        )


def test_train_step_runs_and_learns(sf_params):
    """The generic train step works unchanged; a few Adam steps reduce the
    loss on a separable bright-blob task (transformer from scratch won't
    reach U-Net IoU in 10 steps — loss descent is the smoke signal)."""
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    params, state = segformer.init(3, num_classes=2)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(segformer, get_loss("CrossEntropy"), optimizer, augment=False)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 200, (2, 64, 64, 3), dtype=np.uint8)
    masks = np.zeros((2, 64, 64), np.int32)
    masks[:, 16:48, 16:48] = 1
    images[:, 16:48, 16:48] = np.clip(images[:, 16:48, 16:48].astype(np.int32) + 55, 0, 255).astype(np.uint8)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(10):
        params, state, opt_state, loss, _ = step(params, state, opt_state, key, images, masks)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # BN state moved (train mode).
    assert not np.allclose(
        np.asarray(state["fuse_bn"]["mean"]), np.zeros_like(np.asarray(state["fuse_bn"]["mean"]))
    )


def test_fused_margin_head_matches_softmax_quantize(sf_params):
    from robosat_tpu.ops.quantize import softmax_quantize

    params, state = sf_params
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    logits, _ = jax.jit(lambda p, s, v: segformer.apply(p, s, v, train=False))(params, state, x)
    ref = np.asarray(softmax_quantize(logits))[:, 8:-8, 8:-8]
    got = np.asarray(
        jax.jit(lambda f, v: segformer.predict_quantized_folded(f, v, overlap=8))(segformer.fold(params, state), x)
    )
    assert got.shape == ref.shape
    mismatches = (got != ref).mean()
    assert mismatches < 2e-3, mismatches
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_predict_step_uses_fused_segformer_path(sf_params):
    from robosat_tpu.parallel.steps import make_predict_step

    params, state = sf_params
    step = make_predict_step(segformer, overlap=16, fused_head=True, fold_bn=True)
    raw = np.random.default_rng(7).integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    out = np.asarray(step(params, state, raw))
    assert out.shape == (1, 64, 64)
    assert out.dtype == np.uint8


@pytest.mark.slow
def test_rs_train_and_predict_segformer(tmp_path, slippy_fixtures):
    """model = 'segformer' trains and predicts through the real CLI tools
    (checkpoint artifact, resume-compatible meta, valid probability PNGs)."""
    import argparse
    import shutil

    from PIL import Image

    from robosat_tpu.config import save_config
    from robosat_tpu.tools import predict, train

    # Tiny train dataset from the shared slippy fixtures.
    dataset_dir = tmp_path / "dataset"
    for split in ("training", "validation"):
        for kind in ("images", "labels"):
            src = slippy_fixtures / ("images" if kind == "images" else "labels")
            shutil.copytree(src, dataset_dir / split / kind)

    save_config(
        {
            "common": {"dataset": str(dataset_dir), "classes": ["background", "parking"], "colors": ["denim", "orange"]},
            "weights": {"values": [1.6, 5.7]},
        },
        str(tmp_path / "dataset.toml"),
    )
    save_config(
        {
            "common": {
                "cuda": False, "batch_size": 2, "image_size": 64,
                "checkpoint": str(tmp_path / "chk"), "model": "segformer", "sync_bn": False,
            },
            "opt": {"epochs": 1, "lr": 0.0001, "loss": "CrossEntropy"},
        },
        str(tmp_path / "model.toml"),
    )

    train.main(
        argparse.Namespace(
            model=str(tmp_path / "model.toml"), dataset=str(tmp_path / "dataset.toml"),
            resume=False, checkpoint=None, profile=None, workers=2,
        )
    )
    chks = sorted((tmp_path / "chk").glob("*.npz"))
    assert chks, "rs train wrote no checkpoint"

    predict.main(
        argparse.Namespace(
            batch_size=2, checkpoint=str(chks[-1]), overlap=16, strip=1, tile_size=64, workers=2,
            tiles=str(slippy_fixtures / "images"), probs=str(tmp_path / "probs"),
            model=str(tmp_path / "model.toml"), dataset=str(tmp_path / "dataset.toml"), profile=None,
        )
    )
    outs = list((tmp_path / "probs").rglob("*.png"))
    assert len(outs) == 3
    img = Image.open(outs[0])
    assert img.mode == "P" and img.size == (64, 64)
