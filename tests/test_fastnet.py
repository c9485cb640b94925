"""Contract tests for the compact `fast` family (robosat_tpu/models/fastnet).

FastNet is the opt-in TPU-first prediction architecture distilled from the
flagship U-Net (docs/PERF.md: the flagship's measured ~2,700 tiles/s floor
motivates it). These tests pin: the sub-pixel head's channel convention
against the predict writer's interleave, fold parity, blocked-vs-fine int8
byte identity, the fused bf16 head against the naive softmax path, the
distillation step (loss decreases, student moves toward the teacher), and
the real `rs predict` / `rs train --teacher` tools end to end.
"""

import argparse

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fn_setup():
    import jax

    from robosat_tpu.models import fastnet
    from robosat_tpu.ops.augment import normalize

    params, state = fastnet.init(0, num_classes=2)
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    x = np.asarray(normalize(raw), np.float32)
    folded = jax.jit(fastnet.fold)(params, state)
    return params, state, folded, raw, x


def test_registry_exposes_fast():
    from robosat_tpu.models import fastnet, get_model

    assert get_model("fast") is fastnet


def test_output_shape_and_train_mode(fn_setup):
    import jax

    from robosat_tpu.models import fastnet

    params, state, _, _, x = fn_setup
    logits, new_state = jax.jit(lambda p, s, xx: fastnet.apply(p, s, xx, True))(params, state, x)
    assert logits.shape == (2, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))
    # train mode updated BN running statistics
    assert not np.allclose(np.asarray(new_state["stem_bn"]["mean"]), np.asarray(state["stem_bn"]["mean"]))


def test_rejects_bad_resolution(fn_setup):
    from robosat_tpu.models import fastnet

    params, state, _, _, _ = fn_setup
    with pytest.raises(AssertionError):
        fastnet.apply(params, state, np.zeros((1, 48, 48, 3), np.float32), False)


def test_fold_parity(fn_setup):
    import jax

    from robosat_tpu.models import fastnet

    params, state, folded, _, x = fn_setup
    le, _ = jax.jit(lambda p, s, xx: fastnet.apply(p, s, xx, False))(params, state, x)
    lf = jax.jit(fastnet.apply_folded)(folded, x)
    le, lf = np.asarray(le, np.float32), np.asarray(lf, np.float32)
    assert np.max(np.abs(lf - le)) <= 1e-4 * max(np.max(np.abs(le)), 1.0)


def test_subpixel_channel_convention_matches_writer():
    """subpixel_to_fine (training logits) and the predict writer's two
    depth_to_space2 passes must place channel p at the same fine pixel —
    otherwise training and prediction would disagree about which sub-pixel
    each margin belongs to."""
    from robosat_tpu.models.fastnet import subpixel_to_fine
    from robosat_tpu.models.layers import depth_to_space2
    from robosat_tpu.ops.head import interleave_subpixel_u8

    rng = np.random.default_rng(0)
    blocked = rng.integers(0, 255, (1, 3, 5, 16), dtype=np.uint8)
    via_writer = depth_to_space2(depth_to_space2(blocked))[..., 0]
    via_head = np.asarray(interleave_subpixel_u8(blocked))
    np.testing.assert_array_equal(via_head, via_writer)
    via_train = np.asarray(subpixel_to_fine(blocked.astype(np.float32), 1))[..., 0]
    np.testing.assert_array_equal(via_train.astype(np.uint8), via_writer)


def test_bf16_fused_predict_matches_naive(fn_setup):
    """predict_quantized_folded == softmax_quantize(apply_folded) bytes
    (the sub-pixel margin head is the same math as the 2-class softmax)."""
    import jax

    from robosat_tpu.models import fastnet
    from robosat_tpu.ops.quantize import softmax_quantize

    _, _, folded, _, x = fn_setup
    q_fused = np.asarray(jax.jit(lambda f, xx: fastnet.predict_quantized_folded(f, xx, overlap=8))(folded, x))
    logits = np.asarray(jax.jit(fastnet.apply_folded)(folded, x), np.float32)
    q_naive = np.asarray(softmax_quantize(logits))[:, 8:-8, 8:-8]
    np.testing.assert_array_equal(q_fused, q_naive)


def test_int8_blocked_matches_fine(fn_setup):
    """The host-blocked int8 step and the fine-input int8 step are the same
    math: bytes must agree exactly after the host interleave."""
    import jax
    import jax.numpy as jnp

    from robosat_tpu.models import fastnet
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models.layers import depth_to_space2, space_to_depth4

    _, _, folded, _, x = fn_setup
    x48 = space_to_depth4(x)
    amaxes = np.asarray(
        jax.jit(lambda f, xx: fastnet.calibration_amaxes_int8(f, xx, blocked=True))(folded, x48)
    )
    assert amaxes.shape == (15,)  # 9 encoder + 6 decoder conv sites
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(fastnet.quantize_folded_int8)(folded)

    qb = np.asarray(
        jax.jit(lambda t, xx: fastnet.predict_quantized_int8(t, scales, xx, overlap=8, blocked=True))(
            qtree, x48.astype(jnp.bfloat16)
        )
    )
    assert qb.shape == (2, 12, 12, 16)
    qf = np.asarray(
        jax.jit(lambda t, xx: fastnet.predict_quantized_int8(t, scales, xx, overlap=8, blocked=False))(
            qtree, np.asarray(x, np.float32).astype(jnp.bfloat16)
        )
    )
    np.testing.assert_array_equal(depth_to_space2(depth_to_space2(qb))[..., 0], qf)


def test_int8_calibration_order_is_pinned(fn_setup):
    """Scale-count mismatch must fail loudly (positional site contract)."""
    import jax.numpy as jnp

    from robosat_tpu.models import fastnet
    from robosat_tpu.models.layers import space_to_depth4

    import jax

    _, _, folded, _, x = fn_setup
    qtree = jax.jit(fastnet.quantize_folded_int8)(folded)
    # Too few scales dies at the missing site (IndexError); too many at the
    # count assertion after the walk.
    with pytest.raises((AssertionError, IndexError)):
        fastnet.predict_quantized_int8(
            qtree, [0.1] * 14, space_to_depth4(x).astype(jnp.bfloat16), blocked=True
        )
    with pytest.raises(AssertionError):
        fastnet.predict_quantized_int8(
            qtree, [0.1] * 16, space_to_depth4(x).astype(jnp.bfloat16), blocked=True
        )


def test_learning_smoke(fn_setup):
    """A few labeled train steps reduce the loss (the architecture can fit)."""
    import jax
    import optax

    from robosat_tpu.models import fastnet
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    params, state = fastnet.init(1, num_classes=2)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 200, (2, 64, 64, 3), dtype=np.uint8)
    masks = np.zeros((2, 64, 64), np.int32)
    masks[:, 16:48, 16:48] = 1
    images[:, 16:48, 16:48] += 55

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(fastnet, get_loss("CrossEntropy"), optimizer, weight=np.ones(2, np.float32), augment=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(5):
        params, state, opt_state, loss, _ = step(params, state, opt_state, key, images, masks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_distillation_step_moves_student_toward_teacher():
    """make_distill_train_step: the KD loss decreases and the student's
    probabilities move toward the teacher's over a few steps."""
    import jax
    import optax

    from robosat_tpu.models import fastnet, unet
    from robosat_tpu.ops.augment import normalize
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_distill_train_step

    t_params, t_state = unet.init(0, num_classes=2)
    teacher_folded = jax.jit(unet.fold)(t_params, t_state)

    params, state = fastnet.init(2, num_classes=2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_distill_train_step(
        fastnet, unet, get_loss("CrossEntropy"), optimizer,
        weight=np.ones(2, np.float32), augment=False, alpha=0.9, temp=2.0,
    )

    rng = np.random.default_rng(4)
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 64, 64)).astype(np.int32)
    key = jax.random.PRNGKey(0)

    def agreement(params, state):
        s_logits, _ = fastnet.apply(params, state, normalize(images), False)
        t_logits = unet.apply_folded(teacher_folded, normalize(images))
        sp = jax.nn.softmax(np.asarray(s_logits, np.float32), axis=-1)
        tp = jax.nn.softmax(np.asarray(t_logits, np.float32), axis=-1)
        return float(np.mean(np.abs(np.asarray(sp) - np.asarray(tp))))

    before = agreement(params, state)
    losses = []
    for _ in range(6):
        params, state, opt_state, loss, _ = step(params, state, opt_state, teacher_folded, key, images, masks)
        losses.append(float(loss))
    after = agreement(params, state)
    assert losses[-1] < losses[0], losses
    assert after < before, (before, after)


@pytest.mark.slow
def test_rs_predict_fast_int8_blocked_output(tmp_path, slippy_fixtures):
    """`rs predict` with model = fast + int8 writes valid probability tiles
    through the real tool — host-blocked input, 16-channel blocked output,
    writer interleave."""
    from PIL import Image

    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.models import fastnet
    from robosat_tpu.tools import predict

    params, state = fastnet.init(0, num_classes=2)
    chk = tmp_path / "model.npz"
    save_checkpoint(str(chk), {"params": params, "state": state}, meta={"epoch": 1})

    save_config(
        {
            "common": {
                "cuda": False, "batch_size": 2, "image_size": 128,
                "checkpoint": str(tmp_path), "int8": True, "model": "fast",
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


@pytest.mark.slow
def test_rs_train_distills_fast_from_unet(tmp_path, slippy_fixtures):
    """`rs train --teacher` end to end: a fast-family epoch distilled from a
    (random-weight) flagship checkpoint writes a loadable student."""
    import shutil

    from robosat_tpu.checkpoint import load_model_checkpoint, save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.models import unet
    from robosat_tpu.tools import train

    t_params, t_state = unet.init(0, num_classes=2)
    teacher_chk = tmp_path / "teacher.npz"
    save_checkpoint(str(teacher_chk), {"params": t_params, "state": t_state}, meta={"epoch": 1})

    dataset_root = tmp_path / "dataset"
    for split in ("training", "validation"):
        for kind in ("images", "labels"):
            shutil.copytree(slippy_fixtures / kind, dataset_root / split / kind)

    save_config(
        {
            "common": {
                "cuda": False, "batch_size": 2, "image_size": 64,
                "checkpoint": str(tmp_path / "out"), "model": "fast",
            },
            "opt": {"epochs": 1, "lr": 1e-4, "loss": "CrossEntropy"},
        },
        str(tmp_path / "model.toml"),
    )
    save_config(
        {
            "common": {"dataset": str(dataset_root), "classes": ["background", "parking"], "colors": ["denim", "orange"]},
            "weights": {"values": [1.0, 1.0]},
        },
        str(tmp_path / "dataset.toml"),
    )
    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": 64, "checkpoint": str(tmp_path / "out")},
            "opt": {"epochs": 1, "lr": 1e-4, "loss": "CrossEntropy"},
        },
        str(tmp_path / "teacher_model.toml"),
    )

    train.main(
        argparse.Namespace(
            model=str(tmp_path / "model.toml"),
            dataset=str(tmp_path / "dataset.toml"),
            checkpoint=None,
            resume=False,
            workers=2,
            profile=None,
            teacher=str(teacher_chk),
            teacher_model=str(tmp_path / "teacher_model.toml"),
            distill_alpha=0.9,
            distill_temp=2.0,
        )
    )

    out = tmp_path / "out" / "checkpoint-00001-of-00001.npz"
    assert out.exists()
    params, state, _ = load_model_checkpoint(str(out), num_classes=2)
    assert "stem" in params and "stem_bn" in params
