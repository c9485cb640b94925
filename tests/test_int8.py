"""Hybrid int8 inference datapath: numeric fidelity and quality on a trained
model.

Validates the performance lever (docs/PERF.md: ~302 int8 TOPS vs ~130 bf16
TFLOPs on this chip) end to end: per-channel weight quantization, calibrated
static activation scales, int8 bottleneck-stack convolutions with int32
accumulation (stem + s2d decoder stay bf16 — see models/int8.py for the
traced rationale), and the `rs predict` int8 mode — the predicted masks must
match the fp32 path almost everywhere, and IoU on a trained model must not
degrade.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from robosat_tpu.models import int8 as q8
from robosat_tpu.models import unet
from robosat_tpu.ops.augment import normalize
from robosat_tpu.ops.losses import get_loss
from robosat_tpu.ops.metrics import Metrics
from robosat_tpu.parallel.steps import make_int8_predict_step, make_predict_step, make_train_step

from test_learning import _make_task  # bright-blob separable task


def _trained(images, masks, steps=20):
    params, state = unet.init(0, num_classes=2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(
        unet, get_loss("CrossEntropy"), optimizer, weight=np.array([1.0, 1.0], np.float32), augment=False
    )
    key = jax.random.PRNGKey(0)
    for i in range(steps):
        params, state, opt_state, _, _ = train_step(params, state, opt_state, jax.random.fold_in(key, i), images, masks)
    return params, state


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32)
    wq, ws = q8._quantize_weight(w)
    assert wq.dtype == jnp.int8
    back = np.asarray(wq, np.float32) * np.asarray(ws)
    assert np.max(np.abs(back - w)) <= np.max(np.abs(w)) / 127.0 + 1e-7


def test_calibration_site_count_matches_inference():
    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    raw = np.random.default_rng(1).integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    amaxes = np.asarray(jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r)))(folded, raw))
    # Quantized sites: 16 bottleneck blocks x 3 convs + 4 downsamples = 52,
    # plus 7 decoder convs (stem and final head stay float).
    assert amaxes.shape == (59,)
    assert np.all(amaxes > 0)

    qtree = q8.quantize_unet_folded(folded)
    scales = tuple(q8.scales_from_amaxes(amaxes))
    feats = jax.jit(lambda qt, r: q8.apply_features_int8(qt, scales, normalize(r), compute_dtype=jnp.float32))(
        qtree, raw
    )
    assert feats.shape == (1, 32, 32, 128)  # s2d parity-blocked decoder output
    assert np.all(np.isfinite(np.asarray(feats, np.float32)))


@pytest.mark.slow
def test_int8_matches_fp32_on_trained_model():
    """On a trained model the int8 masks agree with fp32 nearly everywhere
    and the foreground IoU does not degrade."""
    rng = np.random.default_rng(0)
    images, masks = _make_task(rng, n=8)
    params, state = _trained(images, masks)

    fp_step = make_predict_step(unet, overlap=0, compute_dtype=jnp.float32, fused_head=False)
    q_step, qtree = make_int8_predict_step(unet, params, state, images, overlap=0, fused_head=False)

    fp_q = np.asarray(fp_step(params, state, images))
    q_q = np.asarray(q_step(qtree, images))

    fp_mask = fp_q.astype(np.int32) >= 128  # fg prob >= .5 in digitize space
    q_mask = q_q.astype(np.int32) >= 128
    agreement = (fp_mask == q_mask).mean()
    # A 20-step model is still chaotic (its fg IoU is only ~0.24), and on
    # such weights static-amax int8 legitimately flips a few percent of
    # pixels — measured 0.972 here, with the int8 IoU coming out HIGHER
    # than fp32 (quantization acts as regularization). The bar is set to
    # catch structural datapath bugs, not quantization noise: a one-pixel
    # feature shift (the round-2 stride-2 padding bug class) measures ~0.93
    # agreement on this task and still fails.
    assert agreement >= 0.95, "int8/fp32 mask agreement too low: {}".format(agreement)

    def iou(pred):
        metrics = Metrics(range(2))
        tp = np.logical_and(pred, masks == 1).sum()
        fp = np.logical_and(pred, masks == 0).sum()
        fn = np.logical_and(~pred, masks == 1).sum()
        return tp / max(tp + fp + fn, 1)

    iou_fp, iou_q = iou(fp_mask), iou(q_mask)
    # Tolerance 0.05, not tighter: on this 20-step chaotic model the
    # int8-vs-fp IoU delta measured -0.025/+0.009/-0.014 across hosts and
    # calibration modes (round 4) — pure fp-chaos noise, while a structural
    # datapath bug (1px shift) moves agreement above, not this. The REAL
    # trained-model accuracy evidence is benchmarks/int8_iou_eval.py
    # (docs/PERF.md round 4), which converges the model first.
    assert iou_q >= iou_fp - 0.05, "int8 IoU degraded: {} vs {}".format(iou_q, iou_fp)


@pytest.mark.slow
def test_rs_predict_int8_mode(tmp_path, slippy_fixtures):
    """`rs predict` with int8 = true in the model TOML produces valid
    probability tiles through the real tool (calibration on first batch)."""
    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.tools import predict

    params, state = unet.init(0, num_classes=2)
    chk = tmp_path / "model.npz"
    save_checkpoint(str(chk), {"params": params, "state": state}, meta={"epoch": 1})

    save_config(
        {"common": {"cuda": False, "batch_size": 2, "image_size": 128, "checkpoint": str(tmp_path), "int8": True}},
        str(tmp_path / "model.toml"),
    )
    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    predict.main(
        argparse.Namespace(
            batch_size=2,
            checkpoint=str(chk),
            overlap=32,
            strip=1,
            tile_size=128,
            workers=2,
            tiles=str(slippy_fixtures / "images"),
            probs=str(tmp_path / "probs"),
            model=str(tmp_path / "model.toml"),
            dataset=str(tmp_path / "dataset.toml"),
            profile=None,
        )
    )

    outs = list((tmp_path / "probs").rglob("*.png"))
    assert len(outs) == 3
    img = Image.open(outs[0])
    assert img.mode == "P"
    assert img.size == (128, 128)


def test_percentile_calibration_scales():
    """int8_calibration = percentile taps |activation| percentiles instead of
    amax; scales come out strictly smaller on outlier-heavy activations and
    the quantized forward still runs site-consistent."""
    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    raw = np.random.default_rng(2).integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)

    amax = np.asarray(jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r)))(folded, raw))
    p999 = np.asarray(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r), percentile=99.9))(folded, raw)
    )
    assert amax.shape == p999.shape == (59,)
    assert np.all(p999 <= amax + 1e-12)
    assert np.mean(p999 < amax) > 0.5  # clipping actually engages

    qtree = q8.quantize_unet_folded(folded)
    scales = tuple(q8.scales_from_amaxes(p999))
    feats = jax.jit(
        lambda qt, r: q8.apply_features_int8(qt, scales, normalize(r), compute_dtype=jnp.float32)
    )(qtree, raw)
    assert np.all(np.isfinite(np.asarray(feats, np.float32)))


def test_grid_calibration_scales():
    """int8_calibration = "mse"/"mae" grid-searches the per-site clip: never
    above amax, exactly grid-optimal (verified against a numpy replica on an
    outlier-heavy synthetic site), and the quantized forward runs
    site-consistent. The objective distinction is the point: under L2 a
    single extreme outlier's squared error dominates, pulling the optimum
    back to ~amax (the trained-model failure mode, docs/PERF.md round 4 —
    amax agreement-IoU 0.14); L1 weights the outlier linearly and clips to
    the bulk's edge."""
    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)
    raw = np.random.default_rng(3).integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)

    amax = np.asarray(jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r)))(folded, raw))
    mae = np.asarray(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r), percentile="mae"))(folded, raw)
    )
    assert mae.shape == amax.shape == (59,)
    assert np.all(mae <= amax + 1e-5)
    assert np.all(mae > 0)

    # Oracle: the in-graph grid argmin must match a numpy replica on a
    # synthetic activation tensor with one huge outlier (the trained-model
    # failure mode amax cannot handle).
    a = np.abs(np.random.default_rng(4).standard_normal(4096).astype(np.float32))
    a[0] = 500.0  # outlier: amax-scale quantizes the bulk to ~0

    def grid_best(vals, sq):
        best_clip, best_err = None, np.inf
        for frac in q8._MSE_GRID:
            clip = float(vals.max()) * float(frac)
            step = max(clip, 1e-12) / 127.0
            resid = np.minimum(np.round(vals / step), 127.0) * step - vals
            err = float(np.mean(resid**2 if sq else np.abs(resid)))
            if err < best_err:
                best_clip, best_err = clip, err
        return best_clip

    for mode, sq in (("mse", True), ("mae", False)):
        sites = q8._Sites(scales=None, percentile=mode)
        sites.next_scale(jnp.asarray(a))
        got = float(sites.taps[0])
        assert got == pytest.approx(grid_best(a, sq), rel=1e-5), mode
    # The L1 optimum clips the outlier to the bulk's edge; the L2 optimum
    # provably cannot (one clipped outlier costs (500-c)^2/n ~ 60 >> the
    # bulk's step-noise win) — this asymmetry is why "mae" exists.
    sites_mae = q8._Sites(scales=None, percentile="mae")
    sites_mae.next_scale(jnp.asarray(a))
    assert float(sites_mae.taps[0]) < 0.05 * a.max()

    qtree = q8.quantize_unet_folded(folded)
    scales = tuple(q8.scales_from_amaxes(mae))
    feats = jax.jit(
        lambda qt, r: q8.apply_features_int8(qt, scales, normalize(r), compute_dtype=jnp.float32)
    )(qtree, raw)
    assert np.all(np.isfinite(np.asarray(feats, np.float32)))
