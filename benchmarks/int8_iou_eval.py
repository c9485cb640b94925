"""int8 accuracy evidence on a TRAINED model: IoU delta vs the fp32 path.

VERDICT r3 weak #7: the int8 path was proven byte-identical to fp32 only on
RANDOM weights; nothing validated the accuracy impact of calibrated-scale
quantization on a trained model (real pretrained weights remain
artifact-gated — tests/test_real_weights.py). This script closes the gap as
far as the environment allows: it trains the flagship U-Net on synthetic
shape tiles until its masks are clean, then compares the shipped hybrid-int8
predict step against the fp32/bf16 folded forward on held-out tiles:

- mask agreement IoU between int8 and fp32 decisions (the deployment
  question: does quantization move any pixels?),
- each path's IoU against ground truth (does any movement matter?),
- same numbers for amax vs percentile calibration.

Run: python benchmarks/int8_iou_eval.py [--train_steps 600] [--size 128]
     [--batch 16] [--eval 96]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distill_eval import synth_tiles  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=600)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval", type=int, default=96)
    ap.add_argument("--percentiles", default="none,mse,mae,99.99,99.9,99.5,99.0,pc,pc99.95,pc99.9,pc99.8")
    ap.add_argument("--family", default="unet", choices=("unet", "fast"),
                    help="model family: the parity flagship or FastNet (both int8 datapaths ship)")
    ap.add_argument("--qat-steps", type=int, default=0,
                    help="quantization-aware finetune steps (STE fake-quant walk, frozen p99.8 "
                         "scales) before a final int8 eval under those exact scales")
    ap.add_argument("--qat-lr", type=float, default=1e-4)
    cli = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import optax

    from robosat_tpu.models import fastnet, unet
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_int8_predict_step, make_predict_step, make_train_step

    model = fastnet if cli.family == "fast" else unet
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    pool_images, pool_masks = synth_tiles(rng, 256, cli.size)
    eval_images, eval_masks = synth_tiles(np.random.default_rng(20_000), cli.eval, cli.size)

    # ---- train the family under eval ------------------------------------
    t0 = time.perf_counter()
    params, state = model.init(0, num_classes=2)
    opt = optax.adam(1e-3)
    step = make_train_step(model, get_loss("CrossEntropy"), opt, compute_dtype=jnp.bfloat16, augment=True)
    p = jax.device_put(params, device)
    s = jax.device_put(state, device)
    o = jax.device_put(opt.init(params), device)
    key = jax.random.PRNGKey(0)
    order = np.random.default_rng(1)
    loss = None
    for i in range(cli.train_steps):
        sel = order.integers(0, len(pool_images), cli.batch)
        p, s, o, loss, _ = step(p, s, o, jax.random.fold_in(key, i), pool_images[sel], pool_masks[sel])
    train_s = time.perf_counter() - t0

    # ---- fp32/bf16 reference masks (the shipped non-int8 predict) -------
    def _fg(q):
        # Exact inverse of the digitize quirk: searchsorted(side='right') maps
        # p == 1.0 (and ONLY p == 1.0; p == 0.0 gives q = 1) to index 256,
        # which the uint8 cast wraps to 0 — so q == 0 means saturated
        # foreground. Confident trained models saturate most fg pixels, so a
        # bare q >= 128 threshold would misread them all as background.
        return (q >= 128) | (q == 0)

    fp_step = make_predict_step(model, overlap=0, compute_dtype=jnp.bfloat16, fused_head=True, fold_bn=True)
    fp_masks = []
    for i in range(0, cli.eval, cli.batch):
        q = np.asarray(fp_step(p, s, eval_images[i : i + cli.batch]))
        fp_masks.append(_fg(q))
    fp = np.concatenate(fp_masks)

    # ---- int8 masks under both calibrations -----------------------------
    def int8_masks(percentile):
        if cli.family == "fast":
            # FastNet's model-owned int8 protocol on fine input/output (the
            # shipped host-blocked path is the same walk with the interleave
            # moved host-side).
            q_step, qtree = make_int8_predict_step(
                model, jax.device_get(p), jax.device_get(s), eval_images[: cli.batch], overlap=0,
                calib_percentile=percentile,
            )
            qtree = jax.device_put(qtree, device)
            return np.concatenate([
                _fg(np.asarray(q_step(qtree, eval_images[i : i + cli.batch])))
                for i in range(0, cli.eval, cli.batch)
            ])
        calib = space_to_depth4(eval_images[: cli.batch])
        q_step, qtree = make_int8_predict_step(
            model, jax.device_get(p), jax.device_get(s), calib, overlap=0, host_s2d=True,
            calib_percentile=percentile,
        )
        qtree = jax.device_put(qtree, device)
        outs = []
        for i in range(0, cli.eval, cli.batch):
            blocked = np.asarray(q_step(qtree, space_to_depth4(eval_images[i : i + cli.batch])))
            # blocked (N, H/2, W/2, 4) parity-major uint8 -> fine (N, H, W)
            n, h, w, four = blocked.shape
            fine = blocked.reshape(n, h, w, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w)
            outs.append(_fg(fine))
        return np.concatenate(outs)

    gt = eval_masks.astype(bool)

    def iou(a, b):
        union = np.logical_or(a, b).sum()
        return float(np.logical_and(a, b).sum() / union) if union else 1.0

    sweep = {}
    masks_by_spec = {}
    for spec in cli.percentiles.split(","):
        if spec == "none":
            pct = None
        elif spec in ("mse", "mae") or spec.startswith("pc"):
            pct = spec
        else:
            pct = float(spec)
        masks = masks_by_spec[spec] = int8_masks(pct)
        sweep[spec] = {
            "agreement_iou": round(iou(masks, fp), 4),
            "gt_iou": round(iou(masks, gt), 4),
            "pixels_changed": int(np.sum(masks != fp)),
        }
    int8_amax = masks_by_spec.get("none")
    if int8_amax is None:
        int8_amax = int8_masks(None)
    int8_pct = masks_by_spec.get("99.9")
    if int8_pct is None:
        int8_pct = int8_masks(99.9)

    # ---- QAT finetune: descend the int8 datapath's own loss -------------
    qat_report = None
    if cli.qat_steps:
        from robosat_tpu.models import int8 as q8
        from robosat_tpu.ops.augment import normalize
        from robosat_tpu.parallel.steps import make_qat_train_step

        t1 = time.perf_counter()
        folded = jax.jit(model.fold)(p, s)
        calib_x = jax.device_put(eval_images[: cli.batch], device)
        if cli.family == "fast":
            amaxes = np.asarray(
                jax.jit(lambda f, r: model.calibration_amaxes_int8(f, normalize(r), percentile=99.8))(
                    folded, calib_x
                )
            )
        else:
            amaxes = np.asarray(
                jax.jit(lambda f, r: q8.calibration_amaxes(f, normalize(r), percentile=99.8))(folded, calib_x)
            )
        scales = list(q8.scales_from_amaxes(amaxes))

        qopt = optax.adam(cli.qat_lr)
        qat_step = make_qat_train_step(model, get_loss("CrossEntropy"), qopt, scales,
                                       compute_dtype=jnp.float32, augment=True)
        # Fresh buffers: make_qat_train_step donates params/opt_state.
        pq = jax.device_put(jax.device_get(p), device)
        sq = jax.device_put(jax.device_get(s), device)
        oq = jax.device_put(qopt.init(jax.device_get(p)), device)
        qkey = jax.random.PRNGKey(7)
        qorder = np.random.default_rng(2)
        qat_loss0 = qat_lossN = None
        for i in range(cli.qat_steps):
            sel = qorder.integers(0, len(pool_images), cli.batch)
            pq, sq, oq, ql, _ = qat_step(pq, sq, oq, jax.random.fold_in(qkey, i), pool_images[sel], pool_masks[sel])
            if i == 0:
                qat_loss0 = float(ql)
        qat_lossN = float(ql)

        # int8 predict with the finetuned weights under the SAME frozen
        # scales the finetune trained against (calib_amaxes passthrough).
        if cli.family == "fast":
            q_step, qtree = make_int8_predict_step(
                model, jax.device_get(pq), jax.device_get(sq), eval_images[: cli.batch], overlap=0,
                calib_amaxes=amaxes,
            )
            qtree = jax.device_put(qtree, device)
            qat_masks = np.concatenate([
                _fg(np.asarray(q_step(qtree, eval_images[i : i + cli.batch])))
                for i in range(0, cli.eval, cli.batch)
            ])
        else:
            calib = space_to_depth4(eval_images[: cli.batch])
            q_step, qtree = make_int8_predict_step(
                model, jax.device_get(pq), jax.device_get(sq), calib, overlap=0, host_s2d=True,
                calib_amaxes=amaxes,
            )
            qtree = jax.device_put(qtree, device)
            outs = []
            for i in range(0, cli.eval, cli.batch):
                blocked = np.asarray(q_step(qtree, space_to_depth4(eval_images[i : i + cli.batch])))
                n, h, w, four = blocked.shape
                fine = blocked.reshape(n, h, w, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w)
                outs.append(_fg(fine))
            qat_masks = np.concatenate(outs)

        # The finetuned model's own float path (did QAT cost float accuracy?).
        qat_fp = np.concatenate([
            _fg(np.asarray(fp_step(pq, sq, eval_images[i : i + cli.batch])))
            for i in range(0, cli.eval, cli.batch)
        ])
        qat_report = {
            "gt_iou": round(iou(qat_masks, gt), 4),
            "agreement_iou_vs_base_fp": round(iou(qat_masks, fp), 4),
            "qat_float_gt_iou": round(iou(qat_fp, gt), 4),
            "qat_steps": cli.qat_steps,
            "qat_lr": cli.qat_lr,
            "loss_first": round(qat_loss0, 4),
            "loss_last": round(qat_lossN, 4),
            "qat_s": round(time.perf_counter() - t1, 1),
        }

    print(
        json.dumps(
            {
                "metric": "int8_trained_model_mask_agreement_iou",
                "value": round(iou(int8_amax, fp), 4),
                "pct_calib_agreement_iou": round(iou(int8_pct, fp), 4),
                "fp_gt_iou": round(iou(fp, gt), 4),
                "int8_amax_gt_iou": round(iou(int8_amax, gt), 4),
                "int8_pct_gt_iou": round(iou(int8_pct, gt), 4),
                "pixels_changed_amax": int(np.sum(int8_amax != fp)),
                "pixels_changed_pct": int(np.sum(int8_pct != fp)),
                "pixels_total": int(fp.size),
                "calibration_sweep": sweep,
                "qat": qat_report,
                "family": cli.family,
                "train_steps": cli.train_steps,
                "final_train_loss": round(float(loss), 4),
                "eval_tiles": cli.eval,
                "size": cli.size,
                "train_s": round(train_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
