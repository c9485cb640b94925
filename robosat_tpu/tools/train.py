"""`rs train` — train the segmentation model on a slippy-map dataset.

Contract parity with robosat/tools/train.py: two-TOML configuration, the same
four losses, class weights required for CrossEntropy/mIoU/Focal, per-epoch
checkpoint-EEEEE-of-TTTTT files with --checkpoint/--resume semantics, the same
log-line and history-plot artifacts.

TPU-native internals: the whole inner loop (augmentation, normalization,
forward, loss, backward, Adam update, confusion counts) is ONE compiled
program; the batch axis shards over the device mesh (data parallelism — the
gradient mean becomes a psum over ICI), params/optimizer state replicate, and
batch-norm statistics are computed over the global batch (sync-BN).
"""

import argparse
import collections
import os
import sys

from tqdm import tqdm

from robosat_tpu.checkpoint import (
    leaves_to_opt_state,
    load_checkpoint,
    load_model_checkpoint,
    opt_state_to_leaves,
    save_checkpoint,
)
from robosat_tpu.config import load_config
from robosat_tpu.data.datasets import SlippyMapTilesConcatenation
from robosat_tpu.data.loader import batches
from robosat_tpu.device import configure_accelerator
from robosat_tpu.log import Log
from robosat_tpu.ops.metrics import Metrics
from robosat_tpu.utils import plot


def _explain_backend_failure(exc, batch_size, model_config):
    """Turn known TPU-backend infrastructure failures into actionable errors.

    Two failure classes have been observed on tunneled TPU backends (neither
    is a graph bug — the identical program compiles and runs when retried or
    shrunk):

    - the remote compile service 500s on very large programs (seen at
      batch 64, 512px with remat; `tpu_compile_helper subprocess exit 1`);
    - the backend transiently poisons after a compiler crash, failing every
      call (even device_put) with bare `INVALID_ARGUMENT: TPU backend
      error` for a few minutes before recovering.
    """
    msg = str(exc)
    if "remote_compile" in msg or "tpu_compile_helper" in msg:
        sys.exit(
            "Error: the TPU backend's remote compile service rejected the training program "
            "(batch_size={}, image_size={}, remat={}). This is a backend-infrastructure failure, "
            "not a model error: retry, lower [common] batch_size, or set remat = true in the "
            "model config to shrink the program.\nBackend said: {}".format(
                batch_size, model_config["common"]["image_size"],
                model_config["common"].get("remat", False), msg.splitlines()[0][:200],
            )
        )
    if "TPU backend error" in msg and "INVALID_ARGUMENT" in msg:
        sys.exit(
            "Error: the TPU backend is transiently failing all calls (this has been observed "
            "for a few minutes after a backend compiler crash). Wait and retry; if it persists, "
            "restart the TPU runtime.\nBackend said: {}".format(msg.splitlines()[0][:200])
        )


def add_parser(subparser):
    parser = subparser.add_parser(
        "train", help="fits the segmentation model to a dataset", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("--model", type=str, required=True, help="path to model configuration file")
    parser.add_argument("--dataset", type=str, required=True, help="path to dataset configuration file")
    parser.add_argument("--checkpoint", type=str, required=False, help="warm-start weights from this checkpoint")
    parser.add_argument("--resume", type=bool, default=False, help="also restore optimizer state and epoch counter")
    parser.add_argument("--workers", type=int, default=0, help="decode worker threads")
    parser.add_argument("--profile", type=str, default=None, help="write a TensorBoard device trace to this directory")
    parser.add_argument(
        "--teacher",
        type=str,
        default=None,
        help="distill from this trained checkpoint (e.g. a flagship U-Net) instead of training from labels alone",
    )
    parser.add_argument(
        "--teacher_model",
        type=str,
        default=None,
        help="model TOML of the teacher checkpoint (defaults to --model, i.e. same family)",
    )
    parser.add_argument("--distill_alpha", type=float, default=0.9, help="soft-target weight in the distillation loss")
    parser.add_argument("--distill_temp", type=float, default=2.0, help="distillation softmax temperature")
    parser.add_argument(
        "--qat",
        action="store_true",
        help="quantization-aware finetune of --checkpoint: the forward fake-quantizes every int8 "
        "site (frozen calibrated scales, straight-through gradients) so the optimizer descends "
        "the int8 datapath's own loss; the scales ship in checkpoint meta for `rs predict`",
    )

    parser.set_defaults(func=main)


def main(args):
    model_config = load_config(args.model)
    dataset_config = load_config(args.dataset)

    devices = configure_accelerator(model_config["common"]["cuda"])

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from robosat_tpu.models import get_model
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.mesh import create_mesh, replicate
    from robosat_tpu.parallel.steps import make_eval_step, make_train_step

    num_classes = len(dataset_config["common"]["classes"])
    os.makedirs(model_config["common"]["checkpoint"], exist_ok=True)

    loss_name = model_config["opt"]["loss"]
    weight = None
    try:
        weight = np.asarray(dataset_config["weights"]["values"], np.float32)
    except KeyError:
        if loss_name in ("CrossEntropy", "mIoU", "Focal"):
            sys.exit("Error: The loss function used, need dataset weights values")

    try:
        loss_fn = get_loss(loss_name)
    except ValueError:
        sys.exit("Error: Unknown [opt][loss] value !")

    model = get_model(model_config["common"].get("model", "unet"))
    params, state = model.init(model_config["common"].get("seed", 0), num_classes)

    optimizer = optax.adam(model_config["opt"]["lr"])

    resume_epoch = 0
    opt_state = optimizer.init(params)
    if args.checkpoint:
        params, state, meta = load_model_checkpoint(args.checkpoint, num_classes)
        if args.resume:
            trees, meta = load_checkpoint(args.checkpoint)
            if "opt_state" in trees:
                opt_state = leaves_to_opt_state(optimizer.init(params), trees["opt_state"])
            resume_epoch = int(meta.get("epoch", 0))
        else:
            opt_state = optimizer.init(params)

    num_epochs = model_config["opt"]["epochs"]
    if resume_epoch >= num_epochs:
        sys.exit("Error: Epoch {} set in {} already reached by the checkpoint provided".format(num_epochs, args.model))

    mesh = create_mesh(devices)
    batch_size = -(-model_config["common"]["batch_size"] // len(devices)) * len(devices)
    image_size = model_config["common"]["image_size"]

    compute_dtype = jnp.bfloat16 if model_config["common"].get("bf16", False) else jnp.float32
    teacher_folded = None
    # getattr: tests drive main() with bare Namespaces predating these flags.
    teacher_path = getattr(args, "teacher", None)
    distill_alpha = getattr(args, "distill_alpha", 0.9)
    distill_temp = getattr(args, "distill_temp", 2.0)
    qat_mode = getattr(args, "qat", False)
    if qat_mode:
        if not args.checkpoint:
            sys.exit("Error: --qat finetunes a trained model; provide --checkpoint")
        if teacher_path:
            sys.exit("Error: --qat and --teacher are mutually exclusive")
        if not hasattr(model, "apply_logits_fake_quant"):
            sys.exit(
                "Error: --qat needs a family with a fake-quant forward "
                "(apply_logits_fake_quant): unet or fast"
            )
        train_step = None  # built below — calibration needs one real training batch
    elif teacher_path:
        # Knowledge distillation (--teacher): the teacher checkpoint loads
        # from its own model TOML's family, folds its BNs once, and runs
        # frozen inside the compiled train step
        # (robosat_tpu.parallel.steps.make_distill_train_step).
        from robosat_tpu.parallel.steps import make_distill_train_step

        teacher_model_path = getattr(args, "teacher_model", None)
        teacher_config = load_config(teacher_model_path) if teacher_model_path else model_config
        teacher_model = get_model(teacher_config["common"].get("model", "unet"))
        t_params, t_state, _ = load_model_checkpoint(teacher_path, num_classes)
        teacher_folded = jax.jit(teacher_model.fold)(t_params, t_state)
        train_step = make_distill_train_step(
            model,
            teacher_model,
            loss_fn,
            optimizer,
            weight=weight,
            mesh=mesh,
            compute_dtype=compute_dtype,
            remat=model_config["common"].get("remat", False),
            alpha=distill_alpha,
            temp=distill_temp,
        )
    else:
        train_step = make_train_step(
            model,
            loss_fn,
            optimizer,
            weight=weight,
            mesh=mesh,
            compute_dtype=compute_dtype,
            remat=model_config["common"].get("remat", False),
            # sync_bn = false in the model TOML selects the reference's
            # per-replica DataParallel BN semantics (one trailing collective
            # round instead of per-BN all-reduces; robosat/tools/train.py:69).
            sync_bn=model_config["common"].get("sync_bn", True),
        )
    eval_step = make_eval_step(model, loss_fn, weight=weight, mesh=mesh, compute_dtype=compute_dtype)

    params = replicate(mesh, params)
    state = replicate(mesh, state)
    opt_state = replicate(mesh, opt_state)
    if teacher_folded is not None:
        teacher_folded = replicate(mesh, teacher_folded)

    path = dataset_config["common"]["dataset"]
    train_dataset = SlippyMapTilesConcatenation(
        [os.path.join(path, "training", "images")], os.path.join(path, "training", "labels"), size=image_size
    )
    val_dataset = SlippyMapTilesConcatenation(
        [os.path.join(path, "validation", "images")], os.path.join(path, "validation", "labels"), size=image_size
    )
    assert len(train_dataset) > 0, "at least one tile in training dataset"
    assert len(val_dataset) > 0, "at least one tile in validation dataset"

    history = collections.defaultdict(list)
    log = Log(os.path.join(model_config["common"]["checkpoint"], "log"))

    log.log("--- Hyper Parameters on Dataset: {} ---".format(dataset_config["common"]["dataset"]))
    log.log("Batch Size:\t {}".format(model_config["common"]["batch_size"]))
    log.log("Image Size:\t {}".format(image_size))
    log.log("Learning Rate:\t {}".format(model_config["opt"]["lr"]))
    log.log("Loss function:\t {}".format(loss_name))
    if teacher_path:
        log.log("Distilling from: {} (alpha {}, T {})".format(teacher_path, distill_alpha, distill_temp))
    if weight is not None:
        log.log("Weights :\t {}".format(dataset_config["weights"]["values"]))
    log.log("---")

    qat_meta = {}
    if qat_mode:
        # Calibrate per-site scales ONCE on one real training batch (the
        # config's int8_calibration spec, per-tensor modes only — the QAT
        # walk fake-quantizes with scalar site scales), freeze them into the
        # compiled step, and record them in checkpoint meta: `rs predict`
        # must quantize with EXACTLY these scales, not a fresh calibration
        # of the moved weights (parallel/steps.make_qat_train_step).
        from robosat_tpu.models import int8 as q8
        from robosat_tpu.ops.augment import normalize
        from robosat_tpu.parallel.steps import make_qat_train_step

        calib_spec = model_config["common"].get("int8_calibration", 99.8)
        if q8.is_per_channel(calib_spec):
            sys.exit("Error: --qat uses per-tensor site scales; set int8_calibration to a percentile/mse/mae/amax")
        if calib_spec in ("amax", None):
            pct = None
        elif calib_spec in ("mse", "mae"):
            pct = calib_spec
        else:
            pct = float(calib_spec)

        calib_images = None
        for batch in batches(train_dataset, batch_size, shuffle=True, drop_last=True, workers=2, seed=0):
            calib_images = batch.arrays[0]
            break
        folded = jax.jit(model.fold)(params, state)
        calib_fn = getattr(model, "calibration_amaxes_int8", None) or q8.calibration_amaxes
        amaxes = np.asarray(
            jax.jit(lambda f, r: calib_fn(f, normalize(r), percentile=pct))(folded, calib_images)
        )
        qat_meta = {"qat_amaxes": [float(a) for a in amaxes], "qat_calibration": str(calib_spec)}
        train_step = make_qat_train_step(
            model,
            loss_fn,
            optimizer,
            list(q8.scales_from_amaxes(amaxes)),
            weight=weight,
            mesh=mesh,
            compute_dtype=compute_dtype,
        )
        log.log("QAT finetune: {} int8 sites, int8_calibration = {} (frozen)".format(len(amaxes), calib_spec))

    base_rng = jax.random.PRNGKey(model_config["common"].get("seed", 0))

    if args.profile:
        jax.profiler.start_trace(args.profile)

    for epoch in range(resume_epoch, num_epochs):
        log.log("Epoch: {}/{}".format(epoch + 1, num_epochs))

        # Train pass.
        metrics = Metrics(range(num_classes))
        running_loss, num_samples, step_idx = 0.0, 0, 0
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        num_train_batches = len(train_dataset) // batch_size
        # One-step-deep value pipeline: step k's (loss, counts) are fetched
        # while step k+1 runs on the device. The reference fetches loss.item()
        # synchronously every iteration (robosat/tools/train.py:184-194);
        # with async JAX dispatch that round trip would serialize the loop —
        # on a remote/tunneled accelerator it can dominate the step itself.
        pending = None  # (loss_dev, counts_dev, valid)

        def drain(p):
            nonlocal running_loss, num_samples
            loss_dev, counts_dev, valid = p
            running_loss += float(loss_dev)
            metrics.add_counts(np.asarray(counts_dev))
            num_samples += valid

        for batch in tqdm(
            batches(train_dataset, batch_size, shuffle=True, drop_last=True, workers=max(args.workers, 2), seed=epoch),
            total=num_train_batches,
            desc="Train",
            unit="batch",
            ascii=True,
        ):
            images, masks = batch.arrays
            rng = jax.random.fold_in(epoch_rng, step_idx)
            # JAX dispatch is async: runtime failures surface at the value
            # fetches (float(loss) / np.asarray(counts)), not at the step
            # call — the fence must cover both or the 'transiently poisoned
            # backend' class leaks raw tracebacks past it.
            try:
                with jax.profiler.StepTraceAnnotation("train_step", step_num=step_idx):
                    if teacher_folded is not None:
                        params, state, opt_state, loss, counts = train_step(
                            params, state, opt_state, teacher_folded, rng, images, masks
                        )
                    else:
                        params, state, opt_state, loss, counts = train_step(
                            params, state, opt_state, rng, images, masks
                        )
                if pending is not None:
                    drain(pending)
            except Exception as exc:  # noqa: BLE001 — fence infra failures with guidance
                _explain_backend_failure(exc, batch_size, model_config)
                raise
            pending = (loss, counts, batch.valid)
            step_idx += 1
        if pending is not None:
            try:
                drain(pending)
            except Exception as exc:  # noqa: BLE001
                _explain_backend_failure(exc, batch_size, model_config)
                raise

        train_hist = {
            "loss": running_loss / max(num_samples, 1),
            "miou": metrics.get_miou(),
            "fg_iou": metrics.get_fg_iou(),
            "mcc": metrics.get_mcc(),
        }
        log.log(
            "Train    loss: {:.4f}, mIoU: {:.3f}, {} IoU: {:.3f}, MCC: {:.3f}".format(
                train_hist["loss"],
                train_hist["miou"],
                dataset_config["common"]["classes"][1],
                train_hist["fg_iou"],
                train_hist["mcc"],
            )
        )
        for k, v in train_hist.items():
            history["train " + k].append(v)

        # Validation pass.
        metrics = Metrics(range(num_classes))
        running_loss, num_samples = 0.0, 0
        pending = None  # same one-step value pipeline as the train pass
        for batch in tqdm(
            batches(val_dataset, batch_size, drop_last=True, workers=max(args.workers, 2)),
            total=len(val_dataset) // batch_size,
            desc="Validate",
            unit="batch",
            ascii=True,
        ):
            images, masks = batch.arrays
            loss, counts = eval_step(params, state, images, masks)
            if pending is not None:
                drain(pending)
            pending = (loss, counts, batch.valid)
        if pending is not None:
            drain(pending)

        val_hist = {
            "loss": running_loss / max(num_samples, 1),
            "miou": metrics.get_miou(),
            "fg_iou": metrics.get_fg_iou(),
            "mcc": metrics.get_mcc(),
        }
        log.log(
            "Validate loss: {:.4f}, mIoU: {:.3f}, {} IoU: {:.3f}, MCC: {:.3f}".format(
                val_hist["loss"], val_hist["miou"], dataset_config["common"]["classes"][1], val_hist["fg_iou"], val_hist["mcc"]
            )
        )
        for k, v in val_hist.items():
            history["val " + k].append(v)

        visual = "history-{:05d}-of-{:05d}.png".format(epoch + 1, num_epochs)
        plot(os.path.join(model_config["common"]["checkpoint"], visual), history)

        checkpoint_name = "checkpoint-{:05d}-of-{:05d}.npz".format(epoch + 1, num_epochs)
        save_checkpoint(
            os.path.join(model_config["common"]["checkpoint"], checkpoint_name),
            {
                "params": jax.device_get(params),
                "state": jax.device_get(state),
                "opt_state": opt_state_to_leaves(jax.device_get(opt_state)),
            },
            meta=dict({"epoch": epoch + 1}, **qat_meta),
        )

    if args.profile:
        jax.profiler.stop_trace()
