"""Jitted train/eval/predict steps over a device mesh.

The hot loops of the reference (robosat/tools/train.py:171-194, 204-238;
predict.py:81-113) become three compiled programs:

- predict: normalize -> forward -> softmax -> quantize -> overlap crop, all
  fused on device; only uint8 palette indices cross back to the host.
- train: on-device augmentation -> forward -> loss -> grads -> optax update,
  plus in-graph confusion counts; with the batch axis sharded over the mesh
  the gradient mean compiles to a psum over ICI (sync data parallelism).
- eval: forward -> loss + confusion counts under frozen BN statistics.

All steps take raw uint8 batches; normalization/augmentation trace into the
graph so the host pipeline stays decode-only.
"""

import functools

import jax
import jax.numpy as jnp
import optax

from robosat_tpu.ops.augment import augment_batch, normalize
from robosat_tpu.ops.metrics import confusion_counts
from robosat_tpu.ops.quantize import softmax_quantize
from robosat_tpu.parallel.mesh import batch_sharding, replicated


def _normalize_s2d4(raw48):
    """Normalize 4x4 space-to-depth uint8 input (channel c is fine channel
    c % 3; robosat_tpu.models.layers.space_to_depth4 layout)."""
    from robosat_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD

    return normalize(raw48, mean=IMAGENET_MEAN * 16, std=IMAGENET_STD * 16)


def make_predict_step(
    model, mesh=None, overlap=0, compute_dtype=jnp.float32, fused_head=False, fold_bn=True, s2d=True, host_s2d=False
):
    """Compiled prediction: raw uint8 NHWC -> quantized fg uint8 N(H-2o)(W-2o).

    Inference optimizations (all preserve numerics to fp rounding):
    - `fold_bn` (models exposing `fold`/`apply_folded`): every batch norm is
      folded into its conv once on the host, removing ~53 elementwise passes
      from the bandwidth-bound eval graph.
    - `fused_head` (models exposing `apply_features`): the final 1x1 conv +
      softmax + digitize + crop collapse to one sigmoid-of-margin pass
      (robosat_tpu.ops.head).
    - `s2d` (models exposing `apply_features_folded_s2d`, with fold + fused
      head on): the decoder tail runs at half resolution with parity-blocked
      128-lane channels instead of lane-padded 32-channel buffers
      (robosat_tpu.models.layers space-to-depth rewrites).

    The returned step takes (params, state, raw) regardless — folding happens
    inside against the passed params so checkpoint reloads keep working.

    With `host_s2d` (requires the s2d path) the step instead takes 4x4
    space-to-depth uint8 input (N, H/4, W/4, 48) pre-blocked on the HOST
    (robosat_tpu.models.layers.space_to_depth4 in the loader workers): the
    stem runs as one MXU-wide blocked conv and no device-side uint8
    transpose is needed.
    """
    use_fused = fused_head and (hasattr(model, "apply_features") or hasattr(model, "predict_quantized_folded"))
    use_fold = fold_bn and hasattr(model, "fold")
    use_s2d = s2d and use_fused and use_fold and hasattr(model, "apply_features_folded_s2d")
    use_host_s2d = host_s2d and use_s2d and hasattr(model, "apply_features_folded_s2d_from48")
    # Host-blocked mode also returns the output parity-blocked: the host
    # writer pool interleaves 2 MB of uint8 for free where the device u8
    # depth-to-space transposes cost ~0.6 ms/batch.
    blocked_out = use_host_s2d and overlap % 2 == 0

    def step(params, state, raw):
        if use_host_s2d:
            x = _normalize_s2d4(raw).astype(compute_dtype)
        else:
            x = normalize(raw).astype(compute_dtype)
        if use_fold:
            folded = model.fold(params, state)
            if use_s2d:
                from robosat_tpu.ops.head import fused_prediction_head_s2d, fused_prediction_head_s2d_blocked

                if use_host_s2d:
                    features = model.apply_features_folded_s2d_from48(folded, x)
                else:
                    features = model.apply_features_folded_s2d(folded, x)
                if blocked_out:
                    return fused_prediction_head_s2d_blocked(
                        features, folded["final"]["w"], folded["final"]["b"], overlap=overlap
                    )
                return fused_prediction_head_s2d(
                    features, folded["final"]["w"], folded["final"]["b"], overlap=overlap
                )
            if use_fused and hasattr(model, "predict_quantized_folded"):
                # Model-specific fused head (e.g. DeepLab's margin-then-resize).
                return model.predict_quantized_folded(folded, x, overlap=overlap)
            if use_fused:
                from robosat_tpu.ops.head import fused_prediction_head

                features = model.apply_features_folded(folded, x)
                return fused_prediction_head(features, folded["final"]["w"], folded["final"]["b"], overlap=overlap)
            logits = model.apply_folded(folded, x)
        elif use_fused and hasattr(model, "apply_features"):
            # Models exposing only predict_quantized_folded (e.g. DeepLab)
            # pass the use_fused gate but have no unfolded feature path;
            # they fall through to the generic apply below.
            from robosat_tpu.ops.head import fused_prediction_head

            features, _ = model.apply_features(params, state, x, train=False)
            return fused_prediction_head(features, params["final"]["w"], params["final"]["b"], overlap=overlap)
        else:
            logits, _ = model.apply(params, state, x, train=False)
        quantized = softmax_quantize(logits)
        if overlap:
            quantized = quantized[:, overlap:-overlap, overlap:-overlap]
        return quantized

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), replicated(mesh), batch_sharding(mesh, 4)),
        out_shardings=batch_sharding(mesh, 4 if blocked_out else 3),
    )


def make_int8_predict_step(
    model,
    params,
    state,
    calib_raw,
    mesh=None,
    overlap=0,
    fused_head=True,
    host_s2d=False,
    calib_percentile=None,
    pallas_tail=None,
    pallas_enc=False,
    calib_amaxes=None,
):
    """Compiled hybrid-int8 prediction (robosat_tpu.models.int8 for the
    U-Net: int8 bottleneck stacks, bf16 stem + s2d decoder; models exposing
    the predict_quantized_int8 protocol — DeepLab — own their walk).

    Folds BN, calibrates per-conv-site activation scales on `calib_raw` (one
    real uint8 batch), quantizes weights per-channel, and returns
    (step, qtree): step(qtree, raw) -> quantized fg uint8. The scales bake
    into the program as constants so every quantize step is a fused epilogue.
    With `host_s2d`, `calib_raw` and every step batch are 4x4 space-to-depth
    host-blocked uint8 (N, H/4, W/4, 48).

    `calib_amaxes` (host per-site amax vector) SKIPS calibration and uses
    those exact scales — the QAT contract: a quantization-aware finetune
    bakes its frozen training scales (make_qat_train_step), and predict must
    consume the same vector, not a fresh calibration of the moved weights.
    """
    import numpy as np

    from robosat_tpu.models import int8 as q8

    norm = _normalize_s2d4 if host_s2d else normalize
    folded = jax.jit(model.fold)(params, state)

    per_channel = q8.is_per_channel(calib_percentile)
    if per_channel and calib_amaxes is not None:
        raise ValueError(
            "calib_amaxes carries a per-tensor QAT vector; per-channel ('pc...') calibration "
            "would misread it — set int8_calibration to a percentile for QAT checkpoints"
        )
    if per_channel and (pallas_tail or pallas_enc):
        # The Pallas kernels bake SCALAR per-site scales; per-channel
        # calibration folds vectors into the weights instead.
        raise ValueError("per-channel calibration ('pc...') is XLA-walk only: disable pallas_tail/pallas_enc")

    def _host_amaxes(raw_amaxes):
        return [np.asarray(a) for a in raw_amaxes] if per_channel else np.asarray(raw_amaxes)

    if hasattr(model, "predict_quantized_int8"):
        # Model-owned hybrid-int8 protocol (DeepLab: models/deeplab.py) —
        # the model calibrates, quantizes, and fuses its own head.
        if per_channel:
            import inspect

            if "act_amaxes" not in inspect.signature(model.quantize_folded_int8).parameters:
                raise ValueError(
                    "{} does not support per-channel ('pc...') calibration; "
                    "use a percentile".format(getattr(model, "__name__", model))
                )
        amaxes = calib_amaxes if calib_amaxes is not None else _host_amaxes(
            jax.jit(
                lambda f, r: model.calibration_amaxes_int8(
                    f, norm(r), blocked=host_s2d, percentile=calib_percentile
                )
            )(folded, calib_raw)
        )
        if per_channel:
            # The quantizer plans the balanced fold per site (it needs the
            # weights — int8.ScaleCursor) and returns the exact per-channel
            # vectors the walk must quantize activations with.
            qtree, scale_list = jax.jit(
                functools.partial(model.quantize_folded_int8, act_amaxes=amaxes)
            )(folded)
            scales = [np.asarray(s, np.float32) for s in scale_list]
        else:
            scales = tuple(q8.scales_from_amaxes(amaxes))
            qtree = jax.jit(model.quantize_folded_int8)(folded)

        def step_m(qtree, raw):
            x = norm(raw).astype(jnp.bfloat16)
            return model.predict_quantized_int8(qtree, scales, x, overlap=overlap, blocked=host_s2d)

        # Families with a sub-pixel head (fastnet) return blocked uint8
        # (N, h, w, block^2) when fed host-blocked input and the overlap
        # crops on their coarse grid; the host writer interleaves.
        blocked_out_m = (
            host_s2d
            and getattr(model, "INT8_BLOCKED_OUT", False)
            and overlap % getattr(model, "BLOCK", 4) == 0
        )
        if mesh is None:
            return jax.jit(step_m), qtree
        return (
            jax.jit(
                step_m,
                in_shardings=(replicated(mesh), batch_sharding(mesh, 4)),
                out_shardings=batch_sharding(mesh, 4 if blocked_out_m else 3),
            ),
            qtree,
        )

    amaxes = calib_amaxes if calib_amaxes is not None else _host_amaxes(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, norm(r), blocked=host_s2d, percentile=calib_percentile))(
            folded, calib_raw
        )
    )
    if per_channel:
        qtree, scale_list = jax.jit(functools.partial(q8.quantize_unet_folded, act_amaxes=amaxes))(folded)
        scales = [np.asarray(s, np.float32) for s in scale_list]
    else:
        scales = tuple(q8.scales_from_amaxes(amaxes))
        qtree = jax.jit(q8.quantize_unet_folded)(folded)

    blocked_out = host_s2d and fused_head and overlap % 2 == 0
    if pallas_tail and not blocked_out:
        raise ValueError("pallas_tail requires host_s2d + fused_head with an even overlap")
    if pallas_tail == "sep" and overlap % 4:
        raise ValueError("pallas_tail='sep' crops on the coarse-coarse grid: overlap must be a multiple of 4")

    def step(qtree, raw):
        x = norm(raw).astype(jnp.bfloat16)
        if pallas_tail == "sep":
            # Fully parity-SEPARATED Pallas tail: dec3 runs as the
            # separated-output transposed-conv kernel (the form that beats
            # XLA — docs/PERF.md round 3), dec4 + dec5 consume and emit
            # parity planes (qtail.fused_tail_features_sep), and the head
            # reduces the doubly-blocked layout; the ~0.9 ms in-VMEM parity
            # interleave never happens. The host writer interleaves the
            # 16-channel uint8 with two depth_to_space2 passes.
            from robosat_tpu.models import qdec, qtail
            from robosat_tpu.ops.head import fused_prediction_head_s2d_blocked_sep

            cat3, s3, s4, s5 = q8.apply_features_int8_to_dec3_input(
                qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=host_s2d, pallas_layer1=pallas_enc
            )
            dec3_sep = qdec.parity_up_conv_separated(cat3, qtree["dec3"], s3)
            feats = qtail.fused_tail_features_sep(dec3_sep, qtree["dec4"], s4, qtree["dec5"], s5)
            return fused_prediction_head_s2d_blocked_sep(
                feats, qtree["final"]["w"], qtree["final"]["b"], overlap=overlap
            )
        if pallas_tail:
            # Fused Pallas tail (models/qtail.py): dec4 + dec5 (and with
            # "full", the head too) VMEM-resident per strip instead of the
            # XLA chain's three full HBM passes. Opt-in: the dec4+dec5
            # kernel is proven on-chip; "full" awaits the Mosaic head-stage
            # fix (docs/PERF.md round 3).
            from robosat_tpu.models import qtail

            dec3, s4, s5 = q8.apply_features_int8_to_dec3(
                qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=host_s2d, pallas_layer1=pallas_enc
            )
            strip = max([s for s in (8, 9, 6, 4, 3, 2) if dec3.shape[1] % s == 0] or [dec3.shape[1]])
            if pallas_tail == "full":
                return qtail.fused_tail(
                    dec3,
                    qtree["dec4"],
                    s4,
                    qtree["dec5"],
                    s5,
                    qtree["final"]["w"],
                    qtree["final"]["b"],
                    overlap=overlap,
                    strip_rows=strip,
                )
            features = qtail.fused_tail_features(dec3, qtree["dec4"], s4, qtree["dec5"], s5, strip_rows=strip)
        else:
            features = q8.apply_features_int8(
                qtree, scales, x, compute_dtype=jnp.bfloat16, blocked=host_s2d, pallas_layer1=pallas_enc
            )
        if fused_head:
            from robosat_tpu.ops.head import fused_prediction_head_s2d, fused_prediction_head_s2d_blocked

            if blocked_out:
                return fused_prediction_head_s2d_blocked(
                    features, qtree["final"]["w"], qtree["final"]["b"], overlap=overlap
                )
            return fused_prediction_head_s2d(features, qtree["final"]["w"], qtree["final"]["b"], overlap=overlap)
        from robosat_tpu.models.layers import conv_apply, depth_to_space2

        fine = depth_to_space2(features)
        logits = conv_apply({"w": qtree["final"]["w"]}, fine, stride=1) + qtree["final"]["b"].astype(fine.dtype)
        quantized = softmax_quantize(logits)
        if overlap:
            quantized = quantized[:, overlap:-overlap, overlap:-overlap]
        return quantized

    if mesh is None:
        return jax.jit(step), qtree
    jitted = jax.jit(
        step,
        in_shardings=(replicated(mesh), batch_sharding(mesh, 4)),
        out_shardings=batch_sharding(mesh, 4 if blocked_out else 3),
    )
    return jitted, qtree


def make_spatial_predict_step(model, mesh, overlap=0, compute_dtype=jnp.float32):
    """Whole-AOI prediction with the image HEIGHT sharded over the mesh.

    The reference (and our per-tile path) handles tile seams by host-side
    overlap stitching (robosat/datasets.py:83-136). On a mesh there is a
    TPU-native alternative (SURVEY.md section 5 "long-context analog"):
    feed one big buffered raster and shard its H axis; under jit the GSPMD
    partitioner inserts the halo exchanges every convolution needs at shard
    boundaries — collectives over ICI replace redundant host stitching, and
    no shard ever sees a seam. Numerically identical to the unsharded
    forward.

    step(params, state, raw u8 (N, H, W, 3)) -> quantized fg uint8
    (N, H-2*overlap, W-2*overlap); H must be divisible by 64 and by the
    mesh size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robosat_tpu.parallel.mesh import DATA_AXIS

    def step(params, state, raw):
        x = normalize(raw).astype(compute_dtype)
        folded = model.fold(params, state)
        from robosat_tpu.ops.head import fused_prediction_head_s2d

        features = model.apply_features_folded_s2d(folded, x)
        return fused_prediction_head_s2d(features, folded["final"]["w"], folded["final"]["b"], overlap=overlap)

    rep = replicated(mesh)
    height_sharded = NamedSharding(mesh, P(None, DATA_AXIS, None, None))
    out_sharded = NamedSharding(mesh, P(None, DATA_AXIS, None))
    return jax.jit(
        step,
        in_shardings=(rep, rep, height_sharded),
        out_shardings=out_sharded,
    )


def make_segment_step(model, mesh=None, compute_dtype=jnp.float32):
    """Compiled hard-mask prediction for serving: raw uint8 -> argmax class uint8.

    Uses the BN-folded forward when the model provides one (serving latency:
    the train-mode BN affines and full softmax are dead weight at argmax
    time); for binary models argmax(l0, l1) == (l1 - l0 > 0) == the fused
    margin head's probability >= 0.5, so folded and generic paths agree.
    """
    use_fold = hasattr(model, "fold") and hasattr(model, "apply_folded")

    def step(params, state, raw):
        x = normalize(raw).astype(compute_dtype)
        if use_fold:
            logits = model.apply_folded(model.fold(params, state), x)
        else:
            logits, _ = model.apply(params, state, x, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), replicated(mesh), batch_sharding(mesh, 4)),
        out_shardings=batch_sharding(mesh, 3),
    )


def make_train_step(
    model, loss_fn, optimizer, weight=None, mesh=None, compute_dtype=jnp.float32, augment=True, remat=False,
    sync_bn=True, s2d_tail=True,
):
    """Compiled training step.

    Returns step(params, state, opt_state, rng, images_u8, masks) ->
    (params, state, opt_state, loss, counts).

    `s2d_tail` (models exposing `apply_s2d`) runs the training forward with
    the space-to-depth decoder tail — the same ops at half resolution with
    128-lane channels instead of lane-padded 32-channel fine buffers,
    identical math up to fp summation order (models/unet.apply_s2d). The
    fine-tail passes were the largest non-loss block of the round-4 train
    profile.

    `remat` rematerializes the forward during the backward pass
    (jax.checkpoint), trading ~33% more FLOPs for not keeping every decoder
    activation live in HBM — this is what makes batch-64 512px training fit
    a single chip's 16 GB.

    `sync_bn` (mesh mode) picks the batch-norm parallel semantics:

    - True: global-batch statistics. The whole step runs under pjit with the
      batch axis sharded; every BN mean/var compiles to an all-reduce over
      the mesh (~2 collectives per BN layer, interleaved with compute).
    - False: per-replica statistics — the reference's nn.DataParallel
      behavior (robosat/tools/train.py:69; torch replicates the module and
      each replica normalizes its own shard). Implemented with shard_map:
      each device runs the full forward/backward on its local shard, then
      ONE trailing round of collectives averages gradients, losses, counts,
      and the BN running stats (torch keeps replica 0's stats; averaging is
      equivalent in expectation and keeps replicas bit-identical). Total
      collectives per step drop from ~110 to ~4 — this is also the path
      that stays latency-tolerant on multi-host DCN meshes.
    """
    forward = model.apply_s2d if (s2d_tail and hasattr(model, "apply_s2d")) else model.apply
    if remat:
        forward = jax.checkpoint(forward, static_argnums=(3,))

    def loss_and_aux(params, state, x, masks):
        logits, new_state = forward(params, state, x, True)
        loss = loss_fn(logits.astype(jnp.float32), masks, weight)
        return loss, (new_state, logits)

    def step(params, state, opt_state, rng, images, masks):
        if augment:
            images, masks = augment_batch(rng, images, masks)
        x = normalize(images).astype(compute_dtype)

        (loss, (new_state, logits)), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(
            params, state, x, masks
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        counts = confusion_counts(logits, masks)
        return new_params, new_state, new_opt_state, loss, counts

    # Donating params/state/opt_state lets XLA update them in place instead of
    # allocating fresh buffers every step (~3x the model size in HBM churn).
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    rep = replicated(mesh)

    if not sync_bn:
        from jax.sharding import PartitionSpec as P

        from robosat_tpu.parallel.mesh import DATA_AXIS

        def local_step(params, state, opt_state, rng, images, masks):
            # Per-device: distinct augmentation stream per shard.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            if augment:
                images, masks = augment_batch(rng, images, masks)
            x = normalize(images).astype(compute_dtype)

            (loss, (new_state, logits)), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(
                params, state, x, masks
            )
            # One trailing collective round; everything before is shard-local.
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            counts = jax.lax.psum(confusion_counts(logits, masks), DATA_AXIS)
            new_state = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, DATA_AXIS), new_state)

            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, loss, counts

        batch_spec = P(DATA_AXIS)
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), batch_spec, batch_spec),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1, 2))

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, batch_sharding(mesh, 4), batch_sharding(mesh, 3)),
        out_shardings=(rep, rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    )


def make_qat_train_step(
    model, loss_fn, optimizer, scales, weight=None, mesh=None, compute_dtype=jnp.float32, augment=True,
):
    """Compiled quantization-aware finetune step (`rs train --qat`).

    Forward = model.apply_logits_fake_quant: in-graph BN fold frozen at the
    checkpoint's running stats, then the int8 walk with every quantized site
    quantize-dequantizing its input (static per-site `scales` — the SAME
    frozen vector the later int8 predict must use) and its rewritten kernel
    (live per-output-channel grids) via the straight-through estimator.
    The optimizer therefore descends the loss of the network the int8
    datapath will actually run, recovering the accumulated per-tensor
    rounding loss that calibration alone cannot (docs/PERF.md round-4 int8
    finding #4; round-5: per-channel calibration measured on-chip did not
    close it either).

    `scales` come from one calibration pass on the trained checkpoint
    (int8.calibration_amaxes -> scales_from_amaxes) and bake into the
    program as constants. BN state is frozen (passed through unchanged):
    the int8 graph runs BN-folded, so training through the fold with live
    stats would finetune against a moving target.

    Returns step(params, state, opt_state, rng, images_u8, masks) ->
    (params, state, opt_state, loss, counts) — the same arity as
    make_train_step so the tools/train.py host loop is reused as-is.

    Reference context: quantizes the reference's training contract
    (robosat/tools/train.py:171-194) for the model of robosat/unet.py:76-141.
    """

    def loss_and_aux(params, state, x, masks):
        logits = model.apply_logits_fake_quant(params, state, scales, x)
        loss = loss_fn(logits.astype(jnp.float32), masks, weight)
        return loss, logits

    def step(params, state, opt_state, rng, images, masks):
        if augment:
            images, masks = augment_batch(rng, images, masks)
        x = normalize(images).astype(compute_dtype)

        (loss, logits), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(params, state, x, masks)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        counts = confusion_counts(logits, masks)
        return new_params, state, new_opt_state, loss, counts

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 2))

    # Mesh mode: BN is FROZEN (the walk runs on the in-graph fold), so there
    # are no stats collectives to interleave — shard_map with one trailing
    # pmean round is both the natural semantics and the path that stays
    # latency-tolerant (mirrors make_train_step's sync_bn=False branch).
    from jax.sharding import PartitionSpec as P

    from robosat_tpu.parallel.mesh import DATA_AXIS

    def local_step(params, state, opt_state, rng, images, masks):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        if augment:
            images, masks = augment_batch(rng, images, masks)
        x = normalize(images).astype(compute_dtype)

        (loss, logits), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(params, state, x, masks)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        counts = jax.lax.psum(confusion_counts(logits, masks), DATA_AXIS)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, state, new_opt_state, loss, counts

    batch_spec = P(DATA_AXIS)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), batch_spec, batch_spec),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 2))


def make_distill_train_step(
    model,
    teacher_model,
    loss_fn,
    optimizer,
    weight=None,
    mesh=None,
    compute_dtype=jnp.float32,
    augment=True,
    remat=False,
    alpha=0.9,
    temp=2.0,
    s2d_tail=True,
):
    """Compiled knowledge-distillation training step (`rs train --teacher`).

    The student trains against the teacher's soft class distribution plus
    the dataset's hard labels:

      loss = alpha * T^2 * KL(softmax(teacher/T) || softmax(student/T))
           + (1 - alpha) * loss_fn(student_logits, masks)

    (Hinton et al. 2015 — the T^2 factor keeps soft-target gradient
    magnitudes comparable across temperatures.) The teacher runs BN-folded
    and frozen (stop_gradient) INSIDE the same compiled program, so
    augmentation crops/flips apply identically to both networks and no
    teacher activations ever cross the host boundary. Both forwards share
    the batch sharding; the teacher adds ~forward-only FLOPs per step.

    Returns step(params, state, opt_state, teacher_folded, rng, images_u8,
    masks) -> (params, state, opt_state, loss, counts). `teacher_folded`
    is the teacher's BN-folded param tree (teacher_model.fold), replicated.

    Purpose: training the compact `fast` family from a trained flagship
    U-Net — the measured route to the 5k tiles/s target (docs/PERF.md).
    Reference context: the reference trains one fixed architecture
    (robosat/tools/train.py:69-77) and has no distillation story.
    """
    # s2d_tail mirrors make_train_step / make_eval_step: opt out of the
    # space-to-depth decoder tail for parity/debug comparisons against the
    # plain apply path (round-4 ADVICE).
    forward = model.apply_s2d if (s2d_tail and hasattr(model, "apply_s2d")) else model.apply
    if remat:
        forward = jax.checkpoint(forward, static_argnums=(3,))
    t_forward = teacher_model.apply_folded

    def loss_and_aux(params, state, x, masks, t_logits):
        logits, new_state = forward(params, state, x, True)
        logits32 = logits.astype(jnp.float32)
        soft_t = jax.nn.softmax(t_logits / temp, axis=-1)
        log_s = jax.nn.log_softmax(logits32 / temp, axis=-1)
        # KL up to the teacher-entropy constant (which has zero gradient).
        kd = -jnp.mean(jnp.sum(soft_t * log_s, axis=-1)) * (temp * temp)
        hard = loss_fn(logits32, masks, weight)
        return alpha * kd + (1.0 - alpha) * hard, (new_state, logits)

    def step(params, state, opt_state, teacher_folded, rng, images, masks):
        if augment:
            images, masks = augment_batch(rng, images, masks)
        x = normalize(images).astype(compute_dtype)
        t_logits = jax.lax.stop_gradient(t_forward(teacher_folded, x)).astype(jnp.float32)

        (loss, (new_state, logits)), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(
            params, state, x, masks, t_logits
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        counts = confusion_counts(logits, masks)
        return new_params, new_state, new_opt_state, loss, counts

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, rep, batch_sharding(mesh, 4), batch_sharding(mesh, 3)),
        out_shardings=(rep, rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    )


def make_eval_step(model, loss_fn, weight=None, mesh=None, compute_dtype=jnp.float32, s2d_tail=True):
    """Compiled validation step: (params, state, images_u8, masks) -> (loss, counts)."""
    forward = model.apply_s2d if (s2d_tail and hasattr(model, "apply_s2d")) else model.apply

    def step(params, state, images, masks):
        x = normalize(images).astype(compute_dtype)
        logits, _ = forward(params, state, x, train=False)
        loss = loss_fn(logits.astype(jnp.float32), masks, weight)
        return loss, confusion_counts(logits, masks)

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, batch_sharding(mesh, 4), batch_sharding(mesh, 3)),
        out_shardings=(rep, rep),
    )
