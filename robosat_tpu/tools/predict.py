"""`rs predict` — per-tile class-probability PNGs from a trained model.

Output contract parity with the reference tool (robosat/tools/predict.py):
quantized foreground probabilities as palette-P PNGs ("pink" continuous
palette) in a slippy-map directory, buffered overlap-tile prediction.

TPU-native internals: buffered tiles stream as raw uint8 through a threaded
prefetch loader; normalization, forward, softmax, quantization, and the
overlap crop are one compiled program sharded over the device mesh; only one
uint8 per pixel returns to the host. PNG encoding overlaps with device
compute via a writer pool.
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image
from tqdm import tqdm

from robosat_tpu.checkpoint import load_model_checkpoint
from robosat_tpu.colors import continuous_palette_for_color
from robosat_tpu.config import load_config
from robosat_tpu.data.datasets import BufferedSlippyMapDirectory, StripBufferedSlippyMapDirectory
from robosat_tpu.data.loader import batches
from robosat_tpu.device import configure_accelerator


def add_parser(subparser):
    parser = subparser.add_parser(
        "predict",
        help="runs the model over imagery tiles, writing probability tiles",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("--batch_size", type=int, default=1, help="tiles per device batch")
    parser.add_argument("--checkpoint", type=str, required=True, help="checkpoint to run (.npz, or a reference .pth)")
    parser.add_argument("--overlap", type=int, default=32, help="context pixels borrowed from neighboring tiles on every side")
    parser.add_argument(
        "--strip",
        type=int,
        default=1,
        help="predict this many vertically-consecutive tiles as one image (less halo re-compute)",
    )
    parser.add_argument("--tile_size", type=int, required=True, help="side length of the input tiles in pixels")
    parser.add_argument("--workers", type=int, default=0, help="decode/encode worker threads")
    parser.add_argument(
        "--shard",
        type=str,
        default=None,
        metavar="I/N",
        help="process only the I-th of N contiguous blocks of the tile list "
        "(0-based); run one `rs predict --shard i/n` per host/process against "
        "the same output directory to spread the host-bound decode/encode "
        "cost — the union of all N runs is byte-identical to an unsharded run",
    )
    parser.add_argument("tiles", type=str, help="slippy map directory with input imagery")
    parser.add_argument("probs", type=str, help="slippy map directory for the probability tiles")
    parser.add_argument("--model", type=str, required=True, help="path to model configuration file")
    parser.add_argument("--dataset", type=str, required=True, help="path to dataset configuration file")
    parser.add_argument("--profile", type=str, default=None, help="write a TensorBoard device trace to this directory")
    parser.add_argument(
        "--png_optimize",
        action="store_true",
        help="spend ~37x more encode CPU for ~12%% smaller probability PNGs",
    )

    parser.set_defaults(func=main)


def main(args):
    model_config = load_config(args.model)
    dataset = load_config(args.dataset)

    devices = configure_accelerator(model_config["common"]["cuda"])

    import jax.numpy as jnp

    from robosat_tpu.models import get_model
    from robosat_tpu.parallel.mesh import create_mesh, replicate
    from robosat_tpu.parallel.steps import make_predict_step

    num_classes = len(dataset["common"]["classes"])
    assert num_classes == 2, "single channel requires binary model"

    model = get_model(model_config["common"].get("model", "unet"))
    params, state, ckpt_meta = load_model_checkpoint(args.checkpoint, num_classes)
    # A QAT-finetuned checkpoint (rs train --qat) carries the frozen
    # calibration vector its finetune trained against; the int8 step must
    # quantize with EXACTLY those scales, not a fresh calibration of the
    # moved weights.
    qat_amaxes = ckpt_meta.get("qat_amaxes") if isinstance(ckpt_meta, dict) else None

    compute_dtype = jnp.bfloat16 if model_config["common"].get("bf16", False) else jnp.float32
    # `fused_head` (formerly `pallas_head`) in the model TOML; defaults on.
    use_fused = model_config["common"].get("fused_head", model_config["common"].get("pallas_head", True))
    # int8 = true in the model TOML runs the whole folded forward quantized
    # (robosat_tpu/models/int8.py for the U-Net; DeepLab owns its hybrid
    # walk in models/deeplab.py); calibration needs one real batch, so the
    # step is built lazily inside the loop.
    is_unet = model_config["common"].get("model", "unet") == "unet"
    int8_mode = model_config["common"].get("int8", False) and (
        is_unet or hasattr(model, "predict_quantized_int8")
    )
    # int8_calibration = a percentile (default 99.8), "mae"/"mse" (per-site
    # L1/L2-optimal clip grids), or "amax". Trained-model sweep
    # (benchmarks/int8_iou_eval.py, docs/PERF.md round 4): amax calibration
    # collapses a trained model (mask-agreement IoU 0.14 vs fp32 — outlier
    # activation channels blow the static per-tensor scale) and L2-grid
    # tracks it (a lone outlier dominates squared error); the percentile
    # plateau 99.7-99.9 measured best (0.94 agreement, peak at 99.8), so
    # that is the default. "amax" remains for the random-weight byte-parity
    # tests and as an explicit opt-out.
    # "pc" / "pc<percentile>" = PER-CHANNEL calibration (per-channel amax /
    # percentile vectors folded into the consumer weights — models/int8.py
    # _quantize_weight): recovers most of the residual per-tensor
    # quantization loss on trained models at identical step cost
    # (XLA-walk only; incompatible with pallas_tail/pallas_enc).
    calib = model_config["common"].get("int8_calibration", 99.8)
    if calib in ("amax", None):
        calib_percentile = None
    elif calib in ("mse", "mae"):
        calib_percentile = calib
    elif isinstance(calib, str) and calib.startswith("pc"):
        if calib[2:] not in ("", "amax"):
            float(calib[2:])  # validate eagerly: fail at config read, not in the step build
        calib_percentile = calib
    else:
        calib_percentile = float(calib)
    # pallas_tail = "tail" | "sep" | "full" in the model TOML swaps the int8
    # U-Net's dec4/dec5 (with "sep", dec3 too, all in parity-separated
    # layout; with "full", the head) for the fused Pallas kernels
    # (models/{qdec,qtail}.py) — opt-in while the A/B on chip is pending.
    pallas_tail = model_config["common"].get("pallas_tail", None) or None
    # pallas_enc = true runs encoder layer1 through the Pallas bottleneck
    # kernel (models/qenc.py); "all" runs every encoder stage (stride-2
    # first blocks included) — same opt-in-pending-A/B status as the tail.
    pallas_enc = model_config["common"].get("pallas_enc", False)
    use_s2d = model_config["common"].get("s2d", True)
    # Host-side 4x4 space-to-depth blocking of the input (loader workers do a
    # numpy reshape; the stem then runs as one MXU-wide conv — device-side
    # uint8 transposes cost ~1 ms/batch). U-Net s2d path, per-tile mode only.
    buffered_side = args.tile_size + 2 * args.overlap
    # The U-Net center block pools enc4 2x and upsamples back for the concat
    # (robosat/unet.py:99-127): the buffered side must keep side/32 even or
    # the skip shapes misalign. Other families declare their own multiple
    # (e.g. fastnet's /4 stem + three /2 stages need 32).
    side_multiple = 64 if is_unet else getattr(model, "SIDE_MULTIPLE", 1)
    if buffered_side % side_multiple:
        sys.exit(
            "Error: tile_size + 2*overlap must be a multiple of {} (got {})".format(
                side_multiple, buffered_side
            )
        )
    use_host_s2d = (
        model_config["common"].get("host_s2d", True)
        and (is_unet or (int8_mode and hasattr(model, "predict_quantized_int8")))
        and use_s2d
        and use_fused
        and args.strip <= 1
        and buffered_side % 4 == 0
    )

    shard = None
    shard_arg = getattr(args, "shard", None)
    if shard_arg is not None:
        try:
            i_s, n_s = shard_arg.split("/")
            shard = (int(i_s), int(n_s))
            assert 0 <= shard[0] < shard[1]
        except (ValueError, AssertionError):
            sys.exit("Error: --shard must be I/N with 0 <= I < N (got {!r})".format(shard_arg))

    if args.strip > 1:
        directory = StripBufferedSlippyMapDirectory(
            args.tiles, size=args.tile_size, overlap=args.overlap, strip=args.strip, shard=shard
        )
        total_tiles = sum(len(s) for s in directory.strips)
    else:
        transform = None
        if use_host_s2d:
            from robosat_tpu.models.layers import space_to_depth4

            def transform(image):
                return space_to_depth4(image[None])[0]

        directory = BufferedSlippyMapDirectory(
            args.tiles, size=args.tile_size, overlap=args.overlap, transform=transform, shard=shard
        )
        total_tiles = len(directory)
    if shard is not None and len(directory) == 0:
        # More shards than tiles: this worker's block is legitimately empty.
        print("shard {}/{}: no tiles in this block, nothing to do".format(*shard))
        return {"tiles": 0, "steady_s": 0.0}
    assert len(directory) > 0, "at least one tile in dataset"

    # Round the batch up to a multiple of the mesh size so the batch axis
    # shards evenly; padded rows are masked out by Batch.valid. With strips
    # the batch counts strips, each carrying --strip tiles.
    mesh = create_mesh(devices)
    per_item = max(args.strip, 1)
    batch_items = max(args.batch_size // per_item, 1)
    batch_size = -(-batch_items // len(devices)) * len(devices)

    predict_step = None
    qtree = None
    if not int8_mode:
        # The fused head defaults on: the final conv + softmax + digitize +
        # crop collapse to one sigmoid-of-margin pass over the features,
        # avoiding lane-padded logit buffers entirely (see ops/head.py). The
        # s2d decoder tail (half resolution, 128-lane parity-blocked channels)
        # also defaults on; both are numerics-preserving to fp rounding.
        predict_step = make_predict_step(
            model,
            mesh=mesh,
            overlap=args.overlap,
            compute_dtype=compute_dtype,
            fused_head=use_fused,
            s2d=use_s2d,
            host_s2d=use_host_s2d,
        )
    params = replicate(mesh, params)
    state = replicate(mesh, state)

    # The host-blocked fast path returns the quantized output parity-blocked
    # — (N, size/2, size/2, 4) for the U-Net's s2d tail, (N, size/4, size/4,
    # 16) for families with a sub-pixel head that declare INT8_BLOCKED_OUT
    # (fastnet) — and the writer pool interleaves it back to the fine grid
    # (2 MB of numpy byte shuffling per batch, overlapped with device
    # compute; the same transposes cost ~0.6 ms/batch on device). DeepLab's
    # int8 path takes blocked INPUT but emits fine uint8 (its margin head
    # upsamples from 1/4 resolution), so it stays unblocked.
    blocked_out = use_host_s2d and (
        (is_unet and args.overlap % 2 == 0)
        or (int8_mode and getattr(model, "INT8_BLOCKED_OUT", False) and args.overlap % 4 == 0)
    )

    palette = continuous_palette_for_color("pink", 256)
    writers = ThreadPoolExecutor(max_workers=max(args.workers, 2))
    pending = []

    from robosat_tpu.native import imagecodec

    def write_png(tile, quantized):
        x, y, z = map(int, tile)
        os.makedirs(os.path.join(args.probs, str(z), str(x)), exist_ok=True)
        path = os.path.join(args.probs, str(z), str(x), "{}.png".format(y))
        # optimize=True (the reference's choice, robosat/tools/predict.py:113)
        # costs ~180 ms/tile of host CPU vs ~5 ms at zlib level 1 for +14%
        # bytes — at ~900 tiles/s/chip device rate the optimizing encoder
        # would need ~160 host cores per chip. Identical pixels either way.
        optimize = getattr(args, "png_optimize", False)
        if blocked_out and quantized.shape[-1] == 16:
            # Doubly-blocked output (pallas_tail = "sep"): peel the 288-grid
            # parity level on the host first; the remaining (…, 4) block goes
            # through the standard blocked writer below.
            from robosat_tpu.models.layers import depth_to_space2

            quantized = depth_to_space2(quantized[None])[0]
        if not optimize:
            # Native C++ encoder (GIL-released); for the blocked fast path it
            # fuses the parity interleave into scanline assembly, replacing
            # the ~1.2 ms/tile numpy depth-to-space pass (docs/PERF.md).
            if blocked_out:
                if imagecodec.encode_palette_png_d2s(path, quantized, palette):
                    return
            elif imagecodec.encode_palette_png(path, quantized, palette):
                return
        if blocked_out:
            from robosat_tpu.models.layers import depth_to_space2

            quantized = depth_to_space2(quantized[None])[0, :, :, 0]
        out = Image.fromarray(quantized, mode="P")
        out.putpalette(palette)
        if optimize:
            out.save(path, optimize=True)
        else:
            out.save(path, optimize=False, compress_level=1)

    loader = batches(directory, batch_size, workers=max(args.workers, 2))
    progress = tqdm(total=total_tiles, desc="Eval", unit="tile", ascii=True)

    import jax

    if args.profile:
        jax.profiler.start_trace(args.profile)

    size = args.tile_size

    def flush(batch, device_out):
        """Fetch a dispatched batch and hand tiles to the writer pool."""
        quantized = np.asarray(device_out)
        for meta, q in zip(batch.meta, quantized[: batch.valid]):
            if args.strip > 1:
                strip_tiles, valid = meta
                for i, tile in enumerate(strip_tiles[:valid]):
                    pending.append(writers.submit(write_png, tile, q[i * size : (i + 1) * size]))
                progress.update(valid)
            else:
                pending.append(writers.submit(write_png, meta, q))
                progress.update(1)

    # Dispatch ahead, fetch behind: jax queues the compiled step
    # asynchronously, so keeping a couple of batches in flight overlaps the
    # device round trip (large over this harness's tunnel, real on any
    # network-attached accelerator) with host decode and PNG encode.
    in_flight = []
    setup_done_t = None
    for batch in loader:
        (images,) = batch.arrays
        if int8_mode and predict_step is None:
            from robosat_tpu.parallel.steps import make_int8_predict_step

            import numpy as _np

            predict_step, qtree = make_int8_predict_step(
                model, params, state, images, mesh=mesh, overlap=args.overlap, fused_head=use_fused,
                host_s2d=use_host_s2d, calib_percentile=calib_percentile,
                pallas_tail=pallas_tail if is_unet else None,
                pallas_enc=pallas_enc if is_unet else False,
                calib_amaxes=_np.asarray(qat_amaxes, _np.float64) if qat_amaxes is not None else None,
            )
            qtree = replicate(mesh, qtree)
        with jax.profiler.StepTraceAnnotation("predict_batch"):
            if int8_mode:
                out = predict_step(qtree, images)
            else:
                out = predict_step(params, state, images)
        if setup_done_t is None:
            # Start the steady-state clock only after the first batch's
            # result is materialized, so first-call XLA compilation (step
            # and jitted int8 quantize) never leaks into steady_s even on a
            # cold compile cache.
            import time

            jax.block_until_ready(out)
            setup_done_t = time.perf_counter()
        in_flight.append((batch, out))
        if len(in_flight) > 2:
            flush(*in_flight.pop(0))
    for item in in_flight:
        flush(*item)

    if args.profile:
        jax.profiler.stop_trace()

    for fut in pending:
        fut.result()
    writers.shutdown()
    progress.close()

    # Steady-state stats for benchmarks (benchmarks/bench_e2e.py): tiles
    # written and the wall time from after step build/calibration to the
    # last PNG on disk.
    import time

    return {
        "tiles": total_tiles,
        "steady_s": (time.perf_counter() - setup_done_t) if setup_done_t else 0.0,
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_parser(parser.add_subparsers())
    main(parser.parse_args(sys.argv[1:]))
