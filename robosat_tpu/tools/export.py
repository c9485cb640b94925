"""`rs export` — serialize the model for deployment.

The reference exports ONNX via torch.onnx (robosat/tools/export.py). The
TPU-native analog is jax.export: the jitted forward is lowered to StableHLO
and serialized into a portable artifact that any StableHLO consumer (XLA
runtimes, IREE, ...) can load. `--format onnx` additionally serializes the
BN-folded U-Net as a plain ONNX ModelProto (standard Conv/Relu/MaxPool/
Add/Concat/Resize ops, NCHW float32 — the reference's export surface) via
the in-repo protobuf writer (robosat_tpu/utils/onnx.py), so downstream ONNX
consumers keep working without the onnx package existing here.
"""

import argparse

from robosat_tpu.checkpoint import load_model_checkpoint
from robosat_tpu.config import load_config


def add_parser(subparser):
    parser = subparser.add_parser(
        "export", help="exports model as serialized StableHLO", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("--dataset", type=str, required=True, help="path to dataset configuration file")
    parser.add_argument("--image_size", type=int, default=512, help="image size to use for model")
    parser.add_argument("--checkpoint", type=str, required=True, help="model checkpoint to load")
    parser.add_argument("--batch_size", type=int, default=1, help="batch size baked into the export")
    parser.add_argument(
        "--graph",
        type=str,
        default="logits",
        choices=("logits", "predict"),
        help="logits: raw forward (float NHWC in -> logits); predict: the "
        "deployed fast path (uint8 tiles in -> quantized prob uint8 out, "
        "BN folded, fused margin head)",
    )
    parser.add_argument(
        "--family",
        type=str,
        default="unet",
        help="model family to export (registry name: unet, deeplabv3plus, segformer)",
    )
    parser.add_argument(
        "--format",
        type=str,
        default="stablehlo",
        choices=("stablehlo", "onnx"),
        help="stablehlo: jax.export artifact (any graph/family); onnx: plain "
        "ONNX ModelProto of the BN-folded logits graph (unet only)",
    )
    parser.add_argument("model", type=str, help="path to save the serialized StableHLO model to")

    parser.set_defaults(func=main)


def main(args):
    import jax

    jax.config.update("jax_platforms", "cpu")  # lowering needs no accelerator

    import jax.numpy as jnp
    from jax import export as jax_export

    from robosat_tpu.models import get_model

    dataset = load_config(args.dataset)
    num_classes = len(dataset["common"]["classes"])

    model = get_model(getattr(args, "family", "unet"))
    params, state, _ = load_model_checkpoint(args.checkpoint, num_classes)

    if getattr(args, "format", "stablehlo") == "onnx":
        import sys

        from robosat_tpu.utils.onnx import export_unet_onnx

        if getattr(args, "family", "unet") != "unet":
            sys.exit("Error: --format onnx supports the unet family (use stablehlo for others)")
        if getattr(args, "graph", "logits") != "logits":
            sys.exit("Error: --format onnx exports the logits graph (the fast path is StableHLO-only)")
        folded = model.fold(params, state)
        data = export_unet_onnx(folded, num_classes, image_size=args.image_size, batch_size=args.batch_size)
        with open(args.model, "wb") as fp:
            fp.write(data)
        print("Exported ONNX ({} bytes) to {}".format(len(data), args.model))
        return

    if getattr(args, "graph", "logits") == "predict":
        # The deployed inference program: uint8 tiles in, quantized
        # probability uint8 out, BN folded, fused margin head (no overlap
        # crop — croppping composes outside the artifact).
        from robosat_tpu.parallel.steps import make_predict_step

        step = make_predict_step(model, overlap=0, compute_dtype=jnp.bfloat16, fused_head=True)

        def forward(x):
            return step(params, state, x)

        spec = jax.ShapeDtypeStruct((args.batch_size, args.image_size, args.image_size, 3), jnp.uint8)
    else:

        def forward(x):
            logits, _ = model.apply(params, state, x, train=False)
            return logits

        spec = jax.ShapeDtypeStruct((args.batch_size, args.image_size, args.image_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(forward))(spec)

    with open(args.model, "wb") as fp:
        fp.write(exported.serialize())

    print("Exported StableHLO ({} bytes) to {}".format(len(exported.serialize()), args.model))
