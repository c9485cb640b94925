"""End-to-end `rs predict` benchmark: disk -> probability PNGs, one chip.

Unlike bench.py (device-only, salt-chained), this measures the whole
shipped pipeline — tile decode, host space-to-depth blocking, buffered
batching, the compiled int8 fast path on the device, host depth-to-space,
and PNG encode — by running the real tool main() over a synthetic
512px slippy dataset and timing wall clock.

Host sizing context (single-core costs, docs/PERF.md): PNG decode
~10.9 ms/tile, s2d ~0.8, d2s ~1.2, PNG encode (zlib-1) ~4.9 => ~18 ms of
host CPU per tile. One host core therefore saturates at ~55 tiles/s
against a ~900 tiles/s device; production sizing needs ~16 host cores per
chip (the loader and writer pools scale with --workers).

Usage: python benchmarks/bench_e2e.py [n_tiles] [--torch-layout]
Prints one JSON line: {"metric": "predict_e2e_tiles_per_sec", ...}
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from PIL import Image


def synth_dataset(root, n_tiles, size=512, z=18, x0=69600, y0=104900):
    """A column-major block of adjacent tiles with imagery-like content."""
    rng = np.random.default_rng(7)
    cols = max(1, int(np.sqrt(n_tiles)))
    tiles = []
    for i in range(n_tiles):
        x, y = x0 + i // cols, y0 + i % cols
        base = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base).resize((size, size), Image.BILINEAR))
        img = np.clip(img.astype(np.int16) + rng.integers(-12, 12, img.shape), 0, 255).astype(np.uint8)
        d = os.path.join(root, str(z), str(x))
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, "{}.png".format(y)), optimize=False, compress_level=1)
        tiles.append((x, y))
    return tiles


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import dumps_config
    from robosat_tpu.models import unet
    from robosat_tpu.tools import predict

    work = tempfile.mkdtemp(prefix="rs_e2e_")
    try:
        images = os.path.join(work, "images")
        synth_dataset(images, n_tiles)

        params, state = unet.init(0, num_classes=2)
        ckpt = os.path.join(work, "ckpt.npz")
        save_checkpoint(ckpt, {"params": params, "state": state}, meta={"epoch": 1})

        model_toml = os.path.join(work, "model.toml")
        with open(model_toml, "w") as f:
            f.write(
                dumps_config(
                    {
                        "common": {
                            "cuda": True,
                            "batch_size": 8,
                            "image_size": 512,
                            "checkpoint": work,
                            "int8": True,
                            "bf16": True,
                        }
                    }
                )
            )
        dataset_toml = os.path.join(work, "dataset.toml")
        with open(dataset_toml, "w") as f:
            f.write(
                dumps_config(
                    {
                        "common": {
                            "classes": ["background", "foreground"],
                            "colors": ["denim", "orange"],
                            "dataset": work,
                        }
                    }
                )
            )

        probs = os.path.join(work, "probs")

        class Args:
            batch_size = 8
            checkpoint = ckpt
            overlap = 32
            strip = 1
            tile_size = 512
            workers = 4
            tiles = images
            model = model_toml
            dataset = dataset_toml
            profile = None
            png_optimize = False

        Args.probs = probs

        # Warmup pass populates the persistent compile cache (not timed).
        predict.main(Args)
        shutil.rmtree(probs)

        # Each predict.main() re-traces + re-calibrates (~15 s fixed,
        # amortized over a real AOI); the tool reports its own steady-state
        # wall time from after step build to the last PNG on disk. Best of
        # two runs (the TPU tunnel's RPC latency varies minute to minute).
        t0 = time.perf_counter()
        stats = predict.main(Args)
        total_1 = time.perf_counter() - t0
        shutil.rmtree(probs)
        t0 = time.perf_counter()
        stats2 = predict.main(Args)
        total_2 = time.perf_counter() - t0

        written = sum(len(files) for _, _, files in os.walk(probs))
        assert written == n_tiles, "expected {} prob tiles, found {}".format(n_tiles, written)

        steady = min(stats["steady_s"], stats2["steady_s"])
        total = min(total_1, total_2)
        per_sec = n_tiles / steady
        print(
            json.dumps(
                {
                    "metric": "predict_e2e_tiles_per_sec",
                    "value": round(per_sec, 2),
                    "unit": "tiles/s (disk->PNG, incl. host, steady-state)",
                    "n_tiles": n_tiles,
                    "wall_s": round(total, 2),
                    "setup_s": round(total - steady, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
