"""Benchmark: `rs predict` device throughput on 512px tiles, one chip.

Measures the compiled predict program (normalize -> U-Net forward -> softmax
-> quantize -> overlap crop) on buffered 576px inputs (512 + 2*32 overlap,
the real predict path, reference robosat/tools/predict.py:32) in bfloat16
against the 5,000 tiles/sec/chip north-star target (BASELINE.json).

Methodology notes for this harness: the TPU is reached through a tunnel with
noisy RPC latency, and `block_until_ready` has been observed returning before
execution completes, so each timed call fetches a 4-byte in-graph checksum to
the host (which genuinely waits for the result), inputs rotate so no caching
can short-circuit, and the minimum over repetitions estimates pure device
time. Prints exactly one JSON line.
"""

import json
import time

import numpy as np

TARGET = 5000.0  # tiles/sec/chip (BASELINE.json north star)


def main():
    import jax
    import jax.numpy as jnp

    from robosat_tpu.models import unet
    from robosat_tpu.ops.augment import normalize
    from robosat_tpu.ops.quantize import softmax_quantize

    device = jax.devices()[0]

    params, state = unet.init(0, num_classes=2)
    params = jax.device_put(params, device)
    state = jax.device_put(state, device)

    overlap, tile_size = 32, 512
    side = tile_size + 2 * overlap
    batch = 8

    @jax.jit
    def step(params, state, raw):
        x = normalize(raw).astype(jnp.bfloat16)
        logits, _ = unet.apply(params, state, x, train=False)
        quantized = softmax_quantize(logits)[:, overlap:-overlap, overlap:-overlap]
        # 4-byte checksum: fetching it forces real completion on the host.
        return quantized, jnp.sum(quantized.astype(jnp.int32))

    rng = np.random.default_rng(0)
    inputs = [
        jax.device_put(rng.integers(0, 255, (batch, side, side, 3), dtype=np.uint8), device)
        for _ in range(3)
    ]

    int(step(params, state, inputs[0])[1])  # compile + warmup

    best = float("inf")
    for i in range(12):
        raw = inputs[i % len(inputs)]
        t0 = time.perf_counter()
        _, checksum = step(params, state, raw)
        int(checksum)  # forces completion
        best = min(best, time.perf_counter() - t0)

    per_chip = batch / best

    print(
        json.dumps(
            {
                "metric": "predict_tiles_per_sec_512px",
                "value": round(per_chip, 2),
                "unit": "tiles/s/chip",
                "vs_baseline": round(per_chip / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
