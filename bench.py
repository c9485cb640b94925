"""Benchmark: `rs predict` device throughput on 512px tiles, one chip.

Measures the compiled predict program (normalize -> U-Net forward -> softmax
-> quantize) on buffered 576px inputs (512 + 2*32 overlap, the real predict
path, reference robosat/tools/predict.py:32) in bfloat16 against the 5,000
tiles/sec/chip north-star target (BASELINE.json).

Methodology: the forward is chained N times inside ONE compiled program with
a data dependency between iterations (each step consumes the previous step's
output), so XLA cannot hoist work out of the loop and the harness's per-call
RPC dispatch latency (the TPU is reached through a tunnel) amortizes away —
this measures the chip, not the tunnel. Prints exactly one JSON line.
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
    chain = 16

    @jax.jit
    def run_chain(params, state, raw):
        def body(_, carry):
            x = normalize(carry).astype(jnp.bfloat16)
            logits, _ = unet.apply(params, state, x, train=False)
            q = softmax_quantize(logits)  # (N, side, side) uint8
            # Data dependency: next input derives from this output.
            return carry.at[..., 0].set(q)
        return jax.lax.fori_loop(0, chain, body, raw)

    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.integers(0, 255, (batch, side, side, 3), dtype=np.uint8), device)

    run_chain(params, state, raw).block_until_ready()  # compile + warmup

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_chain(params, state, raw).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    per_chip = batch * chain / best

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
