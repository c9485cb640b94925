"""DeepLabv3+ predict throughput on the chip (VERDICT r2 item 6 timing).

Measures the DeepLab family exactly as `rs predict` ships it for each
datapath: folded bf16 (fused margin head), hybrid int8 fine-input, and
hybrid int8 with the host-blocked s2d4 stem — same dependent-chain /
marginal-time methodology as bench.py. Reference context: DeepLab is the
BASELINE.json stretch family; the U-Net equivalents of these cells are in
BENCH_r03 "sweep".

Usage: python benchmarks/bench_deeplab.py [--batch 16]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from robosat_tpu.models import deeplab
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.parallel.steps import make_int8_predict_step, make_predict_step

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    batch = ap.parse_args().batch

    device = jax.devices()[0]
    params, state = deeplab.init(0, num_classes=2)
    overlap, tile_size = 32, 512
    side = tile_size + 2 * overlap
    rng = np.random.default_rng(0)
    raw_fine = rng.integers(0, 255, (batch, side, side, 3), dtype=np.uint8)

    results = {}

    def measure(step, tree, raw_np, reps=4):
        raw_d = jax.device_put(raw_np, device)

        def run_chain(k):
            # The steps come from make_*_predict_step and take no salt, so
            # the dependency is threaded OUTSIDE the step: one byte of each
            # output scatters into the next input on device (a tiny separate
            # dispatch), making the chain truly dependent like bench.py's —
            # steps cannot overlap — and only the last byte is fetched.
            r = raw_d
            out = None
            for _ in range(k):
                out = step(tree, r)
                r = raw_d.at[0, 0, 0, 0].set(out.reshape(-1)[0])
            return int(np.asarray(out).ravel()[0])

        run_chain(1)
        short, long_ = 2, 10
        t_s = min(_timed(run_chain, short) for _ in range(reps))
        t_l = min(_timed(run_chain, long_) for _ in range(reps))
        per = max((t_l - t_s) / (long_ - short), 1e-9)
        return {"ms_per_batch": round(per * 1e3, 2), "tiles_per_s": round(batch / per, 1)}

    # bf16 folded + fused margin head (the round-2 17x path), exactly as
    # rs predict ships it (tools/predict.py make_predict_step call).
    step = make_predict_step(
        deeplab, overlap=overlap, compute_dtype=jnp.bfloat16, fused_head=True, fold_bn=True
    )
    params_d = jax.device_put(params, device)
    state_d = jax.device_put(state, device)
    try:
        results["bf16/fine"] = measure(lambda t, r: step(params_d, state_d, r), None, raw_fine)
    except Exception as e:  # noqa: BLE001
        results["bf16/fine"] = {"error": str(e)[:160]}
    print("bf16/fine:", results["bf16/fine"], file=sys.stderr, flush=True)

    # hybrid int8, fine input
    try:
        qstep, qtree = make_int8_predict_step(deeplab, params, state, raw_fine[:8], overlap=overlap)
        qtree = jax.device_put(qtree, device)
        results["int8/fine"] = measure(qstep, qtree, raw_fine)
    except Exception as e:  # noqa: BLE001
        results["int8/fine"] = {"error": str(e)[:160]}
    print("int8/fine:", results["int8/fine"], file=sys.stderr, flush=True)

    # hybrid int8, host-blocked s2d4 stem
    try:
        raw48 = space_to_depth4(raw_fine)
        qstep_b, qtree_b = make_int8_predict_step(
            deeplab, params, state, raw48[:8], overlap=overlap, host_s2d=True
        )
        qtree_b = jax.device_put(qtree_b, device)
        results["int8/blocked"] = measure(qstep_b, qtree_b, raw48)
    except Exception as e:  # noqa: BLE001
        results["int8/blocked"] = {"error": str(e)[:160]}
    print("int8/blocked:", results["int8/blocked"], file=sys.stderr, flush=True)

    print(json.dumps({"metric": "deeplab_predict_tiles_per_sec_512px", "batch": batch, "sweep": results}))


if __name__ == "__main__":
    main()
