"""Fused Pallas tail vs the shipped XLA dec4+dec5+head chain on the chip.

Shapes are the deployed predict graph's (batch 8, 576px buffered -> 288^2 x
128 half-res features, overlap 32). Asserts equality on the chip before
timing. Usage: python benchmarks/bench_qtail.py [--strip N]
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

    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models import qtail
    from robosat_tpu.ops.head import fused_prediction_head_s2d_blocked

    strip = 8
    for a in sys.argv[1:]:
        if a.startswith("--strip"):
            strip = int(a.split("=")[1])

    device = jax.devices()[0]
    batch, h, c, overlap = 8, 288, 128, 32
    rng = np.random.default_rng(0)
    node4 = jax.device_put(q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))), device)
    node5 = jax.device_put(q8._qkernel(jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))), device)
    w_final = jax.device_put(jnp.asarray(rng.normal(0, 0.3, (1, 1, 32, 2)).astype(np.float32)), device)
    b_final = jax.device_put(jnp.asarray(rng.normal(0, 0.1, (2,)).astype(np.float32)), device)
    x = jax.device_put(jnp.asarray(rng.normal(0, 1.0, (batch, h, h, c)), jnp.bfloat16), device)
    s4, s5 = 0.021, 0.013

    def xla_fn(n4, n5, wf, bf, xx):
        y4 = jax.nn.relu(q8._int8_conv(n4, xx, s4, compute_dtype=jnp.bfloat16))
        y5 = jax.nn.relu(q8._int8_conv(n5, y4, s5, compute_dtype=jnp.bfloat16))
        return fused_prediction_head_s2d_blocked(y5, wf, bf, overlap=overlap)

    def pl_fn(n4, n5, wf, bf, xx):
        return qtail.fused_tail(xx, n4, s4, n5, s5, wf, bf, overlap=overlap, strip_rows=strip)

    results = {}
    ref = np.asarray(jax.jit(xla_fn)(node4, node5, w_final, b_final, x))
    try:
        got = np.asarray(jax.jit(pl_fn)(node4, node5, w_final, b_final, x))
        nbad = int((ref != got).sum())
        results["mismatch_bytes"] = nbad
        results["total_bytes"] = ref.size
        if nbad:
            bad = np.argwhere(ref != got)[:5]
            results["examples"] = [
                [int(v) for v in idx] + [int(ref[tuple(idx)]), int(got[tuple(idx)])] for idx in bad
            ]
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"fail": str(e)[:300]}))
        return

    for label, fn in (("xla", xla_fn), ("pallas", pl_fn)):

        @jax.jit
        def step(n4, n5, wf, bf, xx, salt, fn=fn):
            xs = xx + (salt.astype(jnp.float32) * 1e-30).astype(xx.dtype)
            o = fn(n4, n5, wf, bf, xs)
            return jnp.sum(o.astype(jnp.int32)).astype(jnp.int32) & jnp.int32(0x7FFFFFF)

        def run_chain(k, step=step):
            salt = jnp.int32(1)
            for _ in range(k):
                salt = step(node4, node5, w_final, b_final, x, salt)
            return int(salt)

        try:
            run_chain(2)
            t_short = min(_timed(run_chain, 4) for _ in range(5))
            t_long = min(_timed(run_chain, 44) for _ in range(5))
            results[label] = round(max((t_long - t_short) / 40, 1e-9) * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            results[label] = "FAIL: {}".format(str(e)[:200])
        print(label, results.get(label), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
