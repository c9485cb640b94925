"""Pallas per-parity transposed-conv kernel vs the shipped XLA int8 path.

Benchmarks robosat_tpu.models.qdec.parity_up_conv against
models.int8._int8_conv (padding (2,2), lhs_dilation (2,2)) at the EXACT
decoder shapes of the deployed predict graph (batch 8, 576px buffered input,
s2d-blocked), and asserts bit-equality on the chip before timing.

Standalone stage costs measured by benchmarks/bench_stages.py (docs/PERF.md):
dec3 1.875 ms, dec1 1.249, dec0 1.048, center 0.894.

Usage: python benchmarks/bench_qdec.py [stage ...] [--strip N]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# stage: (h, w, cin, cout) at batch 8, 576px input.
SHAPES = {
    "center": (9, 9, 2048, 256),
    "dec0": (18, 18, 2304, 256),
    "dec1": (36, 36, 1280, 256),
    "dec2": (72, 72, 768, 64),
    "dec3": (144, 144, 320, 128),
}


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
    from robosat_tpu.models import qdec

    device = jax.devices()[0]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strip = None
    for a in sys.argv[1:]:
        if a.startswith("--strip"):
            strip = int(a.split("=")[1]) if "=" in a else None
    names = args or list(SHAPES)

    batch = 8
    results = {}
    for name in names:
        h, w, cin, cout = SHAPES[name]
        rng = np.random.default_rng(0)
        w3 = rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
        node = jax.device_put(jax.jit(lambda k: q8._qkernel(q8._fused_k4(k)))(jnp.asarray(w3)), device)
        x = jax.device_put(
            jnp.asarray(rng.normal(0, 1.0, (batch, h, w, cin)), jnp.bfloat16), device
        )
        s_in = 0.0123

        def xla_fn(node, xx):
            return jax.nn.relu(
                q8._int8_conv(node, xx, s_in, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2))
            )

        def pl_fn(node, xx):
            return qdec.parity_up_conv(xx, node, s_in, strip_rows=strip)

        # Bit-equality on the chip first.
        try:
            ref = np.asarray(jax.jit(xla_fn)(node, x), np.float32)
            got = np.asarray(jax.jit(pl_fn)(node, x), np.float32)
            if not np.array_equal(ref, got):
                nbad = int((ref != got).sum())
                results[name] = "MISMATCH: {} / {} elements".format(nbad, ref.size)
                print(name, results[name], flush=True)
                continue
        except Exception as e:  # noqa: BLE001
            results[name] = "FAIL: {}".format(str(e)[:200])
            print(name, results[name], flush=True)
            continue

        # Timing: dependent chain, marginal between short and long.
        out = {}
        for label, fn in (("xla", xla_fn), ("pallas", pl_fn)):

            @jax.jit
            def step(nd, xx, salt, fn=fn):
                xs = xx + (salt.astype(jnp.float32) * 1e-30).astype(xx.dtype)
                o = fn(nd, xs)
                return jnp.sum(o.astype(jnp.float32)).astype(jnp.int32) & jnp.int32(0x7FFFFFF)

            def run_chain(k, step=step):
                salt = jnp.int32(1)
                for _ in range(k):
                    salt = step(node, x, salt)
                return int(salt)

            try:
                run_chain(2)
                t_short = min(_timed(run_chain, 4) for _ in range(5))
                t_long = min(_timed(run_chain, 44) for _ in range(5))
                out[label] = round(max((t_long - t_short) / 40, 1e-9) * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                out[label] = "FAIL: {}".format(str(e)[:160])
        results[name] = out
        print(name, out, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
