"""Microbenchmark: attainable int8 matmul rates in Pallas/Mosaic vs XLA convs.

Probes the exact contraction shapes of the U-Net's below-peak stages
(docs/PERF.md "Remaining per-step budget") with a fused requantize epilogue
(int32 accum -> f32 scale -> clip -> int8 out), the way a real fused kernel
would run them, in both matmul orientations:

  A (channels-major): w(cout, cin) @ x(cin, P)   -> out(cout, P)
  B (NHWC-flat):      x(P, cin)    @ w(cin, cout) -> out(P, cout)

Shapes cover layer1 of the ResNet-50 encoder at 8x576px input (144^2
spatial; reference robosat/unet.py:94, torchvision bottleneck) and dec3's
per-parity decomposition. Establishes which formulation Mosaic sustains
near the chip's ~302 int8 TOPS before any full kernel is built.

Methodology: bench.py's dependent-chain marginal timing (the tunnel's RPC
latency dwarfs device time; block_until_ready is unreliable).

Usage: python benchmarks/bench_pallas_mm.py [shape ...]
"""

import json
import sys
import time

import numpy as np


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


P_FULL = 165888  # 8 x 144 x 144

SHAPES = {
    # name: (cout, cin, P)
    "c1b0": (64, 64, P_FULL),
    "c1b12": (64, 256, P_FULL),
    "c2tap1": (64, 64, P_FULL),  # conv2 as 9 of these
    "c2tap9": (64, 576, P_FULL),  # conv2 with all taps K-stacked
    "c3": (256, 64, P_FULL),
    "c3down": (256, 128, P_FULL),
    "dec3par": (128, 1280, P_FULL // 4),
    "dense256": (256, 256, P_FULL),
}


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    device = jax.devices()[0]
    names = sys.argv[1:] or list(SHAPES)

    def make_mm_a(cout, cin, p_total, p_blk):
        """Orientation A: out(cout, P) = w(cout, cin) @ x(cin, P), requant."""

        def kernel(w_ref, x_ref, s_ref, o_ref):
            acc = jax.lax.dot_general(
                w_ref[:], x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * s_ref[:]  # (cout, 1) broadcast over lanes
            o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((cout, p_total), jnp.int8),
            grid_spec=pl.GridSpec(
                grid=(p_total // p_blk,),
                in_specs=[
                    pl.BlockSpec((cout, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((cin, p_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((cout, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((cout, p_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * cout * cin * p_total, bytes_accessed=(cin + cout) * p_total, transcendentals=0
            ),
        )

    def make_mm_b(cout, cin, p_total, p_blk):
        """Orientation B: out(P, cout) = x(P, cin) @ w(cin, cout), requant."""

        def kernel(x_ref, w_ref, s_ref, o_ref):
            acc = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * s_ref[:]  # (1, cout) broadcast over rows
            o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((p_total, cout), jnp.int8),
            grid_spec=pl.GridSpec(
                grid=(p_total // p_blk,),
                in_specs=[
                    pl.BlockSpec((p_blk, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((p_blk, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * cout * cin * p_total, bytes_accessed=(cin + cout) * p_total, transcendentals=0
            ),
        )

    def bench(step, args):
        def run_chain(k):
            salt = jnp.int32(1)
            for _ in range(k):
                salt = step(*args, salt)
            return int(salt)

        run_chain(2)
        t_short = min(_timed(run_chain, 2) for _ in range(5))
        t_long = min(_timed(run_chain, 12) for _ in range(5))
        return max((t_long - t_short) / 10, 1e-9)

    results = {}
    for name in names:
        cout, cin, p_total = SHAPES[name]
        rng = np.random.default_rng(0)
        macs = cout * cin * p_total

        for orient, maker in (("A", make_mm_a), ("B", make_mm_b)):
            for p_blk in (512, 2048):
                mm = maker(cout, cin, p_total, p_blk)
                if orient == "A":
                    w = jax.device_put(rng.integers(-127, 128, (cout, cin), dtype=np.int8), device)
                    x = jax.device_put(rng.integers(-127, 128, (cin, p_total), dtype=np.int8), device)
                    s = jax.device_put(np.full((cout, 1), 1e-3, np.float32), device)
                    args = (w, x, s)

                    @jax.jit
                    def step(w, x, s, salt, mm=mm):
                        xx = jnp.where(salt == jnp.int32(-1234567), x ^ 1, x)
                        return jax.lax.bitwise_and(jnp.sum(mm(w, xx, s).astype(jnp.int32)), jnp.int32(0x7FFFFFF))

                else:
                    x = jax.device_put(rng.integers(-127, 128, (p_total, cin), dtype=np.int8), device)
                    w = jax.device_put(rng.integers(-127, 128, (cin, cout), dtype=np.int8), device)
                    s = jax.device_put(np.full((1, cout), 1e-3, np.float32), device)
                    args = (x, w, s)

                    @jax.jit
                    def step(x, w, s, salt, mm=mm):
                        xx = jnp.where(salt == jnp.int32(-1234567), x ^ 1, x)
                        return jax.lax.bitwise_and(jnp.sum(mm(xx, w, s).astype(jnp.int32)), jnp.int32(0x7FFFFFF))

                key = "pl{}_{}_b{}".format(orient, name, p_blk)
                try:
                    per = bench(step, args)
                except Exception as e:  # noqa: BLE001 - report and continue probing
                    results[key] = "FAIL: {}".format(str(e)[:120])
                    continue
                results[key] = {"ms": round(per * 1e3, 3), "tops": round(2 * macs / per / 1e12, 1)}
                print(key, results[key], flush=True)

        # XLA baseline: same contraction as a 1x1 NHWC conv with requant
        # epilogue (int8 in, int8 out) — what the shipped int8 path does.
        n = 8
        hw = int(np.sqrt(p_total // n))
        xc = jax.device_put(rng.integers(-127, 128, (n, hw, hw, cin), dtype=np.int8), device)
        wc = jax.device_put(rng.integers(-127, 128, (1, 1, cin, cout), dtype=np.int8), device)

        @jax.jit
        def conv_step(w, x, salt):
            xx = jnp.where(salt == jnp.int32(-1234567), x ^ 1, x)
            acc = jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            out = jnp.clip(jnp.round(acc.astype(jnp.float32) * 1e-3), -127, 127).astype(jnp.int8)
            return jax.lax.bitwise_and(jnp.sum(out.astype(jnp.int32)), jnp.int32(0x7FFFFFF))

        try:
            per = bench(conv_step, (wc, xc))
        except Exception as e:  # noqa: BLE001
            results["xla_{}".format(name)] = "FAIL: {}".format(str(e)[:120])
            continue
        results["xla_{}".format(name)] = {"ms": round(per * 1e3, 3), "tops": round(2 * macs / per / 1e12, 1)}
        print("xla_" + name, results["xla_" + name], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
