"""Skip-concat cost in the decoder: concat+conv vs split-kernel conv sum.

bench_qdec measures the decoder's raw transposed convs at 2-5x LESS than
bench_stages measures the stages (which include the skip concatenate), so
the concat materialization — not the conv — may dominate decoder time.
conv(concat(a, b), W) == conv(a, W[:, :, :ca]) + conv(b, W[:, :, ca:]):
the split form never materializes the (H, W, ca+cb) buffer and XLA fuses
the add into the second conv's epilogue.

Measures, per decoder site: (1) conv alone on a preformed input,
(2) concat + conv, (3) split conv sum, (4) concat alone.

Usage: python benchmarks/bench_concat.py [site ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# site: (h, w, c_skip, c_up, cout): input is concat(skip(c_skip), up(c_up)).
SITES = {
    "dec0": (18, 18, 2048, 256, 256),
    "dec1": (36, 36, 1024, 256, 256),
    "dec2": (72, 72, 512, 256, 64),
    "dec3": (144, 144, 256, 64, 128),
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

    device = jax.devices()[0]
    names = sys.argv[1:] or list(SITES)
    batch = 8
    s_in = 0.0123
    results = {}

    for name in names:
        h, w, ca, cb, cout = SITES[name]
        rng = np.random.default_rng(0)
        w3 = rng.normal(0, 0.05, (3, 3, ca + cb, cout)).astype(np.float32)
        node = jax.device_put(jax.jit(lambda k: q8._qkernel(q8._fused_k4(k)))(jnp.asarray(w3)), device)
        node_a = {"wq": node["wq"][:, :, :ca], "ws": node["ws"]}
        node_b = {"wq": node["wq"][:, :, ca:], "ws": node["ws"]}
        a = jax.device_put(jnp.asarray(rng.normal(0, 1, (batch, h, w, ca)), jnp.bfloat16), device)
        b = jax.device_put(jnp.asarray(rng.normal(0, 1, (batch, h, w, cb)), jnp.bfloat16), device)
        cat = jax.device_put(jnp.concatenate([a, b], axis=-1), device)

        kw = dict(padding=((2, 2), (2, 2)), lhs_dilation=(2, 2))

        def conv_only(node, x):
            return jax.nn.relu(q8._int8_conv(node, x, s_in, **kw))

        def concat_conv(node, a, b):
            return jax.nn.relu(q8._int8_conv(node, jnp.concatenate([a, b], axis=-1), s_in, **kw))

        def split_conv(na, nb, a, b):
            xa = q8._quantize_act(a, s_in)
            xb = q8._quantize_act(b, s_in)
            from jax import lax

            from robosat_tpu.models.layers import CONV_DIMS

            acc = lax.conv_general_dilated(
                xa, na["wq"], (1, 1), kw["padding"], lhs_dilation=kw["lhs_dilation"],
                dimension_numbers=CONV_DIMS, preferred_element_type=jnp.int32,
            ) + lax.conv_general_dilated(
                xb, nb["wq"], (1, 1), kw["padding"], lhs_dilation=kw["lhs_dilation"],
                dimension_numbers=CONV_DIMS, preferred_element_type=jnp.int32,
            )
            return jax.nn.relu((acc.astype(jnp.float32) * (na["ws"] * s_in)).astype(jnp.bfloat16))

        def concat_only(a, b):
            return jnp.concatenate([a, b], axis=-1)

        # Equality first: split form must match concat form bitwise (integer
        # accumulation commutes; epilogue identical).
        ref = np.asarray(jax.jit(concat_conv)(node, a, b), np.float32)
        got = np.asarray(jax.jit(split_conv)(node_a, node_b, a, b), np.float32)
        bit_equal = bool(np.array_equal(ref, got))

        out = {"bit_equal": bit_equal}
        cases = {
            "conv_only": (conv_only, (node, cat)),
            "concat_conv": (concat_conv, (node, a, b)),
            "split_conv": (split_conv, (node_a, node_b, a, b)),
            "concat_only": (concat_only, (a, b)),
        }
        for label, (fn, args) in cases.items():

            @jax.jit
            def step(salt, *args, fn=fn):
                # Salt only the bf16 activation args (dict args are weights).
                args = tuple(
                    x if isinstance(x, dict) else x + (salt.astype(jnp.float32) * 1e-30).astype(x.dtype)
                    for x in args
                )
                o = fn(*args)
                return jnp.sum(o.astype(jnp.float32)).astype(jnp.int32) & jnp.int32(0x7FFFFFF)

            def run_chain(k, step=step, args=args):
                salt = jnp.int32(1)
                for _ in range(k):
                    salt = step(salt, *args)
                return int(salt)

            try:
                run_chain(2)
                t_short = min(_timed(run_chain, 4) for _ in range(4))
                t_long = min(_timed(run_chain, 44) for _ in range(4))
                out[label] = round(max((t_long - t_short) / 40, 1e-9) * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                out[label] = "FAIL: {}".format(str(e)[:120])
        results[name] = out
        print(name, out, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
