"""Standalone stage timings of the shipped int8 predict graph.

Times each segment of the hybrid-int8 U-Net forward (models/int8._walk) in
isolation on the real chip — encoder stages, decoder up_blocks, s2d tail —
so kernel-replacement wins are attributable op by op (docs/PERF.md's budget
came from trace attribution; this is the rerunnable form).

Chains are long (marginal over 40 steps) because several stages run tens of
microseconds — shorter chains disappear into tunnel noise.

Usage: python benchmarks/bench_stages.py [stage ...]
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
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    from jax import lax

    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models import unet
    from robosat_tpu.models.layers import CONV_DIMS, max_pool, space_to_depth4
    from robosat_tpu.models.resnet import RESNET50_STAGES, stem_folded_s2d4
    from robosat_tpu.parallel.steps import _normalize_s2d4

    device = jax.devices()[0]
    batch, side = 8, 576

    params, state = unet.init(0, num_classes=2)
    folded = jax.jit(unet.fold)(params, state)
    rng = np.random.default_rng(0)
    raw48 = space_to_depth4(rng.integers(0, 255, (batch, side, side, 3), dtype=np.uint8))
    amaxes = np.asarray(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, _normalize_s2d4(r), blocked=True))(folded, raw48)
    )
    scales = list(q8.scales_from_amaxes(amaxes))
    qtree = jax.device_put(jax.jit(q8.quantize_unet_folded)(folded), device)

    # Rebuild the per-stage inputs by running _walk once in float and tapping
    # activations. Simpler: recompute segment inputs with a float forward.
    x_bf16 = jax.jit(lambda r: _normalize_s2d4(r).astype(jnp.bfloat16))(jax.device_put(raw48, device))

    relu = jax.nn.relu

    def run_encoder_stage(qtree, out, si, site_base):
        sites = iter(scales[site_base:])

        def conv(node, xx, stride=1):
            return q8._int8_conv(node, xx, next(sites), stride=stride, compute_dtype=jnp.bfloat16)

        blocks, _ = RESNET50_STAGES[si]
        name = "layer{}".format(si + 1)
        for bi in range(blocks):
            qb = qtree["encoder"][name][bi]
            stride = 2 if (bi == 0 and si > 0) else 1
            inner = relu(conv(qb["conv1"], out))
            inner = relu(conv(qb["conv2"], inner, stride=stride))
            inner = conv(qb["conv3"], inner)
            shortcut = conv(qb["down_conv"], out, stride=stride) if "down_conv" in qb else out
            out = relu(inner + shortcut)
        return out

    # Site bookkeeping: encoder stages consume 3*blocks + n_down sites in order.
    stage_sites = []
    base = 0
    for si, (blocks, _) in enumerate(RESNET50_STAGES):
        stage_sites.append(base)
        base += 3 * blocks + 1  # every stage's first block has a downsample
    dec_site_base = base  # center, dec0..dec5 consume one site each

    # Precompute stage inputs (float path, cheap, once).
    @jax.jit
    def stage_inputs(qtree, x):
        out = stem_folded_s2d4(qtree["encoder"]["conv1"], x)
        stem = out
        skips = []
        sites = q8._Sites(scales=list(scales))
        for si in range(4):
            base = stage_sites[si]
            s = iter(scales[base:])

            def conv(node, xx, stride=1):
                return q8._int8_conv(node, xx, next(s), stride=stride, compute_dtype=jnp.bfloat16)

            blocks, _ = RESNET50_STAGES[si]
            name = "layer{}".format(si + 1)
            for bi in range(blocks):
                qb = qtree["encoder"][name][bi]
                stride = 2 if (bi == 0 and si > 0) else 1
                inner = relu(conv(qb["conv1"], out))
                inner = relu(conv(qb["conv2"], inner, stride=stride))
                inner = conv(qb["conv3"], inner)
                shortcut = conv(qb["down_conv"], out, stride=stride) if "down_conv" in qb else out
                out = relu(inner + shortcut)
            skips.append(out)
        return stem, skips

    stem_out, (enc1, enc2, enc3, enc4) = stage_inputs(qtree, x_bf16)
    jax.block_until_ready(enc4)

    def up_block_fn(name, si):
        def f(qtree, xx):
            return relu(
                q8._int8_conv(
                    qtree[name], xx, scales[si], padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
                    compute_dtype=jnp.bfloat16,
                )
            )

        return f

    def s2d_block_fn(name, si):
        def f(qtree, xx):
            return relu(q8._int8_conv(qtree[name], xx, scales[si], compute_dtype=jnp.bfloat16))

        return f

    # Decoder segment inputs.
    @jax.jit
    def dec_inputs(qtree, enc1, enc2, enc3, enc4):
        pooled = max_pool(enc4, window=2, stride=2, padding=0)
        center = up_block_fn("center", dec_site_base + 0)(qtree, pooled)
        dec0 = up_block_fn("dec0", dec_site_base + 1)(qtree, jnp.concatenate([enc4, center], axis=-1))
        dec1 = up_block_fn("dec1", dec_site_base + 2)(qtree, jnp.concatenate([enc3, dec0], axis=-1))
        dec2 = up_block_fn("dec2", dec_site_base + 3)(qtree, jnp.concatenate([enc2, dec1], axis=-1))
        dec3 = up_block_fn("dec3", dec_site_base + 4)(qtree, jnp.concatenate([enc1, dec2], axis=-1))
        dec4 = s2d_block_fn("dec4", dec_site_base + 5)(qtree, dec3)
        return pooled, center, dec0, dec1, dec2, dec3, dec4

    pooled, center, dec0, dec1, dec2, dec3, dec4 = dec_inputs(qtree, enc1, enc2, enc3, enc4)
    jax.block_until_ready(dec4)

    STAGES = {
        "stem": (lambda qt, x: stem_folded_s2d4(qt["encoder"]["conv1"], x), x_bf16),
        "layer1": (lambda qt, x: run_encoder_stage(qt, x, 0, stage_sites[0]), stem_out),
        "layer2": (lambda qt, x: run_encoder_stage(qt, x, 1, stage_sites[1]), enc1),
        "layer3": (lambda qt, x: run_encoder_stage(qt, x, 2, stage_sites[2]), enc2),
        "layer4": (lambda qt, x: run_encoder_stage(qt, x, 3, stage_sites[3]), enc3),
        "center": (up_block_fn("center", dec_site_base + 0), pooled),
        "dec0": (up_block_fn("dec0", dec_site_base + 1), jnp.concatenate([enc4, center], axis=-1)),
        "dec1": (up_block_fn("dec1", dec_site_base + 2), jnp.concatenate([enc3, dec0], axis=-1)),
        "dec2": (up_block_fn("dec2", dec_site_base + 3), jnp.concatenate([enc2, dec1], axis=-1)),
        "dec3": (up_block_fn("dec3", dec_site_base + 4), jnp.concatenate([enc1, dec2], axis=-1)),
        "dec4": (s2d_block_fn("dec4", dec_site_base + 5), dec3),
        "dec5": (s2d_block_fn("dec5", dec_site_base + 6), dec4),
    }

    names = sys.argv[1:] or list(STAGES)
    results = {}
    for name in names:
        fn, inp = STAGES[name]
        inp = jax.device_put(inp, device)

        @jax.jit
        def step(qt, x, salt, fn=fn):
            xx = x + (salt.astype(jnp.float32) * 1e-30).astype(x.dtype)
            out = fn(qt, xx)
            return jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) & jnp.int32(0x7FFFFFF)

        def run_chain(k, step=step, inp=inp):
            salt = jnp.int32(1)
            for _ in range(k):
                salt = step(qtree, inp, salt)
            return int(salt)

        try:
            run_chain(2)
            t_short = min(_timed(run_chain, 4) for _ in range(5))
            t_long = min(_timed(run_chain, 44) for _ in range(5))
            per = max((t_long - t_short) / 40, 1e-9)
        except Exception as e:  # noqa: BLE001
            results[name] = "FAIL: {}".format(str(e)[:160])
            print(name, results[name], flush=True)
            continue
        results[name] = round(per * 1e3, 3)
        print(name, results[name], "ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
