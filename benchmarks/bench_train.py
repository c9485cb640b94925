"""Train-step throughput sweep on the chip (rerunnable form of the
docs/PERF.md round-2 table).

Measures the FULL compiled train step exactly as `rs train` ships it
(augment on-device + forward + loss + grads + Adam + in-graph confusion
counts, donated buffers) at 512px bf16 across batch {8, 16, 32} x remat
{off, on}, with the dependent-chain/marginal-time methodology bench.py uses
against tunnel noise. Reference hot loop: robosat/tools/train.py:171-194.

Usage: python benchmarks/bench_train.py [--batches 8,16,32] [--size 512]
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
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import optax

    from robosat_tpu.models import unet
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    batches = [8, 16, 32]
    size = 512
    for a in sys.argv[1:]:
        if a.startswith("--batches"):
            batches = [int(v) for v in a.split("=")[1].split(",")]
        if a.startswith("--size"):
            size = int(a.split("=")[1])

    device = jax.devices()[0]
    params, state = unet.init(0, num_classes=2)
    optimizer = optax.adam(1e-4)
    loss_fn = get_loss("Lovasz")  # the reference default (config/model-unet.toml)
    weight = np.asarray([1.6248, 5.762827], np.float32)

    rng = np.random.default_rng(0)
    results = {}
    for batch in batches:
        images = jax.device_put(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8), device)
        masks = jax.device_put(rng.integers(0, 2, (batch, size, size)).astype(np.int32), device)
        for remat in (False, True):
            key = "b{}{}".format(batch, "/remat" if remat else "")
            try:
                step = make_train_step(
                    unet, loss_fn, optimizer, weight=weight, augment=True, remat=remat,
                    compute_dtype=jnp.bfloat16,  # ship parity: config/model-unet.toml bf16=true
                )
                carried = [
                    jax.device_put(params, device),
                    jax.device_put(state, device),
                    jax.device_put(optimizer.init(params), device),
                ]

                def run_chain(k, carried=carried):
                    # Chain through the full carried state; fetch one scalar.
                    # The step donates params/state/opt_state, so every chain
                    # continues from the PREVIOUS chain's outputs — reusing a
                    # donated handle fails with INVALID_ARGUMENT on this
                    # backend.
                    p, s, o = carried
                    kk = jax.random.PRNGKey(0)
                    loss = None
                    for i in range(k):
                        p, s, o, loss, _ = step(p, s, o, jax.random.fold_in(kk, i), images, masks)
                    carried[:] = [p, s, o]
                    return float(loss)

                run_chain(1)  # compile + warmup
                # Pairwise marginals, best positive (see bench.py: robust to
                # tunnel latency drift between the short and long chains).
                margins = []
                for _ in range(3):
                    t_s = _timed(run_chain, 1)
                    t_l = _timed(run_chain, 5)
                    margins.append((t_l - t_s) / 4)
                positive = [m for m in margins if m > 0]
                if not positive:
                    results[key] = {"error": "all margins non-positive: {}".format(margins)}
                    print(key, results[key], flush=True)
                    continue
                per = min(positive)
                results[key] = {"ms_per_step": round(per * 1e3, 1), "img_per_s": round(batch / per, 1)}
            except Exception as e:  # noqa: BLE001
                results[key] = {"error": str(e)[:160]}
            print(key, results[key], flush=True)

    print(json.dumps({"metric": "train_img_per_sec_512px", "sweep": results}))


if __name__ == "__main__":
    main()
