"""Per-op trace attribution for the compiled train step (VERDICT r2 item 5).

Runs a dependent chain of full `rs train` steps (augment + forward + loss +
grads + Adam + in-graph confusion counts, donated buffers) under
jax.profiler.trace and prints the xplane per-op table, so the non-conv time
(BN stats, augmentation, loss sort, optimizer) gets the same HLO-verified
budget docs/PERF.md built for predict. Reference hot loop:
robosat/tools/train.py:171-194.

Usage: python benchmarks/profile_train.py [--batch 16] [--loss Lovasz]
       [--remat] [--steps 6] [--fp32]
"""

import glob
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import optax

    from robosat_tpu.models import unet
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--loss", default="Lovasz")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    cli = ap.parse_args()
    batch, size, steps, loss_name, remat = cli.batch, cli.size, cli.steps, cli.loss, cli.remat
    # ship parity: config/model-unet.toml bf16=true
    dtype = jnp.float32 if cli.fp32 else jnp.bfloat16

    device = jax.devices()[0]
    params, state = unet.init(0, num_classes=2)
    optimizer = optax.adam(1e-4)
    loss_fn = get_loss(loss_name)
    weight = np.asarray([1.6248, 5.762827], np.float32)

    step = make_train_step(
        unet, loss_fn, optimizer, weight=weight, augment=True, remat=remat, compute_dtype=dtype
    )

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8), device)
    masks = jax.device_put(rng.integers(0, 2, (batch, size, size)).astype(np.int32), device)

    def run_chain(k, p, s, o):
        kk = jax.random.PRNGKey(0)
        loss = None
        for i in range(k):
            p, s, o, loss, _ = step(p, s, o, jax.random.fold_in(kk, i), images, masks)
        return float(loss)

    p = jax.device_put(params, device)
    s = jax.device_put(state, device)
    o = jax.device_put(optimizer.init(params), device)
    run_chain(1, p, s, o)  # compile + warmup (donated args: re-put below)

    trace_dir = "/tmp/train_trace"
    p = jax.device_put(params, device)
    s = jax.device_put(state, device)
    o = jax.device_put(optimizer.init(params), device)
    with jax.profiler.trace(trace_dir):
        run_chain(steps, p, s, o)

    pbs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        print("no xplane.pb produced under", trace_dir)
        return
    here = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "xplane.py"), pbs[-1]], capture_output=True, text=True
    )
    print(out.stdout)
    print(
        "NOTE: divide op totals by steps={} for per-step ms; batch={} size={} loss={} remat={} dtype={}".format(
            steps, batch, size, loss_name, remat, jnp.dtype(dtype).name
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
