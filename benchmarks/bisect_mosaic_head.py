"""Bisect the Mosaic compiler crash in qtail's fused head stage (VERDICT r3 #8).

The fused dec4+dec5 Pallas tail compiles and runs on the chip; appending the
margin head (models/qtail._tail_kernel lines 117-128) crashes the tunnel's
remote Mosaic compiler (HTTP 500, tpu_compile_helper exit 1). This script
isolates WHICH head construct kills it by compiling a ladder of standalone
kernels on the real dec5-activation shapes, each adding one construct:

  base     dec5-shaped passthrough (control; must compile)
  mul      + per-channel f32 scale multiply
  reduce   + (S, W, 4, 32) reshape-reduce to the 4 parity margins
  sigmoid  + jax.nn.sigmoid
  digitize + _digitize_exact -> uint8 (S, W, 4) output... but a 4-lane
             minormost uint8 output is itself a known Mosaic killer, so this
             rung pads lanes to 128
  merge    + the (S, W, 4) -> (S, 4W) row-major merge, uint8 output
             (= the shipped _tail_kernel head exactly)

Each rung compiles in a SUBPROCESS: a remote Mosaic crash has been observed
killing the tunnel relay itself (docs/PERF.md round 3), after which PJRT
calls block forever — a subprocess bounds the blast radius and a timeout
marks "hung" distinctly from "crashed". Run this LAST in a session.

Usage: python benchmarks/bisect_mosaic_head.py [--rungs base,mul,...]
Prints one JSON line mapping rung -> ok / crash / hang.
"""

import argparse
import json
import os
import subprocess
import sys

RUNG_SRC = r"""
import sys
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rung = sys.argv[1]
S, W, C = 8, 288, 128  # dec5 activation strip shapes at 576px predict

def kernel(x_ref, wm_ref, bm_ref, sel_ref, o_ref):
    y5 = x_ref[0]
    if rung == "base":
        o_ref[0] = y5
        return
    feats = y5.astype(jnp.float32) * wm_ref[:]
    if rung == "mul":
        o_ref[0] = feats.astype(o_ref.dtype)
        return
    if rung.endswith("_mm"):
        # Workaround for the reshape crash below: the 4 parity margins as a
        # masked matmul over lanes (feats @ sel, sel (128, 4) one-hot blocks)
        # — no lane-dim reshape, MXU does the reduction. Output padded to
        # 128 lanes (a 4-lane minormost output is its own Mosaic killer).
        margin = jax.lax.dot_general(
            feats.reshape(S * W, C), sel_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(S, W, 4) + bm_ref[0]
    else:
        margin = feats.reshape(S, W, 4, 32).sum(axis=-1) + bm_ref[0]
    if rung in ("reduce", "reduce_mm"):
        o_ref[0] = jnp.pad(margin, ((0, 0), (0, 0), (0, 124))).astype(o_ref.dtype)
        return
    p = jax.nn.sigmoid(margin)
    if rung in ("sigmoid", "sigmoid_mm"):
        o_ref[0] = jnp.pad(p, ((0, 0), (0, 0), (0, 124))).astype(o_ref.dtype)
        return
    from robosat_tpu.ops.head import _digitize_exact
    q = _digitize_exact(p).astype(jnp.uint8)
    if rung in ("digitize", "digitize_mm"):
        o_ref[0] = jnp.pad(q, ((0, 0), (0, 0), (0, 124)))
        return
    if rung == "digitize_mm_pad8":
        o_ref[0] = jnp.pad(q, ((0, 0), (0, 0), (0, 4)))
        return
    if rung == "digitize_mm_pad4":
        o_ref[0] = q
        return
    o_ref[0] = q.reshape(S, 4 * W)  # rung == "merge"/"merge_mm"

base_rung = rung[:-3] if rung.endswith("_mm") else rung
if base_rung in ("base", "mul"):
    out = jax.ShapeDtypeStruct((1, S, W, C), jnp.bfloat16)
elif base_rung in ("reduce", "sigmoid"):
    out = jax.ShapeDtypeStruct((1, S, W, 128), jnp.float32)
elif base_rung == "digitize":
    out = jax.ShapeDtypeStruct((1, S, W, 128), jnp.uint8)
elif rung == "digitize_mm_pad8":
    out = jax.ShapeDtypeStruct((1, S, W, 8), jnp.uint8)
elif rung == "digitize_mm_pad4":
    out = jax.ShapeDtypeStruct((1, S, W, 4), jnp.uint8)
else:
    out = jax.ShapeDtypeStruct((1, S, 4 * W), jnp.uint8)

x = jnp.asarray(np.random.default_rng(0).standard_normal((1, S, W, C)), jnp.bfloat16)
wm = jnp.ones((1, C), jnp.float32)
bm = jnp.zeros((1, 4), jnp.float32)
sel_np = np.zeros((C, 4), np.float32)
for k in range(4):
    sel_np[32 * k : 32 * (k + 1), k] = 1.0
sel = jnp.asarray(sel_np)

fn = pl.pallas_call(
    kernel,
    out_shape=out,
    in_specs=[
        pl.BlockSpec(x.shape, lambda: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(wm.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(sel.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(out.shape, lambda: tuple(0 for _ in out.shape), memory_space=pltpu.VMEM),
)
r = jax.jit(fn)(x, wm, bm, sel)
r.block_until_ready()
print("RUNG_OK", np.asarray(r).sum())
"""

ALL_RUNGS = ["base", "mul", "reduce", "sigmoid", "digitize", "merge",
             "reduce_mm", "sigmoid_mm", "digitize_mm", "merge_mm",
             "digitize_mm_pad8", "digitize_mm_pad4"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default=",".join(ALL_RUNGS))
    ap.add_argument("--timeout", type=int, default=600)
    cli = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for rung in cli.rungs.split(","):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", RUNG_SRC, rung],
                timeout=cli.timeout,
                capture_output=True,
                text=True,
                cwd=here,
            )
            if probe.returncode == 0 and "RUNG_OK" in probe.stdout:
                results[rung] = "ok"
            else:
                tail = (probe.stderr or probe.stdout).strip().splitlines()[-3:]
                results[rung] = "crash: " + " | ".join(tail)[-300:]
        except subprocess.TimeoutExpired:
            results[rung] = "hang"
        print("{}: {}".format(rung, results[rung]), file=sys.stderr, flush=True)
        if results[rung] == "hang":
            break  # the relay is likely dead; further rungs would all hang

    print(json.dumps({"metric": "mosaic_head_bisect", "rungs": results}))


if __name__ == "__main__":
    main()
