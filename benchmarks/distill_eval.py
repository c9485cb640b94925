"""Distillation quality evidence: teacher-agreement IoU for the fast family.

VERDICT r3 item 1's "done" bar: ship the compact family with DOCUMENTED
teacher-agreement metrics — mask IoU vs the flagship teacher >= 0.98 on
held-out synthetic tiles. This script produces that number end to end:

1. trains a flagship U-Net teacher on synthetic shape tiles (CE loss) until
   its masks are clean,
2. distills a FastNet student from the folded teacher with the shipped KD
   step (parallel/steps.make_distill_train_step — same code path as
   `rs train --teacher`),
3. reports fg-IoU between student and teacher predicted masks on a held-out
   set, plus each net's IoU against ground truth.

Run: python benchmarks/distill_eval.py [--teacher_steps 300]
     [--distill_steps 800] [--size 128] [--batch 16] [--eval 64]
Prints one JSON line. Needs an accelerator to be quick (CPU works, slowly).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_tiles(rng, n, size):
    """Aerial-ish synthetic tiles: 1-4 bright rectangles/ellipses (fg) over a
    textured background; returns (images u8 (N,S,S,3), masks i32 (N,S,S))."""
    images = rng.integers(40, 90, (n, size, size, 3), dtype=np.int32)
    images += rng.integers(-15, 16, (n, size, size, 1), dtype=np.int32)  # texture
    masks = np.zeros((n, size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        for _ in range(int(rng.integers(1, 5))):
            cy, cx = rng.integers(8, size - 8, 2)
            h, w = rng.integers(6, max(size // 3, 8), 2)
            if rng.random() < 0.5:
                hit = (np.abs(yy - cy) < h // 2) & (np.abs(xx - cx) < w // 2)
            else:
                hit = ((yy - cy) / max(h / 2, 1)) ** 2 + ((xx - cx) / max(w / 2, 1)) ** 2 < 1.0
            masks[i][hit] = 1
            color = rng.integers(150, 240, 3)
            images[i][hit] = color + rng.integers(-10, 11, (int(hit.sum()), 3))
    return np.clip(images, 0, 255).astype(np.uint8), masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_steps", type=int, default=300)
    ap.add_argument("--distill_steps", type=int, default=800)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=0.9)
    ap.add_argument("--temp", type=float, default=2.0)
    cli = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import optax

    from robosat_tpu.models import fastnet, unet
    from robosat_tpu.parallel.steps import make_distill_train_step, make_train_step

    device = jax.devices()[0]
    rng = np.random.default_rng(0)

    # Fixed training pool + held-out eval set.
    pool_images, pool_masks = synth_tiles(rng, 256, cli.size)
    eval_images, eval_masks = synth_tiles(np.random.default_rng(10_000), cli.eval, cli.size)

    def batches(steps, seed):
        order = np.random.default_rng(seed)
        for _ in range(steps):
            sel = order.integers(0, len(pool_images), cli.batch)
            yield pool_images[sel], pool_masks[sel]

    # ---- 1. teacher ------------------------------------------------------
    t0 = time.perf_counter()
    t_params, t_state = unet.init(0, num_classes=2)
    t_opt = optax.adam(1e-3)
    # CE loss via the registry to match `rs train`.
    from robosat_tpu.ops.losses import get_loss

    t_step = make_train_step(
        unet, get_loss("CrossEntropy"), t_opt, compute_dtype=jnp.bfloat16, augment=True
    )
    p = jax.device_put(t_params, device)
    s = jax.device_put(t_state, device)
    o = jax.device_put(t_opt.init(t_params), device)
    key = jax.random.PRNGKey(0)
    loss = None
    for i, (imgs, msks) in enumerate(batches(cli.teacher_steps, seed=1)):
        p, s, o, loss, _ = t_step(p, s, o, jax.random.fold_in(key, i), imgs, msks)
    teacher_loss = float(loss)
    teacher_folded = jax.jit(unet.fold)(p, s)
    teacher_s = time.perf_counter() - t0

    # ---- 2. distill ------------------------------------------------------
    t0 = time.perf_counter()
    s_params, s_state = fastnet.init(1, num_classes=2)
    s_opt = optax.adam(1e-3)
    d_step = make_distill_train_step(
        fastnet, unet, get_loss("CrossEntropy"), s_opt,
        compute_dtype=jnp.bfloat16, augment=True, alpha=cli.alpha, temp=cli.temp,
    )
    sp = jax.device_put(s_params, device)
    ss = jax.device_put(s_state, device)
    so = jax.device_put(s_opt.init(s_params), device)
    for i, (imgs, msks) in enumerate(batches(cli.distill_steps, seed=2)):
        sp, ss, so, loss, _ = d_step(sp, ss, so, teacher_folded, jax.random.fold_in(key, 10_000 + i), imgs, msks)
    distill_loss = float(loss)
    distill_s = time.perf_counter() - t0

    # ---- 3. held-out agreement ------------------------------------------
    from robosat_tpu.ops.augment import normalize

    @jax.jit
    def masks_pair(t_folded, s_folded, raw):
        x = normalize(raw).astype(jnp.bfloat16)
        t_logits = unet.apply_folded(t_folded, x)
        s_logits = fastnet.apply_folded(s_folded, x)
        return jnp.argmax(t_logits, -1).astype(jnp.uint8), jnp.argmax(s_logits, -1).astype(jnp.uint8)

    student_folded = jax.jit(fastnet.fold)(sp, ss)
    t_masks, s_masks = [], []
    for i in range(0, cli.eval, cli.batch):
        tm, sm = masks_pair(teacher_folded, student_folded, eval_images[i : i + cli.batch])
        t_masks.append(np.asarray(tm))
        s_masks.append(np.asarray(sm))
    tm = np.concatenate(t_masks).astype(bool)
    sm = np.concatenate(s_masks).astype(bool)
    gt = eval_masks.astype(bool)

    def iou(a, b):
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        return float(inter / union) if union else 1.0

    print(
        json.dumps(
            {
                "metric": "distill_teacher_agreement_iou",
                "value": round(iou(tm, sm), 4),
                "teacher_gt_iou": round(iou(tm, gt), 4),
                "student_gt_iou": round(iou(sm, gt), 4),
                "teacher_loss": round(teacher_loss, 4),
                "distill_loss": round(distill_loss, 4),
                "teacher_steps": cli.teacher_steps,
                "distill_steps": cli.distill_steps,
                "size": cli.size,
                "batch": cli.batch,
                "eval_tiles": cli.eval,
                "teacher_train_s": round(teacher_s, 1),
                "distill_train_s": round(distill_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
