"""Learnability smoke test: the full compiled train loop must actually learn.

A synthetic task where the foreground is visually separable (bright blobs on
dark background): a few epochs of the real train step must push foreground
IoU far beyond chance — this exercises gradients through the fused decoder,
augmentation alignment, loss semantics, and the optimizer end-to-end.
"""

import jax
import numpy as np
import optax
import pytest

from robosat_tpu.models import unet
from robosat_tpu.ops.losses import get_loss
from robosat_tpu.ops.metrics import Metrics
from robosat_tpu.parallel.steps import make_eval_step, make_train_step


def _make_task(rng, n, size=64):
    """Images with bright rectangles on dark noise; masks mark the rectangles."""
    images = rng.integers(0, 60, (n, size, size, 3)).astype(np.uint8)
    masks = np.zeros((n, size, size), np.int32)
    for i in range(n):
        x0, y0 = rng.integers(4, size - 24, 2)
        w, h = rng.integers(12, 24, 2)
        images[i, y0 : y0 + h, x0 : x0 + w] = rng.integers(180, 255, (h, w, 3))
        masks[i, y0 : y0 + h, x0 : x0 + w] = 1
    return images, masks


@pytest.mark.slow
def test_train_step_learns_separable_task():
    rng = np.random.default_rng(0)
    images, masks = _make_task(rng, n=8)

    params, state = unet.init(0, num_classes=2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    weight = np.array([1.0, 1.0], np.float32)
    train_step = make_train_step(unet, get_loss("CrossEntropy"), optimizer, weight=weight, augment=True)
    eval_step = make_eval_step(unet, get_loss("CrossEntropy"), weight=weight)

    def fg_iou():
        metrics = Metrics(range(2))
        _, counts = eval_step(params, state, images, masks)
        metrics.add_counts(np.asarray(counts))
        return metrics.get_fg_iou()

    before = fg_iou()

    key = jax.random.PRNGKey(0)
    losses = []
    for step_idx in range(20):
        rng_step = jax.random.fold_in(key, step_idx)
        params, state, opt_state, loss, _ = train_step(params, state, opt_state, rng_step, images, masks)
        losses.append(float(loss))

    after = fg_iou()

    assert min(losses[-3:]) < losses[0], "loss should decrease: {} -> {}".format(losses[0], losses[-1])
    # 20 steps land anywhere in ~0.10-0.24 depending on fp rounding (the
    # trajectory is chaotic at this horizon; XLA:CPU codegen differs across
    # host machine types). 6x chance still separates learning from noise.
    # Keep the relative term capped: a lucky random init (before ~0.04+)
    # would make 6*before exceed what 20 steps can reach.
    assert after > 0.08 and after > 3 * before, "fg IoU should be well above chance after training: {} -> {}".format(
        before, after
    )
    # Chance level on this task is ~0.013; 20 steps reach ~0.24. (The longer
    # variant — 16 images, 30 steps — reaches IoU > 0.5; this trimmed version
    # trades headroom for suite runtime.)


def test_train_step_is_deterministic():
    """Two runs from the same seed produce bit-identical parameters — the
    compiled train step has no hidden nondeterminism (augmentation PRNG is
    explicit, reductions are compiled once)."""
    import optax

    from robosat_tpu.models import unet
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_train_step

    rng = np.random.default_rng(11)
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 64, 64)).astype(np.int32)

    def run():
        params, state = unet.init(3, num_classes=2)
        optimizer = optax.adam(1e-4)
        step = make_train_step(unet, get_loss("CrossEntropy"), optimizer, augment=True)
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(9)
        for i in range(3):
            params, state, opt_state, loss, _ = step(params, state, opt_state, jax.random.fold_in(key, i), images, masks)
        return params, float(loss)

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
