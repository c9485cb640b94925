"""Segmentation losses, in-graph (traced under jit/pjit).

Numerical semantics match the reference losses (robosat/losses.py:8-119),
including the quirks worth preserving:

- NLL reductions are weighted means: sum(w[t] * -logp) / sum(w[t]) (torch
  NLLLoss semantics).
- mIoU loss returns max(soft-mIoU loss, NLL) (robosat/losses.py:83).
- Lovasz flattens each sample over C*H*W *together* (not per class as in the
  paper) before sorting — robosat/losses.py:96-119.

Inputs are NHWC logits and NHW integer targets (TPU-native layout; the
reference is NCHW).
"""

import jax
import jax.numpy as jnp


def _gathered_nll(values, targets, weight):
    """Weighted-mean NLL over gathered per-pixel values (already log-space)."""
    gathered = jnp.take_along_axis(values, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if weight is None:
        return -jnp.mean(gathered)
    w = jnp.asarray(weight)[targets]
    return -jnp.sum(w * gathered) / jnp.sum(w)


def cross_entropy_loss(logits, targets, weight=None):
    """CrossEntropyLoss2d: NLL of log-softmax with per-class weights."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return _gathered_nll(logp, targets, weight)


def focal_loss(logits, targets, weight=None, gamma=2.0):
    """FocalLoss2d: (1 - softmax)^gamma penalty on log-softmax, then NLL."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    penalty = (1.0 - jax.nn.softmax(logits, axis=-1)) ** gamma
    return _gathered_nll(penalty * logp, targets, weight)


def miou_loss(logits, targets, weight=None):
    """mIoULoss2d: 1 - mean soft-IoU over (class, sample), floored by NLL."""
    n, h, w, c = logits.shape
    softs = jax.nn.softmax(logits, axis=-1)
    masks = jax.nn.one_hot(targets, c, dtype=softs.dtype)

    inters = jnp.sum((softs * masks).reshape(n, -1, c), axis=1)  # (N, C)
    unions = jnp.sum((softs + masks - softs * masks).reshape(n, -1, c), axis=1)

    miou = 1.0 - jnp.mean(inters / unions)
    return jnp.maximum(miou, cross_entropy_loss(logits, targets, weight))


def lovasz_loss(logits, targets):
    """LovaszLoss2d: Lovasz hinge on the per-sample C*H*W flattening.

    The flattening order matches the reference's NCHW .view(N, -1)
    (robosat/losses.py:103) so tie-breaking in the sort sees the same layout.
    """
    n, h, w, c = logits.shape
    masks = jax.nn.one_hot(targets, c, dtype=logits.dtype)  # NHWC

    # NHWC -> NCHW -> (N, C*H*W), the reference's flatten order.
    flat_inputs = jnp.transpose(logits, (0, 3, 1, 2)).reshape(n, -1)
    flat_masks = jnp.transpose(masks, (0, 3, 1, 2)).reshape(n, -1)

    def per_sample(mask, inp):
        errors = 1.0 - (mask * 2.0 - 1.0) * inp
        # One stable multi-operand sort carries the labels through the same
        # permutation a stable argsort(-errors) would produce; vs argsort +
        # two fancy-index gathers of the C*H*W vector this removes both
        # gathers (and their scatter transposes in the backward pass) from
        # the hot train step.
        neg_sorted, labels_sorted = jax.lax.sort((-errors, mask), num_keys=1, is_stable=True)
        errors_sorted = -neg_sorted

        total = jnp.sum(labels_sorted)
        inter = total - jnp.cumsum(labels_sorted)
        union = total + jnp.cumsum(1.0 - labels_sorted)
        iou = 1.0 - inter / union
        grad = jnp.concatenate([iou[:1], iou[1:] - iou[:-1]])
        return jnp.dot(jax.nn.relu(errors_sorted), grad)

    return jnp.mean(jax.vmap(per_sample)(flat_masks, flat_inputs))


LOSSES = {
    "CrossEntropy": lambda logits, targets, weight: cross_entropy_loss(logits, targets, weight),
    "Focal": lambda logits, targets, weight: focal_loss(logits, targets, weight),
    "mIoU": lambda logits, targets, weight: miou_loss(logits, targets, weight),
    "Lovasz": lambda logits, targets, weight: lovasz_loss(logits, targets),
}


def get_loss(name):
    """Loss fn by config name (robosat/tools/train.py:97-106)."""
    try:
        return LOSSES[name]
    except KeyError:
        raise ValueError("Unknown [opt][loss] value: {}".format(name)) from None
