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


@jax.custom_vjp
def _lovasz_flat(mask, inp):
    """Per-sample Lovasz hinge on flattened (C*H*W,) mask/input vectors.

    Value matches the reference exactly (robosat/losses.py:103-119). The
    custom VJP exists because the Lovasz gradient coefficients depend only
    on the label RANKING — the reference's torch code computes them from the
    sorted LongTensor labels outside autograd, so its backward is simply
    relu'(errors_sorted) * coeffs unpermuted. Letting JAX differentiate the
    sort/cumsum pipeline instead reproduces that same gradient at ~10x the
    cost: a second full-size sort to invert the permutation, reverse-cumsum
    chains, and a dead mask-cotangent path — together they dominated the
    whole train step (docs/PERF.md round 4: 205 ms/step of which the loss
    backward was ~130 ms at batch 16, 512px).
    """
    return _lovasz_fwd(mask, inp)[0]


def _lovasz_fwd(mask, inp):
    errors = 1.0 - (mask * 2.0 - 1.0) * inp
    # One stable sort carries the labels AND the permutation through the
    # order a stable argsort(-errors) would produce — packed into a single
    # s32 payload (label in bit 30, original index below; C*H*W < 2^30) so
    # the bitonic network moves one 4-byte payload instead of two.
    idx = jax.lax.iota(jnp.int32, errors.shape[0])
    packed = idx | (mask.astype(jnp.int32) << 30)
    neg_sorted, packed_sorted = jax.lax.sort((-errors, packed), num_keys=1, is_stable=True)
    errors_sorted = -neg_sorted
    labels_sorted = (packed_sorted >> 30).astype(mask.dtype)
    perm = packed_sorted & ((1 << 30) - 1)

    total = jnp.sum(labels_sorted)
    csum = jnp.cumsum(labels_sorted)
    inter = total - csum
    # cumsum(1 - l) == (k+1) - cumsum(l): one cumsum pass instead of two.
    union = total + (idx.astype(jnp.float32) + 1.0) - csum
    iou = 1.0 - inter / union
    grad = jnp.concatenate([iou[:1], iou[1:] - iou[:-1]])
    loss = jnp.dot(jax.nn.relu(errors_sorted), grad)

    # Invert the permutation by sorting (perm, grad) ascending — one
    # single-key sort; TPU scatter of 5e5 elements measures 3x worse. The
    # relu' test (at 0: 0, torch/JAX convention) applies AFTER unpermuting:
    # errors_sorted[rank(i)] is the same f32 as errors[i], so testing
    # errors > 0 in original order is exact and fuses into the final
    # elementwise pass instead of materializing a bool plane between sorts.
    _, g_orig = jax.lax.sort((perm, grad), num_keys=1)
    # Chain rule through errors = 1 - (2*mask - 1) * inp.
    return loss, (jnp.where(errors > 0, g_orig, 0.0) * -(mask * 2.0 - 1.0),)


def _lovasz_bwd(res, ct):
    (d_inp,) = res
    # mask = one_hot(int targets): no gradient flows past it; zeros keep the
    # custom_vjp contract and DCE away.
    return jnp.zeros_like(d_inp), ct * d_inp


_lovasz_flat.defvjp(_lovasz_fwd, _lovasz_bwd)


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

    return jnp.mean(jax.vmap(_lovasz_flat)(flat_masks, flat_inputs))


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
