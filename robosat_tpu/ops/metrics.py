"""Segmentation metrics: in-graph confusion counts + host-side tracker.

The reference tracks tn/fn/fp/tp with a division trick whose fn/fp labels are
swapped internally but whose reported mIoU/fg-IoU/MCC are correct because the
formulas are symmetric under fn<->fp (robosat/metrics.py:27-84 and SURVEY.md
section 2.1). Here the counts use the conventional definitions and reproduce
the same reported values.

`confusion_counts` is pure jnp so it runs inside the jitted train/eval step;
under pjit with a sharded batch the sums become cross-replica reductions
automatically. The host-side `Metrics` accumulator mirrors the reference API.
"""

import math

import jax.numpy as jnp
import numpy as np


def confusion_counts(outputs, masks):
    """Binary confusion counts from NHWC outputs (logits or probs) and NHW masks.

    Returns an int32 array [tn, fn, fp, tp] summed over the whole batch.
    """
    pred = jnp.argmax(outputs, axis=-1)
    actual = masks.astype(pred.dtype)
    tn = jnp.sum((pred == 0) & (actual == 0))
    fn = jnp.sum((pred == 0) & (actual == 1))
    fp = jnp.sum((pred == 1) & (actual == 0))
    tp = jnp.sum((pred == 1) & (actual == 1))
    return jnp.stack([tn, fn, fp, tp]).astype(jnp.int32)


class Metrics:
    """Running binary-segmentation metrics tracker (reference API parity)."""

    def __init__(self, labels=None):
        self.labels = labels
        self.tn = 0
        self.fn = 0
        self.fp = 0
        self.tp = 0

    def add(self, actual, predicted):
        """Add one observation: NHW (or HW) mask + NHWC (or HWC) outputs."""
        outputs = jnp.asarray(predicted)
        masks = jnp.asarray(actual)
        if outputs.ndim == 3:
            outputs = outputs[None]
            masks = masks[None]
        self.add_counts(np.asarray(confusion_counts(outputs, masks)))

    def add_counts(self, counts):
        """Accumulate a [tn, fn, fp, tp] counts vector (from the jitted step)."""
        tn, fn, fp, tp = (int(v) for v in counts)
        self.tn += tn
        self.fn += fn
        self.fp += fp
        self.tp += tp

    def get_miou(self):
        """Mean IoU over background and foreground (nanmean, reference parity)."""
        with np.errstate(invalid="ignore", divide="ignore"):
            bg = _safe_div(self.tn, self.tn + self.fn + self.fp)
            fg = _safe_div(self.tp, self.tp + self.fn + self.fp)
        return float(np.nanmean([bg, fg]))

    def get_fg_iou(self):
        return _safe_div(self.tp, self.tp + self.fn + self.fp)

    def get_mcc(self):
        denom = math.sqrt(
            (self.tp + self.fp) * (self.tp + self.fn) * (self.tn + self.fp) * (self.tn + self.fn)
        )
        if denom == 0:
            return float("nan")
        return (self.tp * self.tn - self.fp * self.fn) / denom


def _safe_div(a, b):
    return float("nan") if b == 0 else a / b
