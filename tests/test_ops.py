"""Op tests: losses vs torch/numpy oracles, metrics, augmentation, quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.ops.augment import augment_batch, center_crop, normalize
from robosat_tpu.ops.losses import cross_entropy_loss, focal_loss, get_loss, lovasz_loss, miou_loss
from robosat_tpu.ops.metrics import Metrics, confusion_counts
from robosat_tpu.ops.quantize import quantize_probs, softmax_quantize, unquantize_probs


def _random_batch(seed, n=2, hw=8, c=2):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, hw, hw, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(n, hw, hw))
    return logits, targets


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    logits, targets = _random_batch(0)
    weight = np.array([1.6248, 5.762827], dtype=np.float32)

    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets), weight))

    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(targets.astype(np.int64))
    ref = torch.nn.NLLLoss(torch.from_numpy(weight))(torch.nn.functional.log_softmax(tl, dim=1), tt)
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_focal_matches_torch():
    torch = pytest.importorskip("torch")
    logits, targets = _random_batch(1)
    weight = np.array([1.0, 3.0], dtype=np.float32)

    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), weight, gamma=2.0))

    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(targets.astype(np.int64))
    penalty = (1 - torch.nn.functional.softmax(tl, dim=1)) ** 2
    ref = torch.nn.NLLLoss(torch.from_numpy(weight))(penalty * torch.nn.functional.log_softmax(tl, dim=1), tt)
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_miou_loss_bounds_and_floor():
    logits, targets = _random_batch(2)
    weight = np.array([1.0, 1.0], dtype=np.float32)
    v = float(miou_loss(jnp.asarray(logits), jnp.asarray(targets), weight))
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets), weight))
    assert v >= ce - 1e-6  # max(miou, nll) floor

    # Near-perfect predictions drive the soft-IoU loss toward zero.
    perfect = np.zeros((1, 8, 8, 2), np.float32)
    t = np.zeros((1, 8, 8), np.int64)
    t[0, :4] = 1
    perfect[..., 1] = np.where(t == 1, 20.0, -20.0)[0]
    perfect[..., 0] = -perfect[..., 1]
    v = float(miou_loss(jnp.asarray(perfect), jnp.asarray(t), weight))
    assert v < 1e-3


def test_lovasz_matches_numpy_oracle():
    logits, targets = _random_batch(3)

    ours = float(lovasz_loss(jnp.asarray(logits), jnp.asarray(targets)))

    # Independent numpy evaluation of the Lovasz hinge on the per-sample
    # C*H*W flattening (the reference's unusual layout, robosat/losses.py:103).
    n, h, w, c = logits.shape
    onehot = np.eye(c, dtype=np.float32)[targets]  # NHWC
    flat_in = np.transpose(logits, (0, 3, 1, 2)).reshape(n, -1)
    flat_m = np.transpose(onehot, (0, 3, 1, 2)).reshape(n, -1)

    total = 0.0
    for m, x in zip(flat_m, flat_in):
        errors = 1.0 - (2.0 * m - 1.0) * x
        order = np.argsort(-errors, kind="stable")
        es, ls = errors[order], m[order]
        inter = ls.sum() - np.cumsum(ls)
        union = ls.sum() + np.cumsum(1.0 - ls)
        iou = 1.0 - inter / union
        iou[1:] = iou[1:] - iou[:-1]
        total += float(np.dot(np.maximum(es, 0.0), iou))
    expected = total / n
    assert ours == pytest.approx(expected, rel=1e-4)


def test_lovasz_custom_vjp_matches_autodiff_exactly():
    """The shipped loss computes its gradient with a custom VJP (the Lovasz
    coefficients are constants w.r.t. the logits — robosat/losses.py treats
    them exactly so). Pin value AND gradient bit-identical to plain autodiff
    through the sort/cumsum formulation, including under heavy ties (relu'
    convention at 0) — the case that would expose a permutation-handling bug."""
    import jax

    def autodiff_formulation(logits, targets):
        n, h, w, c = logits.shape
        masks = jax.nn.one_hot(targets, c, dtype=logits.dtype)
        flat_in = jnp.transpose(logits, (0, 3, 1, 2)).reshape(n, -1)
        flat_m = jnp.transpose(masks, (0, 3, 1, 2)).reshape(n, -1)

        def per_sample(mask, inp):
            errors = 1.0 - (mask * 2.0 - 1.0) * inp
            neg_sorted, labels_sorted = jax.lax.sort((-errors, mask), num_keys=1, is_stable=True)
            errors_sorted = -neg_sorted
            total = jnp.sum(labels_sorted)
            inter = total - jnp.cumsum(labels_sorted)
            union = total + jnp.cumsum(1.0 - labels_sorted)
            iou = 1.0 - inter / union
            grad = jnp.concatenate([iou[:1], iou[1:] - iou[:-1]])
            return jnp.dot(jax.nn.relu(errors_sorted), grad)

        return jnp.mean(jax.vmap(per_sample)(flat_m, flat_in))

    rng = np.random.default_rng(7)
    for ties in (False, True):
        logits = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
        if ties:
            logits = np.round(logits * 2) / 2  # many exactly-equal errors
        targets = rng.integers(0, 2, (2, 16, 16))
        v_new, g_new = jax.value_and_grad(lovasz_loss)(jnp.asarray(logits), jnp.asarray(targets))
        v_ref, g_ref = jax.value_and_grad(autodiff_formulation)(jnp.asarray(logits), jnp.asarray(targets))
        assert float(v_new) == float(v_ref)
        assert float(jnp.max(jnp.abs(g_new - g_ref))) == 0.0


def test_lovasz_perfect_prediction_near_zero():
    t = np.zeros((1, 8, 8), np.int64)
    t[0, :4] = 1
    logits = np.zeros((1, 8, 8, 2), np.float32)
    logits[..., 1] = np.where(t == 1, 50.0, -50.0)[0]
    logits[..., 0] = -logits[..., 1]
    assert float(lovasz_loss(jnp.asarray(logits), jnp.asarray(t))) == pytest.approx(0.0, abs=1e-6)


def test_get_loss_names():
    for name in ("CrossEntropy", "Focal", "mIoU", "Lovasz"):
        assert callable(get_loss(name))
    with pytest.raises(ValueError):
        get_loss("Dice")


def test_confusion_counts_and_metrics():
    # 2x2: pred [[1,0],[1,0]], actual [[1,0],[0,1]] -> tp=1 tn=1 fp=1 fn=1
    outputs = np.zeros((1, 2, 2, 2), np.float32)
    outputs[0, :, :, 1] = [[5, -5], [5, -5]]
    masks = np.array([[[1, 0], [0, 1]]])
    tn, fn, fp, tp = np.asarray(confusion_counts(jnp.asarray(outputs), jnp.asarray(masks)))
    assert (tn, fn, fp, tp) == (1, 1, 1, 1)

    m = Metrics(range(2))
    m.add(masks[0], outputs[0])
    assert m.get_fg_iou() == pytest.approx(1 / 3)
    assert m.get_miou() == pytest.approx(1 / 3)  # symmetric counts
    assert m.get_mcc() == pytest.approx(0.0)


def test_quantize_digitize_parity():
    probs = np.array([0.0, 0.25, 0.5, 0.999, 1.0], dtype=np.float32)
    ours = np.asarray(quantize_probs(jnp.asarray(probs)))
    anchors = np.linspace(0, 1, 256)
    ref = np.digitize(probs, anchors).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)
    assert ours[-1] == 0  # the p=1.0 wraparound quirk


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    probs = rng.uniform(0, 1, 1000).astype(np.float32)
    q = np.asarray(quantize_probs(jnp.asarray(probs)))
    back = np.asarray(unquantize_probs(jnp.asarray(q)))
    # Within one quantization bin except the wraparound at p ~ 1.0.
    keep = probs < 0.999
    assert np.abs(back[keep] - probs[keep]).max() < 1 / 255 + 1e-6


def test_softmax_quantize_shapes():
    logits, _ = _random_batch(4)
    q = np.asarray(softmax_quantize(jnp.asarray(logits)))
    assert q.shape == (2, 8, 8)
    assert q.dtype == np.uint8


def test_normalize():
    img = np.full((1, 4, 4, 3), 255, np.uint8)
    out = np.asarray(normalize(jnp.asarray(img)))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_augment_preserves_alignment():
    """Image and mask transform jointly: a marker pixel stays co-located."""
    n, s = 8, 16
    images = np.zeros((n, s, s, 3), np.float32)
    masks = np.zeros((n, s, s), np.int32)
    rng_np = np.random.default_rng(0)
    coords = rng_np.integers(0, s, size=(n, 2))
    for i, (r, c) in enumerate(coords):
        images[i, r, c] = 1.0
        masks[i, r, c] = 1

    out_img, out_mask = augment_batch(jax.random.PRNGKey(7), jnp.asarray(images), jnp.asarray(masks))
    out_img, out_mask = np.asarray(out_img), np.asarray(out_mask)

    for i in range(n):
        img_pos = np.argwhere(out_img[i, :, :, 0] == 1.0)
        mask_pos = np.argwhere(out_mask[i] == 1)
        assert len(img_pos) == 1 and len(mask_pos) == 1
        np.testing.assert_array_equal(img_pos, mask_pos)


def test_augment_varies_with_key():
    images = np.arange(4 * 8 * 8 * 3, dtype=np.float32).reshape(4, 8, 8, 3)
    masks = np.zeros((4, 8, 8), np.int32)
    a, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(masks))
    b, _ = augment_batch(jax.random.PRNGKey(1), jnp.asarray(images), jnp.asarray(masks))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # Same key -> deterministic.
    a2, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(masks))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))


def test_center_crop():
    x = np.arange(6 * 6).reshape(6, 6)
    c = np.asarray(center_crop(jnp.asarray(x), 4))
    np.testing.assert_array_equal(c, x[1:5, 1:5])
