"""Fused prediction head (XLA margin) vs the unfused reference path, and vs
the retired Pallas kernel it replaced (ops/head.py documents the 42x story)."""

import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models.layers import conv_apply
from robosat_tpu.ops.head import fused_prediction_head, pallas_prediction_head
from robosat_tpu.ops.quantize import softmax_quantize


def _reference_head(features, w, b, overlap):
    logits = conv_apply({"w": w}, features, stride=1) + b
    q = softmax_quantize(logits)
    if overlap:
        q = q[:, overlap:-overlap, overlap:-overlap]
    return np.asarray(q)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("overlap", [0, 8])
def test_fused_head_matches_reference(seed, overlap):
    rng = np.random.default_rng(seed)
    n, s, cin = 2, 32, 32
    features = jnp.asarray(rng.normal(size=(n, s, s, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, cin, 2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32) * 0.1)

    expected = _reference_head(features, w, b, overlap)
    got = np.asarray(fused_prediction_head(features, w, b, overlap=overlap))

    assert got.shape == expected.shape
    assert got.dtype == np.uint8
    # sigmoid(margin) vs softmax differ by fp rounding only; allow the
    # knife-edge pixels to land one quantization bin apart.
    diff = np.abs(got.astype(np.int32) - expected.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.99


@pytest.mark.parametrize("overlap", [0, 8])
def test_fused_head_matches_pallas_variant(overlap):
    """The XLA margin head and the Pallas kernel compute the same function
    (same margin + digitize); in fp32 they agree everywhere but bin edges."""
    rng = np.random.default_rng(3)
    n, s, cin = 2, 32, 32
    features = jnp.asarray(rng.normal(size=(n, s, s, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, cin, 2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32) * 0.1)

    got = np.asarray(fused_prediction_head(features, w, b, overlap=overlap))
    pallas = np.asarray(pallas_prediction_head(features, w, b, overlap=overlap))
    diff = np.abs(got.astype(np.int32) - pallas.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.999


def test_fused_head_extremes():
    """Saturated logits hit the quantization extremes incl. the wraparound."""
    n, s, cin = 1, 16, 32
    features = jnp.ones((n, s, s, cin), jnp.float32)
    w = jnp.zeros((1, 1, cin, 2), jnp.float32)

    # Strong foreground: p -> 1.0 -> digitize 256 -> uint8 wrap to 0.
    b_fg = jnp.asarray([-50.0, 50.0], jnp.float32)
    out = np.asarray(fused_prediction_head(features, w, b_fg))
    assert (out == 0).all()

    # Strong background: p -> 0.0 -> digitize 1.
    b_bg = jnp.asarray([50.0, -50.0], jnp.float32)
    out = np.asarray(fused_prediction_head(features, w, b_bg))
    assert (out == 1).all()


def test_fused_head_rejects_multiclass():
    features = jnp.zeros((1, 16, 16, 32), jnp.float32)
    w = jnp.zeros((1, 1, 32, 3), jnp.float32)
    with pytest.raises(AssertionError):
        fused_prediction_head(features, w, jnp.zeros((3,)))


def test_blocked_head_matches_s2d_head():
    """The blocked-output head + host depth-to-space is bit-identical to the
    device-interleaving s2d head."""
    from robosat_tpu.models.layers import depth_to_space2
    from robosat_tpu.ops.head import fused_prediction_head_s2d, fused_prediction_head_s2d_blocked

    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, 24, 24, 128)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(1, 1, 32, 2)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))

    for overlap in (0, 8):
        fine = np.asarray(fused_prediction_head_s2d(feats, w, b, overlap=overlap))
        blocked = np.asarray(fused_prediction_head_s2d_blocked(feats, w, b, overlap=overlap))
        interleaved = depth_to_space2(blocked)[:, :, :, 0]
        assert np.array_equal(interleaved, fine)
