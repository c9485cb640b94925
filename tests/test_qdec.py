"""Pallas decoder transposed-conv kernel: bit-exactness vs the XLA int8 path.

The per-parity kernel (robosat_tpu.models.qdec) must be BYTE-identical to
models.int8._int8_conv with padding (2,2)/lhs_dilation (2,2): integer conv
accumulation commutes, and the requant epilogue replicates the same f32/bf16
op sequence. Runs in Pallas interpreter mode on CPU (the compiled Mosaic
path is exercised on real TPU hardware by bench.py / rs predict).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models import int8 as q8
from robosat_tpu.models import qdec


def _ref(node, x, s_in):
    return jax.nn.relu(
        q8._int8_conv(node, x, s_in, padding=((2, 2), (2, 2)), lhs_dilation=(2, 2), compute_dtype=jnp.bfloat16)
    )


@pytest.mark.parametrize(
    "cin,cout,h,w,strip",
    [
        (40, 16, 16, 16, 4),  # odd channels, small
        (128, 128, 8, 8, 4),  # lane-aligned (the deployed regime)
        (96, 64, 12, 20, 6),  # non-square, W != H
    ],
)
def test_parity_up_conv_bit_exact(cin, cout, h, w, strip):
    rng = np.random.default_rng(0)
    w3 = rng.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32)
    node = q8._qkernel(q8._fused_k4(jnp.asarray(w3)))
    x = jnp.asarray(rng.normal(0, 1.0, (2, h, w, cin)), jnp.bfloat16)
    s_in = 0.0123

    ref = np.asarray(_ref(node, x, s_in), np.float32)
    got = np.asarray(qdec.parity_up_conv(x, node, s_in, strip_rows=strip, interpret=True), np.float32)
    assert got.shape == (2, 2 * h, 2 * w, cout)
    assert np.array_equal(ref, got), "pallas parity kernel drifted from the int8 reference path"


def test_parity_tap_weights_cover_all_taps():
    """Every K4 tap lands in exactly one (parity, tap) slot."""
    wq = jnp.arange(4 * 4 * 2 * 3, dtype=jnp.int8).reshape(4, 4, 2, 3)
    wp = np.asarray(qdec.parity_tap_weights(wq))
    assert wp.shape == (4, 4, 2, 3)
    # Parity (0, 0) takes k4 rows (0, 2) x cols (0, 2) in tap order.
    expected = np.stack(
        [np.asarray(wq)[0, 0], np.asarray(wq)[0, 2], np.asarray(wq)[2, 0], np.asarray(wq)[2, 2]], axis=0
    )
    assert np.array_equal(wp[0], expected)


def test_parity_up_conv_separated_bit_exact():
    """The separated (space-to-depth2 output) variant equals the interleaved
    kernel's output re-blocked — and therefore the XLA reference too."""
    from robosat_tpu.models.layers import space_to_depth2

    rng = np.random.default_rng(5)
    cin, cout, h, w = 64, 32, 12, 12
    node = {
        "wq": jnp.asarray(rng.integers(-127, 128, (4, 4, cin, cout)), jnp.int8),
        "ws": jnp.asarray(rng.uniform(0.001, 0.01, (cout,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(0, 1.0, (2, h, w, cin)), jnp.bfloat16)
    s_in = 0.02
    fine = qdec.parity_up_conv(x, node, s_in, strip_rows=4, interpret=True)
    want = np.asarray(space_to_depth2(fine), np.float32)
    got = np.asarray(qdec.parity_up_conv_separated(x, node, s_in, strip_rows=4, interpret=True), np.float32)
    assert got.shape == want.shape
    assert int((got != want).sum()) == 0
