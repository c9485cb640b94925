"""`rs masks` ensemble soft-voting against a hand-computed expectation."""

import argparse
import os

import numpy as np
from PIL import Image

from robosat_tpu.colors import continuous_palette_for_color
from robosat_tpu.ops.quantize import ANCHORS
from robosat_tpu.tools import masks


def _write_prob(root, tile, quantized):
    z, x, y = tile
    d = os.path.join(root, str(z), str(x))
    os.makedirs(d, exist_ok=True)
    img = Image.fromarray(quantized, mode="P")
    img.putpalette(continuous_palette_for_color("pink", 256))
    img.save(os.path.join(d, "{}.png".format(y)))


def test_weighted_softvote_ensemble(tmp_path):
    rng = np.random.default_rng(0)
    tile = (18, 5, 7)
    q1 = rng.integers(1, 256, (32, 32), np.uint8)
    q2 = rng.integers(1, 256, (32, 32), np.uint8)

    _write_prob(str(tmp_path / "p1"), tile, q1)
    _write_prob(str(tmp_path / "p2"), tile, q2)

    masks.main(
        argparse.Namespace(
            masks=str(tmp_path / "out"),
            probs=[str(tmp_path / "p1"), str(tmp_path / "p2")],
            weights=[2.0, 1.0],
        )
    )

    got = np.array(Image.open(tmp_path / "out" / "18" / "5" / "7.png").convert("P"))

    # Hand-computed: un-quantize, weighted-average fg prob, threshold at 0.5.
    fg = (2.0 * ANCHORS[q1] + 1.0 * ANCHORS[q2]) / 3.0
    expected = (fg > 0.5).astype(np.uint8)
    # argmax([bg, fg]) picks fg when fg > bg, i.e. fg > 0.5; exact ties pick bg.
    np.testing.assert_array_equal(got, expected)


def test_unweighted_matches_mean(tmp_path):
    tile = (18, 1, 1)
    q1 = np.full((16, 16), 200, np.uint8)  # fg ~0.78
    q2 = np.full((16, 16), 50, np.uint8)  # fg ~0.19
    _write_prob(str(tmp_path / "p1"), tile, q1)
    _write_prob(str(tmp_path / "p2"), tile, q2)

    masks.main(
        argparse.Namespace(masks=str(tmp_path / "out"), probs=[str(tmp_path / "p1"), str(tmp_path / "p2")], weights=None)
    )
    got = np.array(Image.open(tmp_path / "out" / "18" / "1" / "1.png").convert("P"))
    # mean fg ~ (0.78 + 0.19)/2 < 0.5 -> background everywhere
    assert (got == 0).all()

def test_saturated_foreground_unwrap(tmp_path):
    """Index 0 = the p == 1.0 digitize wrap (it is unreachable any other way:
    p == 0.0 lands on index 1) and MUST come back as foreground. The
    reference reads it as fg = 0.0, deleting saturated blob interiors
    (docs/PARITY.md known deviation)."""
    from robosat_tpu.ops.quantize import quantize_probs

    # Pin the premise first: only p == 1.0 reaches index 0.
    import jax.numpy as jnp

    q = np.asarray(quantize_probs(jnp.asarray([0.0, 1e-9, 0.5, 1.0 - 1e-7, 1.0], jnp.float32)))
    assert q[0] == 1 and q[-1] == 0 and np.all(q[1:-1] != 0)

    tile = (18, 5, 9)
    quantized = np.zeros((32, 32), np.uint8)   # all saturated foreground
    quantized[:4] = 1                          # a band of saturated background
    _write_prob(str(tmp_path / "p"), tile, quantized)
    masks.main(argparse.Namespace(masks=str(tmp_path / "out"), probs=[str(tmp_path / "p")], weights=None))
    got = np.array(Image.open(tmp_path / "out" / "18" / "5" / "9.png").convert("P"))
    assert np.all(got[:4] == 0)
    assert np.all(got[4:] == 1)
