"""Strip-buffered prediction must reproduce per-tile buffered outputs exactly."""

import argparse

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.data.datasets import BufferedSlippyMapDirectory, StripBufferedSlippyMapDirectory
from robosat_tpu.geo.tilemath import Tile


@pytest.fixture(scope="module")
def column_dataset(tmp_path_factory):
    """A 2-column slippy set with a gap in y (forces run splitting)."""
    root = tmp_path_factory.mktemp("strips")
    rng = np.random.default_rng(0)
    tiles = [(18, 100, y) for y in (50, 51, 52, 53, 55)] + [(18, 101, 50), (18, 101, 51)]
    for z, x, y in tiles:
        d = root / str(z) / str(x)
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(d / "{}.png".format(y))
    return root


def test_strip_grouping(column_dataset):
    ds = StripBufferedSlippyMapDirectory(str(column_dataset), size=64, overlap=8, strip=3)
    groups = [[(t.x, t.y) for t in s] for s in ds.strips]
    # Column 100: run 50-53 chunks into [50,51,52]+[53]; isolated 55 alone.
    assert [(100, 50), (100, 51), (100, 52)] in groups
    assert [(100, 53)] in groups
    assert [(100, 55)] in groups
    assert [(101, 50), (101, 51)] in groups


def test_strip_composite_matches_per_tile(column_dataset):
    size, o, k = 64, 8, 3
    per_tile = BufferedSlippyMapDirectory(str(column_dataset), size=size, overlap=o)
    strips = StripBufferedSlippyMapDirectory(str(column_dataset), size=size, overlap=o, strip=k)

    by_tile = {t: i for i, (t, _) in enumerate(per_tile.tiles)}

    for si in range(len(strips)):
        composite, (strip_tiles, valid) = strips[si]
        assert composite.shape == (k * size + 2 * o, size + 2 * o, 3)
        for i, tile in enumerate(strip_tiles[:valid]):
            single, _ = per_tile[by_tile[tile]]
            window = composite[i * size : i * size + size + 2 * o]
            # Interior rows identical; strip boundary rows may carry real
            # context where per-tile buffering saw a tile the strip also has.
            np.testing.assert_array_equal(window, single, err_msg="tile {}".format(tile))


def test_strip_predict_outputs_match_per_tile(column_dataset, tmp_path):
    """Full rs predict with --strip produces identical PNGs to --strip 1."""
    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.models import unet
    from robosat_tpu.tools import predict

    params, state = unet.init(0, 2)
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(str(ckpt), {"params": params, "state": state}, {"epoch": 1})

    model_toml = tmp_path / "model.toml"
    dataset_toml = tmp_path / "dataset.toml"
    save_config({"common": {"cuda": False, "batch_size": 2, "image_size": 64, "checkpoint": str(tmp_path)}}, str(model_toml))
    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(dataset_toml),
    )

    def run(strip, out):
        predict.main(
            argparse.Namespace(
                batch_size=4,
                checkpoint=str(ckpt),
                overlap=32,
                strip=strip,
                tile_size=64,
                workers=2,
                tiles=str(column_dataset),
                probs=str(out),
                model=str(model_toml),
                dataset=str(dataset_toml),
                profile=None,
            )
        )

    run(1, tmp_path / "probs1")
    run(3, tmp_path / "probs3")

    from robosat_tpu.tiles import tiles_from_slippy_map

    singles = dict(tiles_from_slippy_map(str(tmp_path / "probs1")))
    stripped = dict(tiles_from_slippy_map(str(tmp_path / "probs3")))
    assert set(singles) == set(stripped)
    for tile in singles:
        a = np.array(Image.open(singles[tile]).convert("P"))
        b = np.array(Image.open(stripped[tile]).convert("P"))
        np.testing.assert_array_equal(a, b, err_msg="tile {}".format(tile))
