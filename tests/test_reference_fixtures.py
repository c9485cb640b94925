"""Golden tests over the reference's real checked-in fixtures.

The reference ships real imagery (jpg/webp), rasterio-produced label tiles,
and a parking GeoJSON under tests/fixtures; its three test files pin the
slippy-walking, dataset, and burn contracts on them
(robosat/tests/test_tiles.py, test_datasets.py, tools/test_rasterize.py).
These tests re-pin those contracts on the same real data — including
pixel-identical rasterization against the fixture labels rasterio produced —
and are skipped when the reference checkout is absent.
"""

import argparse
import json
import os

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.geo.tilemath import Tile
from robosat_tpu.tiles import tiles_from_csv, tiles_from_slippy_map

FIXTURES = "/root/reference/tests/fixtures"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURES), reason="reference fixtures not available")


def _fixture(*parts):
    return os.path.join(FIXTURES, *parts)


def _parking_features():
    with open(_fixture("parking", "features.geojson")) as f:
        fc = json.load(f)
    assert len(fc["features"]) == 2
    return fc


def test_slippy_map_directory_real_fixtures():
    """Walking the real fixture imagery finds the 3 tiles with correct ids and
    paths (robosat/tests/test_tiles.py:9-16)."""
    tiles = list(tiles_from_slippy_map(_fixture("images")))
    assert len(tiles) == 3

    tile, path = tiles[0]
    assert isinstance(tile, Tile)
    assert tile == Tile(69105, 105093, 18)
    assert path == _fixture("images", "18", "69105", "105093.jpg")


def test_tiles_from_csv_real_fixtures():
    """robosat/tests/test_tiles.py:19-25 on the real tiles.csv."""
    tiles = list(tiles_from_csv(_fixture("tiles.csv")))
    assert len(tiles) == 3
    assert tiles[0] == Tile(69623, 104945, 18)


def test_slippy_map_tiles_dataset_real_fixtures():
    """robosat/tests/test_datasets.py:10-25: real 512px jpegs decode through
    the dataset with correct tile ids."""
    from robosat_tpu.data.datasets import SlippyMapTiles

    dataset = SlippyMapTiles(_fixture("images"))
    assert len(dataset) == 3

    image, tile = dataset[0]
    assert tile == Tile(69105, 105093, 18)
    assert image.shape == (512, 512, 3)
    assert image.dtype == np.uint8


def test_concatenation_dataset_real_fixtures():
    """robosat/tests/test_datasets.py:32-52 on real images + labels."""
    from robosat_tpu.data.datasets import SlippyMapTilesConcatenation

    dataset = SlippyMapTilesConcatenation([_fixture("images")], _fixture("labels"))
    assert len(dataset) == 3

    images, mask, tile = dataset[0]
    assert tile == Tile(69105, 105093, 18)
    assert images.shape == (512, 512, 3)
    assert mask.shape == (512, 512)


def test_burn_with_feature():
    """Tile containing a real parking lot rasterizes non-zero
    (robosat/tests/tools/test_rasterize.py:21-35)."""
    from robosat_tpu.tools.rasterize import burn

    rasterized = burn(Tile(70762, 104119, 18), _parking_features()["features"], 512)
    assert rasterized.shape == (512, 512)
    assert np.sum(rasterized) != 0


def test_burn_without_feature():
    """Tile without a parking lot rasterizes all-zero
    (robosat/tests/tools/test_rasterize.py:37-49)."""
    from robosat_tpu.tools.rasterize import burn

    rasterized = burn(Tile(69623, 104946, 18), _parking_features()["features"], 512)
    assert rasterized.shape == (512, 512)
    assert np.sum(rasterized) == 0


def test_feature_to_mercator_spot_check():
    """Projected-x spot check (robosat/tests/tools/test_rasterize.py:53-60)."""
    from robosat_tpu.tools.rasterize import feature_to_mercator

    mercator = next(feature_to_mercator(_parking_features()["features"][0]))
    assert mercator["type"] == "Polygon"
    assert int(mercator["coordinates"][0][0][0]) == -9219757


def test_burn_pixel_identical_to_rasterio_labels():
    """The in-repo scanline rasterizer reproduces the reference's checked-in
    label tiles — which rasterio/GDAL produced from the same GeoJSON
    (robosat/tools/rasterize.py:64-83) — pixel for pixel on all 4 real tiles."""
    from robosat_tpu.tools.rasterize import burn

    features = _parking_features()["features"]
    for tile in tiles_from_csv(_fixture("parking", "tiles.csv")):
        label = np.asarray(Image.open(_fixture("parking", "labels", "18", str(tile.x), "{}.png".format(tile.y))))
        burned = burn(tile, features, 512)
        assert np.array_equal(burned, label), "burn differs from rasterio output on {}".format(tile)


def test_rasterize_tool_end_to_end_real_fixtures(tmp_path):
    """`rs rasterize` over the real GeoJSON + CSV reproduces the reference's
    label tiles byte-for-byte, including the palette and zero tiles."""
    from robosat_tpu.config import save_config
    from robosat_tpu.tools import rasterize

    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    rasterize.main(
        argparse.Namespace(
            features=_fixture("parking", "features.geojson"),
            tiles=_fixture("parking", "tiles.csv"),
            out=str(tmp_path / "out"),
            dataset=str(tmp_path / "dataset.toml"),
            zoom=18,
            size=512,
        )
    )

    for tile in tiles_from_csv(_fixture("parking", "tiles.csv")):
        ref = np.asarray(Image.open(_fixture("parking", "labels", "18", str(tile.x), "{}.png".format(tile.y))))
        got = np.asarray(Image.open(tmp_path / "out" / "18" / str(tile.x) / "{}.png".format(tile.y)))
        assert np.array_equal(got, ref)


def test_features_tool_on_real_parking_labels(tmp_path):
    """`rs features` over the real rasterio-made parking labels (the webp
    tiles' ground truth) extracts valid parking polygons near the fixture
    GeoJSON — real-data coverage of morphology + contours + featurize."""
    from robosat_tpu.config import save_config
    from robosat_tpu.geo.tilemath import bounds
    from robosat_tpu.tools import features

    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    out = tmp_path / "parking.geojson"
    features.main(
        argparse.Namespace(
            type="parking",
            masks=_fixture("parking", "labels"),
            out=str(out),
            dataset=str(tmp_path / "dataset.toml"),
            chunk=4,
        )
    )

    with open(out) as f:
        fc = json.load(f)
    assert fc["type"] == "FeatureCollection"
    # 3 of the 4 fixture label tiles contain parking pixels.
    assert len(fc["features"]) >= 3

    # Every extracted polygon lies inside the union of the fixture tiles.
    tile_bounds = [bounds(t) for t in tiles_from_csv(_fixture("parking", "tiles.csv"))]
    west = min(b[0] for b in tile_bounds)
    south = min(b[1] for b in tile_bounds)
    east = max(b[2] for b in tile_bounds)
    north = max(b[3] for b in tile_bounds)
    for feature in fc["features"]:
        for ring in feature["geometry"]["coordinates"]:
            arr = np.asarray(ring, dtype=np.float64)
            assert np.all(arr[:, 0] >= west - 1e-3) and np.all(arr[:, 0] <= east + 1e-3)
            assert np.all(arr[:, 1] >= south - 1e-3) and np.all(arr[:, 1] <= north + 1e-3)


def test_webp_imagery_decodes_through_buffered_dataset():
    """Real webp imagery flows through buffered prediction compositing."""
    from robosat_tpu.data.datasets import BufferedSlippyMapDirectory

    directory = BufferedSlippyMapDirectory(_fixture("parking", "images"), size=512, overlap=32)
    assert len(directory) == 4
    image, tile = directory[0]
    assert image.shape == (576, 576, 3)
    assert image.dtype == np.uint8
    # The fixture tiles are isolated (no neighbors): the border is nodata=0.
    assert np.all(image[:32] == 0) and np.all(image[:, :32] == 0)
