"""Slippy-map substrate contract tests (reference: tests/test_tiles.py)."""

import numpy as np
from PIL import Image

from robosat_tpu.geo.tilemath import Tile
from robosat_tpu.tiles import (
    buffer_tile_image,
    pixel_to_location,
    tiles_from_csv,
    tiles_from_slippy_map,
    unbuffer,
)


def test_slippy_map_directory(slippy_fixtures):
    tiles = list(tiles_from_slippy_map(str(slippy_fixtures / "images")))
    assert len(tiles) == 3
    tile, path = tiles[0]
    assert isinstance(tile, Tile)
    assert path.endswith("18/69623/104945.png")


def test_read_tiles_csv(slippy_fixtures):
    tiles = list(tiles_from_csv(str(slippy_fixtures / "tiles.csv")))
    assert len(tiles) == 3
    assert tiles[0] == Tile(69623, 104945, 18)


def test_pixel_to_location_corners():
    t = Tile(69623, 104945, 18)
    from robosat_tpu.geo.tilemath import bounds

    west, south, east, north = bounds(t)
    assert pixel_to_location(t, 0, 0) == (west, south)
    assert pixel_to_location(t, 1, 1) == (east, north)
    lon, lat = pixel_to_location(t, 0.5, 0.5)
    assert west < lon < east and south < lat < north


def test_buffer_tile_image_composites_neighbors(slippy_fixtures):
    tiles = dict(tiles_from_slippy_map(str(slippy_fixtures / "images")))
    center = Tile(69623, 104945, 18)
    overlap, size = 32, 512

    composite = buffer_tile_image(center, tiles, overlap=overlap, tile_size=size)
    assert composite.shape == (size + 2 * overlap, size + 2 * overlap, 3)

    center_img = np.asarray(Image.open(tiles[center]).convert("RGB"))
    np.testing.assert_array_equal(composite[overlap:-overlap, overlap:-overlap], center_img)

    # The south neighbor (y+1) exists in the fixtures: its top strip must be
    # stitched below the center; the missing west neighbor stays nodata=0.
    south = Tile(69623, 104946, 18)
    south_img = np.asarray(Image.open(tiles[south]).convert("RGB"))
    np.testing.assert_array_equal(composite[-overlap:, overlap:-overlap], south_img[:overlap])
    assert (composite[:overlap, :overlap] == 0).all()

    # The east neighbor (x+1, same y)? fixtures have (69624, 104945).
    east = Tile(69624, 104945, 18)
    east_img = np.asarray(Image.open(tiles[east]).convert("RGB"))
    np.testing.assert_array_equal(composite[overlap:-overlap, -overlap:], east_img[:, :overlap])


def test_unbuffer_crops_overlap():
    probs = np.arange(2 * 10 * 10, dtype=np.float32).reshape(2, 10, 10)
    cropped = unbuffer(probs, 2)
    assert cropped.shape == (2, 6, 6)
    np.testing.assert_array_equal(cropped, probs[:, 2:8, 2:8])
