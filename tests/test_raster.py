"""Rasterization and tile-cover tests (reference: tests/tools/test_rasterize.py)."""

import numpy as np

from robosat_tpu.geo import tilemath
from robosat_tpu.geo.raster import burn_tiles, fill_rings, rasterize_polygons
from robosat_tpu.geo.tilemath import Tile


def _tile_polygon_feature(tile, inset=0.25):
    """A GeoJSON feature covering the middle of a tile (in lon/lat)."""
    west, south, east, north = tilemath.bounds(tile)
    dx, dy = (east - west) * inset, (north - south) * inset
    ring = [
        [west + dx, south + dy],
        [east - dx, south + dy],
        [east - dx, north - dy],
        [west + dx, north - dy],
        [west + dx, south + dy],
    ]
    return {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [ring]}, "properties": {}}


def test_fill_rings_square():
    out = np.zeros((10, 10), dtype=np.uint8)
    ring = np.array([(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)])
    fill_rings([ring], out, value=1)
    assert out[5, 5] == 1
    assert out[1, 1] == 0
    assert out.sum() == 36  # pixel centers strictly inside [2,8)x[2,8)


def test_fill_rings_hole():
    out = np.zeros((20, 20), dtype=np.uint8)
    outer = np.array([(1.0, 1.0), (19.0, 1.0), (19.0, 19.0), (1.0, 19.0)])
    inner = np.array([(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0)])
    fill_rings([outer, inner], out, value=1)
    assert out[10, 10] == 0  # inside the hole
    assert out[3, 3] == 1


def test_rasterize_in_tile_with_feature():
    tile = Tile(70762, 104119, 18)
    feat = _tile_polygon_feature(tile)

    # Mirror the tool: project to 3857 then burn over xy_bounds.
    from robosat_tpu.geo.proj import wgs_to_webmercator

    ring = np.asarray(feat["geometry"]["coordinates"][0])
    xs, ys = wgs_to_webmercator(ring[:, 0], ring[:, 1])
    geometry = {"type": "Polygon", "coordinates": [np.stack([xs, ys], axis=1).tolist()]}

    burned = rasterize_polygons([(geometry, 1)], (512, 512), tilemath.xy_bounds(tile))
    assert burned.shape == (512, 512)
    assert burned.sum() > 0
    # Roughly half the tile area (the middle 50% square).
    assert 0.2 < burned.mean() < 0.3


def test_rasterize_tile_without_feature():
    tile_with = Tile(70762, 104119, 18)
    tile_without = Tile(69623, 104946, 18)
    feat = _tile_polygon_feature(tile_with)

    from robosat_tpu.geo.proj import wgs_to_webmercator

    ring = np.asarray(feat["geometry"]["coordinates"][0])
    xs, ys = wgs_to_webmercator(ring[:, 0], ring[:, 1])
    geometry = {"type": "Polygon", "coordinates": [np.stack([xs, ys], axis=1).tolist()]}

    burned = rasterize_polygons([(geometry, 1)], (512, 512), tilemath.xy_bounds(tile_without))
    assert burned.sum() == 0


def test_burn_tiles_covers_feature_tile():
    tile = Tile(70762, 104119, 18)
    feat = _tile_polygon_feature(tile)
    tiles = burn_tiles(feat, 18)
    assert tile in tiles
    # Feature is strictly inside one tile: cover is exactly that tile.
    assert set(tiles) == {tile}


def test_burn_tiles_spanning_feature():
    # A feature spanning two adjacent tiles covers both.
    t1 = Tile(70762, 104119, 18)
    t2 = Tile(70763, 104119, 18)
    w1 = tilemath.bounds(t1)
    w2 = tilemath.bounds(t2)
    ring = [
        [w1.west + (w1.east - w1.west) * 0.5, w1.south + (w1.north - w1.south) * 0.4],
        [w2.west + (w2.east - w2.west) * 0.5, w2.south + (w2.north - w2.south) * 0.4],
        [w2.west + (w2.east - w2.west) * 0.5, w2.south + (w2.north - w2.south) * 0.6],
        [w1.west + (w1.east - w1.west) * 0.5, w1.south + (w1.north - w1.south) * 0.6],
        [w1.west + (w1.east - w1.west) * 0.5, w1.south + (w1.north - w1.south) * 0.4],
    ]
    feat = {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [ring]}}
    tiles = set(burn_tiles(feat, 18))
    assert t1 in tiles and t2 in tiles
