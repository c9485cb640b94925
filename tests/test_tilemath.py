"""Tile math parity tests (values cross-checked against the slippy-map spec)."""

import math

from robosat_tpu.geo import tilemath
from robosat_tpu.geo.tilemath import Tile


def test_bounds_roundtrip():
    t = Tile(69623, 104945, 18)
    west, south, east, north = tilemath.bounds(t)
    assert west < east and south < north
    # The tile containing the bounds' center is the tile itself.
    assert tilemath.tile((west + east) / 2, (south + north) / 2, 18) == t
    # Corners map back to this tile or its direct neighbors.
    assert tilemath.tile(west + 1e-9, south + 1e-9, 18) == t


def test_tile_zero_zoom():
    assert tilemath.tile(0.0, 0.0, 0) == Tile(0, 0, 0)
    b = tilemath.bounds(Tile(0, 0, 0))
    assert math.isclose(b.west, -180.0)
    assert math.isclose(b.east, 180.0)
    assert math.isclose(b.north, tilemath.MAX_LAT)
    assert math.isclose(b.south, -tilemath.MAX_LAT)


def test_xy_bounds_center_tile():
    # At zoom 1, tile (1, 0) covers x in [0, CE/2], y in [0, CE/2].
    b = tilemath.xy_bounds(Tile(1, 0, 1))
    assert math.isclose(b.left, 0.0, abs_tol=1e-6)
    assert math.isclose(b.right, tilemath.CE / 2, rel_tol=1e-12)
    assert math.isclose(b.bottom, 0.0, abs_tol=1e-6)
    assert math.isclose(b.top, tilemath.CE / 2, rel_tol=1e-12)


def test_xy_matches_webmercator_formula():
    x, y = tilemath.xy(-122.4194, 37.7749)  # San Francisco
    assert math.isclose(x, -13627665.0, rel_tol=1e-4)
    assert math.isclose(y, 4547675.0, rel_tol=1e-4)


def test_parent_children():
    t = Tile(69623, 104945, 18)
    p = tilemath.parent(t)
    assert p.z == 17
    assert t in tilemath.children(p)


def test_xy_lnglat_roundtrip():
    lng, lat = -122.4194, 37.7749
    x, y = tilemath.xy(lng, lat)
    lng2, lat2 = tilemath.lnglat(x, y)
    assert math.isclose(lng2, lng, abs_tol=1e-9)
    assert math.isclose(lat2, lat, abs_tol=1e-9)
