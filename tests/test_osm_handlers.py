"""OSM way handlers: building filters, road widths/buffering, storage chunks."""

import json

import numpy as np
import pytest

from robosat_tpu.geo.geometry import shape
from robosat_tpu.osm.building import BuildingHandler
from robosat_tpu.osm.pbf import Node, Way
from robosat_tpu.osm.road import RoadHandler


def _closed_way(wid, tags, coords):
    nodes = [Node(i + 1, lon, lat) for i, (lon, lat) in enumerate(coords)]
    nodes.append(Node(1, coords[0][0], coords[0][1]))
    return Way(wid, tags, nodes)


def _open_way(wid, tags, coords):
    nodes = [Node(i + 1, lon, lat) for i, (lon, lat) in enumerate(coords)]
    return Way(wid, tags, nodes)


SQUARE = [(13.40, 52.52), (13.401, 52.52), (13.401, 52.521), (13.40, 52.521)]


def _collect(handler_cls, ways, tmp_path, **kwargs):
    out = tmp_path / "out.geojson"
    handler = handler_cls(str(out), batch=100, **kwargs)
    for w in ways:
        handler.way(w)
    handler.flush()
    chunks = list(tmp_path.glob("out-*.geojson"))
    features = []
    for c in chunks:
        features.extend(json.loads(c.read_text())["features"])
    return features


def test_building_handler_filters(tmp_path):
    ways = [
        _closed_way(1, {"building": "yes"}, SQUARE),
        _closed_way(2, {"building": "construction"}, SQUARE),  # filtered type
        _closed_way(3, {"building": "yes", "location": "underground"}, SQUARE),  # filtered location
        _open_way(4, {"building": "yes"}, SQUARE),  # not closed
        _closed_way(5, {"amenity": "parking"}, SQUARE),  # not a building
    ]
    features = _collect(BuildingHandler, ways, tmp_path)
    assert len(features) == 1
    assert features[0]["geometry"]["type"] == "Polygon"


def test_road_handler_buffers_centerline(tmp_path):
    line = [(13.40, 52.52), (13.41, 52.52)]
    ways = [
        _open_way(1, {"highway": "residential"}, line),
        _open_way(2, {"highway": "footway"}, line),  # class not in the width table
        _open_way(3, {"building": "yes"}, line),  # not a road
    ]
    features = _collect(RoadHandler, ways, tmp_path)
    assert len(features) == 1
    geom = shape(features[0]["geometry"])
    assert geom.geom_type in ("Polygon", "MultiPolygon")

    # residential, two-way: width = 0 + 3.5 * 2 + 0.75 = 7.75 m. Ribbon area
    # in degrees^2 ~ length_deg * width_deg (caps add a little).
    width_deg = np.degrees(7.75 / RoadHandler.EARTH_MEAN_RADIUS)
    assert geom.area == pytest.approx(0.01 * width_deg, rel=0.1)


def test_road_handler_tag_overrides(tmp_path):
    line = [(13.40, 52.52), (13.41, 52.52)]
    counter = iter(range(100))

    def area_of(tags):
        sub = tmp_path / "case{}".format(next(counter))
        sub.mkdir()
        feats = _collect(RoadHandler, [_open_way(1, tags, line)], sub)
        return shape(feats[0]["geometry"]).area

    base = area_of({"highway": "residential"})
    oneway = area_of({"highway": "residential", "oneway": "yes"})
    assert oneway < base  # half the lanes

    explicit = area_of({"highway": "residential", "width": "20"})
    assert explicit > base  # 20 m beats 7.75 m

    lanes = area_of({"highway": "residential", "lanes": "6"})
    assert lanes > base

    # Invalid numeric tags fall back with a warning, not a crash.
    bad = area_of({"highway": "residential", "lanes": "many", "width": "wide"})
    assert bad == pytest.approx(base, rel=1e-6)


def test_feature_storage_chunking(tmp_path):
    from robosat_tpu.geo import geojson as gj
    from robosat_tpu.osm.core import FeatureStorage

    storage = FeatureStorage(str(tmp_path / "f.geojson"), batch=2)
    for i in range(5):
        storage.add(gj.feature({"type": "Point", "coordinates": [float(i), 0.0]}))
    storage.flush()

    chunks = sorted(tmp_path.glob("f-*.geojson"))
    assert len(chunks) == 3  # 2 + 2 + 1
    total = sum(len(json.loads(c.read_text())["features"]) for c in chunks)
    assert total == 5
