"""Spatial core tests: projections, IoU, index, graph."""

import math

import numpy as np
import pytest

from robosat_tpu.geo import proj
from robosat_tpu.geo.geometry import Polygon
from robosat_tpu.graph import UndirectedGraph
from robosat_tpu.spatial.core import iou, make_index, project_ea, project_wgs_el, union


def test_worldmercator_roundtrip():
    lng = np.array([-122.4194, 13.4, 0.0, 179.0])
    lat = np.array([37.7749, 52.52, 0.0, -60.0])
    x, y = proj.wgs_to_worldmercator(lng, lat)
    lng2, lat2 = proj.worldmercator_to_wgs(x, y)
    np.testing.assert_allclose(lng2, lng, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_worldmercator_differs_from_webmercator():
    # EPSG:3395 (ellipsoidal) y differs from EPSG:3857 (spherical) by ~0.3%.
    _, y3395 = proj.wgs_to_worldmercator(np.array([0.0]), np.array([45.0]))
    _, y3857 = proj.wgs_to_webmercator(np.array([0.0]), np.array([45.0]))
    assert y3395[0] < y3857[0]
    assert abs(y3395[0] - y3857[0]) / y3857[0] > 0.001


def test_mollweide_equal_area_property():
    # Two 1-degree squares at different latitudes: projected areas must match
    # the cos(lat) shrinkage of true ground area (equal-area property).
    def sq_area(lat0):
        ring = [(10, lat0), (11, lat0), (11, lat0 + 1), (10, lat0 + 1)]
        p = project_ea(Polygon(ring))
        return p.area

    a_equator = sq_area(0.0)
    a_mid = sq_area(45.0)
    ratio = a_mid / a_equator
    expected = math.cos(math.radians(45.5)) / math.cos(math.radians(0.5))
    assert ratio == pytest.approx(expected, rel=0.01)


def test_mollweide_known_extent():
    # Mollweide world extent: x in +-2R*sqrt(2), y in +-R*sqrt(2).
    x, y = proj.wgs_to_mollweide(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(2 * math.sqrt(2) * proj.A, rel=1e-6)
    x, y = proj.wgs_to_mollweide(np.array([0.0]), np.array([90.0]))
    assert y[0] == pytest.approx(math.sqrt(2) * proj.A, rel=1e-3)


def test_iou_identical_and_disjoint():
    a = Polygon([(13.0, 52.0), (13.001, 52.0), (13.001, 52.001), (13.0, 52.001)])
    assert iou(a, a) == pytest.approx(1.0, abs=1e-6)
    b = Polygon([(13.01, 52.0), (13.011, 52.0), (13.011, 52.001), (13.01, 52.001)])
    assert iou(a, b) == 0.0


def test_iou_half_overlap():
    # Two squares overlapping half: IoU = 1/3.
    a = Polygon([(13.0, 52.0), (13.002, 52.0), (13.002, 52.001), (13.0, 52.001)])
    b = Polygon([(13.001, 52.0), (13.003, 52.0), (13.003, 52.001), (13.001, 52.001)])
    assert iou(a, b) == pytest.approx(1 / 3, rel=1e-3)


def test_union_multiple():
    a = Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
    b = Polygon([(1, 0), (3, 0), (3, 2), (1, 2)])
    c = Polygon([(10, 10), (11, 10), (11, 11), (10, 11)])
    u = union([a, b, c])
    assert u.area == pytest.approx(6 + 1)


def test_make_index_query():
    shapes = [
        Polygon([(i, 0), (i + 0.9, 0), (i + 0.9, 0.9), (i, 0.9)]) for i in range(100)
    ]
    idx = make_index(shapes)
    hits = sorted(idx.intersection((5.0, 0.0, 7.0, 1.0)))
    assert hits == [5, 6, 7]  # closed-box overlap includes the touching one at x=7
    assert list(idx.intersection((500, 500, 501, 501))) == []


def test_graph_components():
    g = UndirectedGraph()
    g.add_edge(0, 0)
    g.add_edge(1, 2)
    g.add_edge(2, 3)
    g.add_edge(4, 4)
    comps = sorted(sorted(c) for c in g.components())
    assert comps == [[0], [1, 2, 3], [4]]
    assert g.targets(2) == {1, 3}
    assert set(g.vertices()) == {0, 1, 2, 3, 4}


def test_webmercator_roundtrip():
    lng = np.array([-122.4194, 13.4])
    lat = np.array([37.7749, 52.52])
    x, y = proj.wgs_to_webmercator(lng, lat)
    lng2, lat2 = proj.webmercator_to_wgs(x, y)
    np.testing.assert_allclose(lng2, lng, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
