"""Native (C++) overlay engine vs the pure-Python oracle: exact agreement."""

import numpy as np
import pytest

from robosat_tpu import native
from robosat_tpu.geo import clip
from robosat_tpu.geo.geometry import Polygon


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native geometry engine unavailable (no g++?)")
    return lib


def _star(seed, cx, cy, n=12):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1.5, 4.0, n)
    return Polygon(np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("op", ["union", "intersection", "difference", "xor"])
def test_native_matches_python_oracle(lib, seed, op):
    a = _star(seed, 4.5, 5.0)
    b = _star(seed + 100, 5.5, 5.0)
    rings_a = clip._collect_rings(a)
    rings_b = clip._collect_rings(b)

    py_area, py_edges = clip._overlay(a, b, op, want_geometry=True)
    na_area = native.overlay_area(rings_a, rings_b, op)
    na_edges = native.overlay_edges(rings_a, rings_b, op)

    assert na_area == pytest.approx(py_area, rel=1e-12, abs=1e-12)

    def canon(edges):
        return sorted(
            (round(x1, 9), round(y1, 9), round(x2, 9), round(y2, 9)) for (x1, y1), (x2, y2) in edges
        )

    assert canon(na_edges) == canon(py_edges)


def test_native_empty_inputs(lib):
    assert native.overlay_area([], [], "union") == 0.0
    assert native.overlay_edges([], [], "union") == []


def test_clip_routes_through_native(lib, monkeypatch):
    """boolean_op uses the native path by default and produces valid output."""
    a = _star(7, 4.5, 5.0)
    b = _star(8, 5.5, 5.0)
    u = clip.union(a, b)
    assert u.area == pytest.approx(clip.overlay_area(a, b, "union"), rel=1e-9)
