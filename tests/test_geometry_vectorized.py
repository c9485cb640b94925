"""Vectorized geometry predicates agree with their scalar oracles.

The scalar predicates (segments_intersect & friends) are the readable
specification; the batched numpy paths are what `rs merge` / `rs dedupe` /
`rs rasterize` actually run at city scale. Random fuzzing over degenerate-
prone integer grids keeps the two in lockstep.
"""

import numpy as np

from robosat_tpu.geo.geometry import (
    Polygon,
    _collinear_overlap,
    _collinear_overlap_rows,
    _segments_cross_block,
    geometries_intersect,
    point_in_ring,
    ring_is_simple,
    segments_intersect,
)


def _scalar_point_in_ring(point, ring):
    """The pre-vectorization even-odd implementation (oracle)."""
    x, y = point
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        d = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if d == 0 and min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2):
            return True
        if (y1 > y) != (y2 > y):
            if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
    return inside


def test_segments_cross_block_matches_scalar():
    rng = np.random.default_rng(0)
    # Small integer grid maximizes collinear/touching degeneracies.
    a = rng.integers(0, 5, (40, 4)).astype(np.float64)
    b = rng.integers(0, 5, (40, 4)).astype(np.float64)
    block = _segments_cross_block(a[:, :2], a[:, 2:], b[:, :2], b[:, 2:])
    for i in range(len(a)):
        for j in range(len(b)):
            expected = segments_intersect(a[i, :2], a[i, 2:], b[j, :2], b[j, 2:])
            assert block[i, j] == expected, (a[i], b[j])


def test_collinear_overlap_rows_matches_scalar():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 4, (200, 4)).astype(np.float64)
    q = rng.integers(0, 4, (200, 4)).astype(np.float64)
    # Force many collinear cases: half of q duplicates/extends p's segments.
    q[::2, :2] = p[::2, :2]
    q[::2, 2:] = p[::2, :2] + 2 * (p[::2, 2:] - p[::2, :2])
    rows = _collinear_overlap_rows(p[:, :2], p[:, 2:], q[:, :2], q[:, 2:])
    for i in range(len(p)):
        assert rows[i] == _collinear_overlap(p[i, :2], p[i, 2:], q[i, :2], q[i, 2:])


def test_point_in_ring_matches_scalar_oracle():
    rng = np.random.default_rng(2)
    for _ in range(30):
        ring = rng.integers(0, 8, (rng.integers(3, 10), 2)).astype(np.float64)
        for _ in range(20):
            pt = tuple(rng.integers(-1, 9, 2).astype(np.float64))
            assert point_in_ring(pt, ring) == _scalar_point_in_ring(pt, ring)


def test_ring_is_simple_cases():
    square = [(0, 0), (4, 0), (4, 4), (0, 4)]
    assert ring_is_simple(np.asarray(square, np.float64))

    bowtie = np.asarray([(0, 0), (4, 4), (4, 0), (0, 4)], np.float64)
    assert not ring_is_simple(bowtie)

    spike = np.asarray([(0, 0), (4, 0), (2, 0), (2, 4)], np.float64)  # collinear backtrack
    assert not ring_is_simple(spike)

    degenerate = np.asarray([(0, 0), (0, 0), (4, 4)], np.float64)
    assert not ring_is_simple(degenerate)

    # A large ring exercising the chunked pair sweep (> _PAIR_CHUNK edges).
    t = np.linspace(0, 2 * np.pi, 1200, endpoint=False)
    circle = np.stack([np.cos(t), np.sin(t)], axis=1) * 1000
    assert ring_is_simple(circle)
    pinched = circle.copy()
    pinched[600] = circle[0]  # touches vertex 0 -> non-simple
    assert not ring_is_simple(pinched)


def test_geometries_intersect_large_polygons():
    t = np.linspace(0, 2 * np.pi, 700, endpoint=False)
    circle = np.stack([np.cos(t), np.sin(t)], axis=1)
    a = Polygon(circle * 10)
    b = Polygon(circle * 10 + np.array([19.0, 0.0]))  # overlaps a's edge region
    c = Polygon(circle * 10 + np.array([25.0, 0.0]))  # disjoint
    inside = Polygon(circle * 0.5)  # contained in a
    assert geometries_intersect(a, b)
    assert not geometries_intersect(a, c)
    assert geometries_intersect(a, inside)
