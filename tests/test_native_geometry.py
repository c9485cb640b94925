"""Native (C++) overlay engine vs the pure-Python oracle: exact agreement."""

import numpy as np
import pytest

from robosat_tpu import native
from robosat_tpu.geo import clip
from robosat_tpu.geo.geometry import MultiPolygon, Polygon


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


def _python_buffer(geom, distance, quad_segs=8):
    """Force the pure-Python pieces path (the oracle) for buffer_geometry."""
    from robosat_tpu.geo import buffer as buffer_mod

    orig = buffer_mod._native_buffer
    buffer_mod._native_buffer = lambda *a, **k: None
    try:
        return buffer_mod.buffer_geometry(geom, distance, quad_segs)
    finally:
        buffer_mod._native_buffer = orig


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("distance", [0.6, -0.6])
def test_native_buffer_matches_python_oracle(lib, seed, distance):
    """rs_buffer_rings (piece generation + overlay + linking in C++) agrees
    with the Python pieces path on area and symmetric difference."""
    from robosat_tpu.geo.buffer import buffer_geometry

    geom = _star(seed, 4.5, 5.0)
    ours = buffer_geometry(geom, distance)
    oracle = _python_buffer(geom, distance)

    a_ours = sum(p.area for p in ours.geoms)
    a_oracle = sum(p.area for p in oracle.geoms)
    assert a_ours == pytest.approx(a_oracle, rel=1e-6, abs=1e-9)
    if a_oracle > 0:
        sym = clip.boolean_op(ours, oracle, "xor")
        assert sum(p.area for p in sym.geoms) <= 1e-6 * a_oracle


def test_native_buffer_line_matches_python_oracle(lib):
    from robosat_tpu.geo.buffer import buffer_geometry
    from robosat_tpu.geo.geometry import LineString

    line = LineString(np.array([[0.0, 0.0], [4.0, 0.5], [6.0, 3.0]]))
    ours = buffer_geometry(line, 0.8)
    oracle = _python_buffer(line, 0.8)
    a_ours = sum(p.area for p in ours.geoms)
    a_oracle = sum(p.area for p in oracle.geoms)
    assert a_ours == pytest.approx(a_oracle, rel=1e-6)


def test_native_buffer_polygon_with_hole(lib):
    """Dilation must fill from both sides of a hole; erosion must widen it
    (native vs oracle)."""
    from robosat_tpu.geo.buffer import buffer_geometry
    from robosat_tpu.geo.geometry import Polygon as Poly

    shell = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    hole = np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]])  # CW
    geom = Poly(shell, [hole])
    for distance in (0.5, -0.5):
        ours = buffer_geometry(geom, distance)
        oracle = _python_buffer(geom, distance)
        a_ours = sum(p.area for p in ours.geoms)
        a_oracle = sum(p.area for p in oracle.geoms)
        assert a_ours == pytest.approx(a_oracle, rel=1e-6), distance


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_polys_intersect_matches_python(lib, seed):
    """rs_polys_intersect agrees with the Python predicate on overlapping,
    touching, containing, and disjoint polygon pairs."""
    from robosat_tpu.geo import geometry as G

    rng = np.random.default_rng(seed)
    cases = []
    a = _star(seed, 4.5, 5.0)
    cases.append((a, _star(seed + 100, 5.5, 5.0)))          # overlapping-ish
    cases.append((a, _star(seed + 100, 50.0, 5.0)))         # disjoint
    sq = Polygon(np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]]))
    cases.append((sq, a))                                   # containment
    t1 = Polygon(np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 2.0]]))
    t2 = Polygon(np.array([[2.0, 0.0], [4.0, 0.0], [3.0, 2.0]]))
    cases.append((t1, t2))                                  # single-point touch
    hole = np.array([[8.0, 8.0], [8.0, 12.0], [12.0, 12.0], [12.0, 8.0]])
    donut = Polygon(np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]]), [hole])
    inner = Polygon(np.array([[9.0, 9.0], [11.0, 9.0], [11.0, 11.0], [9.0, 11.0]]))
    cases.append((donut, inner))                            # inside the hole: disjoint

    orig = G._native_polys_intersect
    for pa, pb in cases:
        got = G.geometries_intersect(pa, pb)
        G._native_polys_intersect = lambda: None  # force the Python path
        try:
            want = G.geometries_intersect(pa, pb)
        finally:
            G._native_polys_intersect = orig
        assert got == want, (pa.shell[:2], pb.shell[:2])


def test_native_ring_is_simple_matches_python(lib):
    """rs_ring_is_simple agrees with the numpy oracle on simple, crossing,
    duplicate-vertex, spike, and collinear-overlap rings."""
    from robosat_tpu.geo import geometry as G

    cases = [
        np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]),            # simple
        np.array([[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0]]),            # bowtie
        np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 0.0], [1.0, 2.0]]),            # duplicate vertex
        np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 0.0], [2.0, 3.0]]),            # spike (collinear overlap)
        np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [2.0, -1.0]]),           # edge crossing
        _star(7, 0.0, 0.0).shell,                                              # random simple star
    ]
    orig = G._native_ring_is_simple
    for ring in cases:
        got = G.ring_is_simple(ring)
        G._native_ring_is_simple = lambda: None
        try:
            want = G.ring_is_simple(ring)
        finally:
            G._native_ring_is_simple = orig
        assert got == want, ring[:3]


def test_native_convex_dilate_matches_python_oracle(lib):
    """The convex single-ring dilation fast path (direct offset construction,
    no overlay) agrees with the Python pieces oracle on area and symmetric
    difference, and falls back correctly on concave rings."""
    from robosat_tpu.geo.buffer import buffer_geometry

    square = Polygon(np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]))
    hexa = Polygon(
        np.array([[2.0, 0.0], [4.0, 1.0], [4.5, 3.0], [2.0, 4.5], [-0.5, 3.0], [0.0, 1.0]])
    )
    concave = Polygon(np.array([[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [3.0, 2.0], [0.0, 6.0]]))
    for geom in (square, hexa, concave):
        ours = buffer_geometry(geom, 0.75)
        oracle = _python_buffer(geom, 0.75)
        a_ours = sum(p.area for p in ours.geoms)
        a_oracle = sum(p.area for p in oracle.geoms)
        assert a_ours == pytest.approx(a_oracle, rel=1e-6)
        sym = clip.boolean_op(ours, oracle, "xor")
        assert sum(p.area for p in sym.geoms) <= 1e-6 * a_oracle


def test_native_convex_erode_matches_python_oracle(lib):
    """The convex single-ring erosion fast path (inward half-plane
    intersection, no overlay) agrees with the Python pieces oracle, including
    on dilate-then-erode closings (merge's hot case, where the arc chords
    collapse to near-concurrent offset lines); concave rings fall back."""
    from robosat_tpu.geo.buffer import buffer_geometry

    square = Polygon(np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]))
    hexa = Polygon(
        np.array([[2.0, 0.0], [4.0, 1.0], [4.5, 3.0], [2.0, 4.5], [-0.5, 3.0], [0.0, 1.0]])
    )
    concave = Polygon(np.array([[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [3.0, 2.0], [0.0, 6.0]]))
    cases = [(square, -0.75), (hexa, -0.75), (concave, -0.75)]
    # Closing: dilate by r then erode by r (the rs merge component path).
    cases += [(buffer_geometry(hexa, 2.0), -2.0), (buffer_geometry(square, 1.0), -1.0)]
    for geom, distance in cases:
        ours = buffer_geometry(geom, distance)
        oracle = _python_buffer(geom, distance)
        a_ours = sum(p.area for p in ours.geoms)
        a_oracle = sum(p.area for p in oracle.geoms)
        assert a_ours == pytest.approx(a_oracle, rel=1e-6), (distance, a_ours, a_oracle)
        if a_oracle > 0:
            sym = clip.boolean_op(ours, oracle, "xor")
            assert sum(p.area for p in sym.geoms) <= 1e-6 * a_oracle


def test_native_convex_erode_vanishing(lib):
    """Eroding a convex ring by more than its inradius yields empty, through
    the fast path's fall-back-to-overlay route (never a bogus sliver)."""
    from robosat_tpu.geo.buffer import buffer_geometry

    small = Polygon(np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]))
    out = buffer_geometry(small, -5.0)
    assert sum(p.area for p in out.geoms) == 0.0


def test_native_merge_components_matches_two_step(lib):
    """The fused batched union+erode (rs_merge_components) agrees with the
    two-step path (union_all -> buffer_geometry(-r)) per component, on area
    and symmetric difference — including single-member components (union
    skipped, reference semantics), holey unions, vanishing erosions, and an
    empty component."""
    from robosat_tpu.geo.buffer import buffer_geometry
    from robosat_tpu.spatial.core import union

    rng = np.random.default_rng(7)

    def lot(cx, cy, w, h):
        return buffer_geometry(
            Polygon(np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h], [cx, cy + h]])), 2.0
        )

    components = [
        [lot(0, 0, 8, 6)],                                    # single member
        [lot(20, 0, 8, 6), lot(26, 2, 8, 6)],                 # overlapping pair
        [lot(40, 0, 6, 20), lot(40, 0, 20, 6), lot(54, 0, 6, 20), lot(40, 14, 20, 6)],  # ring w/ hole
        [lot(80, 0, 1.5, 1.5), lot(82, 0, 1.5, 1.5)],         # erosion nearly vanishes
        [MultiPolygon([])],                                    # empty member
    ]
    for _ in range(6):  # random clusters
        cx, cy = rng.uniform(100, 200, 2)
        members = [
            lot(cx + rng.uniform(-6, 6), cy + rng.uniform(-6, 6), rng.uniform(3, 9), rng.uniform(3, 9))
            for _ in range(rng.integers(1, 5))
        ]
        components.append(members)

    from robosat_tpu import native

    comp_rings = []
    comp_single = []
    for members in components:
        nonempty = [g for g in members if not g.is_empty]
        comp_single.append(len(nonempty) <= 1)
        comp_rings.append(clip._canonical_union_rings(nonempty))
    for threads in (1, 4):
        fused = native.merge_components(comp_rings, comp_single, 2.0, threads=threads)
        for members, rings in zip(components, fused):
            got = clip._assemble_polygons(rings, 0.0, presimplified=True)
            nonempty = [g for g in members if not g.is_empty]
            want = (
                buffer_geometry(union(nonempty), -2.0) if nonempty else MultiPolygon([])
            )
            a_got = sum(p.area for p in got.geoms)
            a_want = sum(p.area for p in want.geoms)
            assert a_got == pytest.approx(a_want, rel=1e-6, abs=1e-9)
            if a_want > 1e-9:
                sym = clip.boolean_op(got, want, "xor")
                assert sum(p.area for p in sym.geoms) <= 1e-6 * a_want


def test_native_iou_winding_batch_matches_union_iou(lib):
    """One-overlay winding IoU (prediction vs winding union of overlapping
    shapes) agrees with iou(pred, union(shapes)) — the rs dedupe scoring —
    including overlapping members, containment, and disjoint (zero) cases."""
    from robosat_tpu.geo.buffer import buffer_geometry
    from robosat_tpu.spatial.core import union

    def box(x, y, w, h):
        return Polygon(np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], float))

    cases = [
        (box(0, 0, 10, 10), [box(5, 5, 10, 10)]),                       # partial overlap
        (box(0, 0, 10, 10), [box(2, 2, 2, 2)]),                         # containment
        (box(0, 0, 10, 10), [box(8, 0, 10, 10), box(0, 8, 10, 10)]),    # overlapping members
        (box(0, 0, 4, 4), [box(100, 100, 4, 4)]),                       # disjoint
        (buffer_geometry(box(0, 0, 6, 6), 1.0).geoms[0], [box(3, 3, 9, 9), box(-2, -2, 4, 4)]),
    ]
    from robosat_tpu import native

    a_groups = [clip._collect_rings(a) for a, _ in cases]
    b_groups = [clip._canonical_union_rings(bs) for _, bs in cases]
    out = native.iou_winding_batch(a_groups, b_groups)
    for (a, bs), (inter, uni) in zip(cases, out):
        rv = inter / uni if uni > 0 else 0.0
        u = union(bs)
        want_inter = clip.overlay_area(a, u, "intersection")
        want_union = clip.overlay_area(a, u, "union")
        want = want_inter / want_union if want_union > 0 else 0.0
        assert rv == pytest.approx(want, rel=1e-6, abs=1e-9)


def test_native_intersect_graph_exclude_same(lib):
    """exclude_same=True drops i==j owner pairs (the merge self-join);
    False keeps them (dedupe's two distinct collections)."""
    from robosat_tpu import native

    def box(x, y, w, h):
        return Polygon(np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], float))

    a = [[box(0, 0, 4, 4)], [box(10, 0, 4, 4)]]
    b = [[box(1, 1, 4, 4)], [box(100, 100, 1, 1)]]
    with_same = {tuple(e) for e in native.intersect_graph(a, b, exclude_same=False).tolist()}
    assert with_same == {(0, 0)}
    without = {tuple(e) for e in native.intersect_graph(a, b, exclude_same=True).tolist()}
    assert without == set()  # the only intersecting pair has i == j
