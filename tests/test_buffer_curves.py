"""Raw-offset-curve buffering vs the quad/wedge pieces oracle.

The curve construction (geo/buffer.py `_offset_curve`, mirrored in
native/geometry.cpp `offset_curve`) must cover exactly the region the pieces
construction covers — including the regimes that broke naive join rules:
erosions past the inradius (backward arcs at crossing joins donate a
spurious +2*pi winding per traversal, reporting the whole polygon instead of
vanishing — hence Clipper's pinch joins), deep slits, holes at
near-touching separations, and multi-polygon inputs whose dilations merge.
Reference behavior: shapely `.buffer` in robosat/tools/merge.py:35-45.
"""

import numpy as np
import pytest

from robosat_tpu.geo import buffer as buffer_mod
from robosat_tpu.geo import clip
from robosat_tpu.geo.geometry import MultiPolygon, Polygon


def _curves(geom, d, qs=8):
    """Pure-Python offset-curve path."""
    orig = buffer_mod._native_buffer
    buffer_mod._native_buffer = lambda *a, **k: None
    try:
        return buffer_mod.buffer_geometry(geom, d, qs)
    finally:
        buffer_mod._native_buffer = orig


def _pieces(geom, d, qs=8):
    """Pure-Python quad/wedge pieces oracle."""
    orig_nb, orig_oc = buffer_mod._native_buffer, buffer_mod._offset_curve
    buffer_mod._native_buffer = lambda *a, **k: None
    buffer_mod._offset_curve = lambda *a, **k: None
    try:
        return buffer_mod.buffer_geometry(geom, d, qs)
    finally:
        buffer_mod._native_buffer = orig_nb
        buffer_mod._offset_curve = orig_oc


def _star(seed, cx, cy, n=12):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1.5, 4.0, n)
    return Polygon(np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1))


_SQ = Polygon(np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]))
_U = Polygon(
    np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [6.0, 4.0],
         [6.0, 1.0], [4.0, 1.0], [4.0, 4.0], [0.0, 4.0]]
    )
)
_DONUT = Polygon(
    np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
    [np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]])],
)
# Zero-width spike (exact collinear reversal at (5,14)): the +-pi turn must
# kick _offset_curve back to the pieces construction, whose vertex disc caps
# the tip — the pinch join under-covered a half-disc there (round-4 ADVICE).
_SPIKE = Polygon(
    np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [5.0, 10.0],
         [5.0, 14.0], [5.0, 10.0], [0.0, 10.0]]
    )
)
_TWO = MultiPolygon(
    [
        Polygon(np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]])),
        Polygon(np.array([[4.0, 0.0], [7.0, 0.0], [7.0, 3.0], [4.0, 3.0]])),
    ]
)

CASES = [
    ("vanish", _SQ, -5.0),          # erosion past the inradius: must vanish
    ("vanish-exact", _SQ, -1.0),    # erosion exactly at the inradius
    ("near-vanish", _SQ, -0.95),
    ("slit-dilate-big", _U, 5.0),   # dilation must fill the slit entirely
    ("slit-dilate-small", _U, 0.4),
    ("slit-erode", _U, -0.8),
    ("slit-erode-big", _U, -1.9),
    ("donut-dilate-merge", _DONUT, 1.5),   # hole fills from both sides
    ("donut-erode", _DONUT, -0.5),
    ("donut-erode-deep", _DONUT, -1.99),   # shell and hole rails near-touch
    ("two-dilate-merge", _TWO, 0.6),       # disjoint dilations weld
    ("two-erode", _TWO, -1.4),
    ("spike-dilate", _SPIKE, 1.0),         # tip needs the half-disc cap
    ("spike-erode", _SPIKE, -0.8),
]
CASES += [(f"star{s}d{d}", _star(s, 0.0, 0.0), d) for s in range(3) for d in (1.2, -0.7)]


@pytest.mark.parametrize("name,geom,d", CASES, ids=[c[0] for c in CASES])
def test_curves_match_pieces_oracle(name, geom, d):
    got = _curves(geom, d)
    want = _pieces(geom, d)
    a_got = sum(p.area for p in got.geoms)
    a_want = sum(p.area for p in want.geoms)
    assert a_got == pytest.approx(a_want, rel=1e-6, abs=1e-9)
    if a_want > 0:
        sym = sum(p.area for p in clip.boolean_op(got, want, "xor").geoms)
        assert sym <= 1e-6 * a_want


@pytest.mark.parametrize("name,geom,d", CASES, ids=[c[0] for c in CASES])
def test_native_curves_match_pieces_oracle(name, geom, d):
    from robosat_tpu import native

    if native.load() is None:
        pytest.skip("native geometry engine unavailable")
    got = buffer_mod.buffer_geometry(geom, d)
    want = _pieces(geom, d)
    a_got = sum(p.area for p in got.geoms)
    a_want = sum(p.area for p in want.geoms)
    assert a_got == pytest.approx(a_want, rel=1e-6, abs=1e-9)
    if a_want > 0:
        sym = sum(p.area for p in clip.boolean_op(got, want, "xor").geoms)
        assert sym <= 1e-6 * a_want


def test_offset_curve_degenerate_ring_falls_back():
    """A ring that collapses to <3 distinct vertices returns None (callers
    fall back to the pieces construction)."""
    two = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    assert buffer_mod._offset_curve(two, 0.5, 8, inward=False) is None
    point = np.array([[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]])
    assert buffer_mod._offset_curve(point, 0.5, 8, inward=False) is None
    # Explicitly closed triangle with a duplicated vertex still works.
    tri = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 0.0], [1.0, 2.0], [0.0, 0.0]])
    assert buffer_mod._offset_curve(tri, 0.5, 8, inward=False) is not None
    # A spike (exact +-pi collinear-reversal turn) must fall back too: the
    # modulo maps it to -pi, which would pinch-join the tip instead of
    # capping it (round-4 ADVICE).
    spike = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [2.0, 4.0], [2.0, 7.0], [2.0, 4.0], [0.0, 4.0]])
    assert buffer_mod._offset_curve(spike, 0.5, 8, inward=False) is None
    assert buffer_mod._offset_curve(spike, 0.5, 8, inward=True) is None
    # Beyond-the-tip coverage: the dilation must contain the half-disc cap.
    dil = _curves(_SPIKE, 1.0)
    tip_probe = Polygon(np.array([[4.9, 14.5], [5.1, 14.5], [5.1, 14.6], [4.9, 14.6]]))
    inter = clip.boolean_op(dil, MultiPolygon([tip_probe]), "intersection")
    assert sum(p.area for p in inter.geoms) == pytest.approx(tip_probe.area, rel=1e-9)
