"""Geometry buffering (Minkowski dilation/erosion by a disc).

Replaces shapely's `.buffer` (used for merge distance thresholds,
robosat/tools/merge.py:35-45, and road centerline widths,
robosat/osm/road.py:140-142) with a construction on top of the boolean
engine:

- dilate(G, r)  = union(G, rectangles swept along every edge, discs at every
  vertex) — the exact Minkowski sum of a polygon with a polygonal disc.
- erode(P, r)   = P minus dilate(boundary(P), r).

Discs are approximated by regular polygons with `quad_segs` segments per
quarter circle (default 8, matching GEOS's default fidelity).
"""

import math

import numpy as np

from robosat_tpu.geo import clip
from robosat_tpu.geo.geometry import LineString, MultiPolygon, Polygon


_UNIT_DISCS = {}


def _disc(center, radius, quad_segs):
    n = max(4 * quad_segs, 4)
    unit = _UNIT_DISCS.get(n)
    if unit is None:
        angles = np.arange(n) * (2.0 * math.pi / n)
        unit = _UNIT_DISCS[n] = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    return np.asarray(center, dtype=np.float64) + radius * unit


def _edge_quad(p1, p2, radius):
    """Rectangle covering all points within `radius` of segment [p1, p2]."""
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    length = math.hypot(dx, dy)
    if length == 0.0:
        return None
    nx, ny = -dy / length * radius, dx / length * radius
    return np.array(
        [
            [p1[0] + nx, p1[1] + ny],
            [p2[0] + nx, p2[1] + ny],
            [p2[0] - nx, p2[1] - ny],
            [p1[0] - nx, p1[1] - ny],
        ]
    )


def _vertex_wedge(v, d1, d2, radius, quad_segs):
    """The part of the radius-disc at `v` not covered by the edge quads.

    An edge quad for p->v covers (around v) the half-plane u . d1 <= 0; the
    quad for v->n covers u . d2 >= 0 — so the disc's uncovered directions
    are exactly {u : u . d1 >= 0 and u . d2 <= 0}: a single wedge of angle
    <= pi. Summed over a ring these wedges span the total exterior turn
    (~2*pi), so replacing full discs with wedges cuts the union input from
    ~4*quad_segs points per VERTEX to ~4*quad_segs points per RING with an
    identical covered region (the wedge's straight edges lie on the quad
    boundaries). Returns None when the wedge is (numerically) empty.
    """
    t1 = math.atan2(d1[1], d1[0])
    t2 = math.atan2(d2[1], d2[0])
    turn = (t2 - t1 + math.pi) % (2.0 * math.pi) - math.pi  # signed, (-pi, pi]
    span = abs(turn)
    if span < 1e-9:
        return None
    # The gap sits opposite the turn: right turns (turn < 0) leave the arc
    # [t2 + pi/2, t1 + pi/2] uncovered, left turns the arc [t1 - pi/2,
    # t2 - pi/2]; both have angular width |turn|.
    a_start = (t2 + 0.5 * math.pi) if turn < 0 else (t1 - 0.5 * math.pi)
    steps = max(int(math.ceil(span / (0.5 * math.pi / max(quad_segs, 1)))), 1)
    angles = a_start + span * np.arange(steps + 1) / steps
    arc = np.stack([v[0] + radius * np.cos(angles), v[1] + radius * np.sin(angles)], axis=1)
    return np.concatenate([[v], arc])


def _path_pieces(coords, radius, quad_segs, closed):
    """Convex pieces (edge quads + vertex wedges) covering a path's dilation."""
    pieces = []
    n = len(coords)
    last = n if closed else n - 1
    dirs = {}
    for i in range(last):
        p1 = coords[i]
        p2 = coords[(i + 1) % n]
        quad = _edge_quad(p1, p2, radius)
        if quad is not None:
            pieces.append(Polygon(quad))
            dx, dy = p2[0] - p1[0], p2[1] - p1[1]
            length = math.hypot(dx, dy)
            dirs[i] = (dx / length, dy / length)
    for i in range(n):
        prev_edge = (i - 1) % n
        if closed or 0 < i < n - 1:
            if prev_edge in dirs and i in dirs:
                wedge = _vertex_wedge(coords[i], dirs[prev_edge], dirs[i], radius, quad_segs)
                if wedge is not None:
                    pieces.append(Polygon(wedge))
                continue
        # Path ends (open paths) and vertices with degenerate neighbor edges
        # keep the full disc — always a superset of any wedge.
        pieces.append(Polygon(_disc(coords[i], radius, quad_segs)))
    return pieces


def buffer_geometry(geom, distance, quad_segs=8):
    """Buffer a geometry by `distance` (negative erodes polygons).

    LineStrings only support positive distances (road centerline widening).
    Returns a MultiPolygon.
    """
    if distance == 0:
        if isinstance(geom, Polygon):
            return MultiPolygon([geom])
        if isinstance(geom, MultiPolygon):
            return geom
        raise ValueError("zero-distance buffer of a non-areal geometry")

    if isinstance(geom, LineString):
        if distance < 0:
            return MultiPolygon([])
        pieces = _path_pieces(np.asarray(geom.coords, dtype=np.float64), distance, quad_segs, closed=False)
        return clip.union_all(pieces)

    polys = geom.geoms if isinstance(geom, MultiPolygon) else [geom]

    if distance > 0:
        pieces = []
        for p in polys:
            pieces.append(Polygon(p.shell, p.holes))
            for ring in p.rings:
                pieces.extend(_path_pieces(np.asarray(ring, dtype=np.float64), distance, quad_segs, closed=True))
        return clip.union_all(pieces)

    # Negative buffer: erosion = P \ dilate(boundary(P), |distance|), with
    # base membership and halo winding tested in one overlay (clip.erode).
    r = -distance
    base = MultiPolygon(list(polys))
    boundary_pieces = []
    for p in polys:
        for ring in p.rings:
            boundary_pieces.extend(_path_pieces(np.asarray(ring, dtype=np.float64), r, quad_segs, closed=True))
    return clip.erode(base, boundary_pieces)
