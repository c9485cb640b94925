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


def _path_pieces(coords, radius, quad_segs, closed):
    """Convex pieces (edge quads + vertex discs) covering a path's dilation."""
    pieces = []
    n = len(coords)
    last = n if closed else n - 1
    for i in range(last):
        p1 = coords[i]
        p2 = coords[(i + 1) % n]
        quad = _edge_quad(p1, p2, radius)
        if quad is not None:
            pieces.append(Polygon(quad))
    for i in range(n):
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
