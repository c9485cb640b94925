"""Polygon rasterization and tile covering.

Replaces rasterio.features.rasterize (robosat/tools/rasterize.py:64-83) and
supermercado.burntiles (robosat/tools/cover.py:30, rasterize.py:113) with
numpy implementations:

- :func:`rasterize_polygons` — pixel-center even-odd scanline fill (the
  GDAL/rasterio default `all_touched=False` semantic).
- :func:`burn_tiles` — tiles touched by a polygon at a zoom level (interior
  cells by center-inside fill plus boundary cells by grid traversal — the
  `all_touched=True` semantic supermercado uses).
"""

import math

import numpy as np

from robosat_tpu.geo.tilemath import Tile, tile_fraction


def _polygon_rings(geometry):
    """Rings of a GeoJSON Polygon/MultiPolygon mapping as float arrays."""
    gtype = geometry["type"]
    coords = geometry["coordinates"]
    rings = []
    if gtype == "Polygon":
        rings.extend(coords)
    elif gtype == "MultiPolygon":
        for poly in coords:
            rings.extend(poly)
    else:
        raise ValueError("cannot rasterize geometry type {}".format(gtype))
    return [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 3]


def fill_rings(rings, out, value=1):
    """Even-odd scanline fill of rings (in pixel coordinates) into `out`.

    A pixel (row, col) is set iff its center (col + .5, row + .5) is inside
    an odd number of rings.
    """
    height, width = out.shape

    edges = []
    for ring in rings:
        pts = ring
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if y1 != y2:
                edges.append((x1, y1, x2, y2))
    if not edges:
        return out

    edges = np.asarray(edges, dtype=np.float64)
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]

    ymin = max(0, int(math.floor(min(y1.min(), y2.min()) - 0.5)))
    ymax = min(height - 1, int(math.ceil(max(y1.max(), y2.max()))))

    for row in range(ymin, ymax + 1):
        yc = row + 0.5
        crossing = (y1 > yc) != (y2 > yc)
        if not crossing.any():
            continue
        xs = x1[crossing] + (yc - y1[crossing]) * (x2[crossing] - x1[crossing]) / (y2[crossing] - y1[crossing])
        xs.sort()
        for k in range(0, len(xs) - 1, 2):
            lo = int(math.ceil(xs[k] - 0.5))
            hi = int(math.floor(xs[k + 1] - 0.5))
            if hi < 0 or lo >= width:
                continue
            out[row, max(lo, 0) : min(hi, width - 1) + 1] = value
    return out


def rasterize_polygons(shapes, out_shape, bounds, dtype=np.uint8):
    """Rasterize (geometry, value) pairs onto a grid over `bounds`.

    Args:
      shapes: iterable of (GeoJSON geometry mapping, burn value); geometry
        coordinates must be in the same CRS as `bounds`.
      out_shape: (height, width) of the output grid.
      bounds: (left, bottom, right, top) world extent of the grid (north-up).

    Returns the burned array (later shapes overwrite earlier ones, like
    rasterio).
    """
    height, width = out_shape
    left, bottom, right, top = bounds
    xres = (right - left) / width
    yres = (top - bottom) / height

    out = np.zeros(out_shape, dtype=dtype)
    for geometry, value in shapes:
        rings = _polygon_rings(geometry)
        pix_rings = []
        for ring in rings:
            cols = (ring[:, 0] - left) / xres
            rows = (top - ring[:, 1]) / yres
            pix_rings.append(np.stack([cols, rows], axis=1))
        mask = fill_rings(pix_rings, np.zeros(out_shape, dtype=bool), value=True)
        out[mask] = value
    return out


def _traverse_cells(x1, y1, x2, y2, mark):
    """Mark every grid cell a segment passes through (supercover DDA)."""
    mark(int(math.floor(x1)), int(math.floor(y1)))
    mark(int(math.floor(x2)), int(math.floor(y2)))
    dx, dy = x2 - x1, y2 - y1
    steps = int(2 * math.ceil(max(abs(dx), abs(dy)))) + 1
    # Dense sampling at half-cell resolution marks every crossed cell for the
    # short edges typical of building/parking footprints; endpoints above
    # anchor degenerate cases.
    for i in range(1, steps):
        t = i / steps
        mark(int(math.floor(x1 + t * dx)), int(math.floor(y1 + t * dy)))


def burn_tiles(feature, zoom):
    """All tiles at `zoom` touched by a GeoJSON Polygon/MultiPolygon feature.

    Returns a list of Tile. Parity target: supermercado.burntiles.burn
    (robosat/tools/cover.py:29-30).
    """
    geometry = feature["geometry"] if feature.get("type") == "Feature" else feature
    rings = _polygon_rings(geometry)
    if not rings:
        return []

    # Rings in continuous tile coordinates.
    tile_rings = []
    for ring in rings:
        pts = [tile_fraction(lng, lat, zoom) for lng, lat in ring[:, :2]]
        tile_rings.append(np.asarray(pts, dtype=np.float64))

    allpts = np.concatenate(tile_rings, axis=0)
    x0 = int(math.floor(allpts[:, 0].min()))
    y0 = int(math.floor(allpts[:, 1].min()))
    x1 = int(math.floor(allpts[:, 0].max()))
    y1 = int(math.floor(allpts[:, 1].max()))
    w, h = x1 - x0 + 1, y1 - y0 + 1

    touched = np.zeros((h, w), dtype=bool)

    def mark(cx, cy):
        if x0 <= cx <= x1 and y0 <= cy <= y1:
            touched[cy - y0, cx - x0] = True

    # Boundary cells.
    for ring in tile_rings:
        n = len(ring)
        for i in range(n):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % n]
            _traverse_cells(ax, ay, bx, by, mark)

    # Interior cells (center-inside, even-odd, shifted to the local window).
    local = [ring - np.array([x0, y0], dtype=np.float64) for ring in tile_rings]
    fill_rings(local, touched, value=True)

    ys, xs = np.nonzero(touched)
    n = 2**zoom
    return [Tile(int(x + x0) % n, int(y + y0), zoom) for x, y in zip(xs, ys) if 0 <= y + y0 < n]
