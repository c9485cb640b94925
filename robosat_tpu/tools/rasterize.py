"""`rs rasterize` — burn GeoJSON features into slippy-map label masks.

Contract parity with robosat/tools/rasterize.py: features projected to
EPSG:3857, burned (value 1) over each CSV tile's xy bounds at the requested
size, np.maximum-merged with any existing tile file, written as palette PNGs
using the dataset's two colors. Uses the in-repo rasterizer and tile covering
instead of rasterio/supermercado.
"""

import argparse
import collections
import json
import os
import sys

import numpy as np
from PIL import Image
from tqdm import tqdm

from robosat_tpu.colors import make_palette
from robosat_tpu.config import load_config
from robosat_tpu.geo import tilemath
from robosat_tpu.geo.proj import wgs_to_webmercator
from robosat_tpu.geo.raster import burn_tiles, rasterize_polygons
from robosat_tpu.tiles import tiles_from_csv


def add_parser(subparser):
    parser = subparser.add_parser(
        "rasterize", help="burns GeoJSON features into label tiles", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("features", type=str, help="GeoJSON features to burn")
    parser.add_argument("tiles", type=str, help="csv of tile ids to rasterize")
    parser.add_argument("out", type=str, help="slippy map directory for the label tiles")
    parser.add_argument("--dataset", type=str, required=True, help="path to dataset configuration file")
    parser.add_argument("--zoom", type=int, required=True, help="zoom level the csv tiles live at")
    parser.add_argument("--size", type=int, default=512, help="side length of the burned tiles in pixels")

    parser.set_defaults(func=main)


def feature_to_mercator(feature):
    """Yield a feature's polygon geometries with EPSG:3857 coordinates.

    Parity: robosat/tools/rasterize.py:38-61 (MultiPolygons split into
    Polygons).
    """
    geometry = feature["geometry"]

    def project_ring(ring):
        ring = np.asarray(ring, dtype=np.float64)
        xs, ys = wgs_to_webmercator(ring[:, 0], ring[:, 1])
        return [list(pt) for pt in np.stack([xs, ys], axis=1)]

    if geometry["type"] == "Polygon":
        yield {"type": "Polygon", "coordinates": [project_ring(r) for r in geometry["coordinates"]]}
    elif geometry["type"] == "MultiPolygon":
        for component in geometry["coordinates"]:
            yield {"type": "Polygon", "coordinates": [project_ring(r) for r in component]}


def burn(tile, features, size):
    """Rasterize `features` (EPSG:4326 GeoJSON) into a (size, size) uint8 tile."""
    shapes = ((geometry, 1) for feature in features for geometry in feature_to_mercator(feature))
    return rasterize_polygons(shapes, (size, size), tilemath.xy_bounds(tile))


def main(args):
    dataset = load_config(args.dataset)

    classes = dataset["common"]["classes"]
    colors = dataset["common"]["colors"]
    assert len(classes) == len(colors), "classes and colors coincide"
    assert len(colors) == 2, "only binary models supported right now"
    bg, fg = colors

    os.makedirs(args.out, exist_ok=True)

    assert all(tile.z == args.zoom for tile in tiles_from_csv(args.tiles)), "tiles at the requested zoom"

    with open(args.features) as f:
        fc = json.load(f)

    # Map tiles -> covering features for quick lookup.
    feature_map = collections.defaultdict(list)
    for i, feature in enumerate(tqdm(fc["features"], ascii=True, unit="feature")):
        if feature["geometry"]["type"] != "Polygon":
            continue
        try:
            for tile in burn_tiles(feature, args.zoom):
                feature_map[tile].append(feature)
        except ValueError:
            print("Warning: invalid feature {}, skipping".format(i), file=sys.stderr)

    palette = make_palette(bg, fg)

    for tile in tqdm(list(tiles_from_csv(args.tiles)), ascii=True, unit="tile"):
        if tile in feature_map:
            out = burn(tile, feature_map[tile], args.size)
        else:
            out = np.zeros(shape=(args.size, args.size), dtype=np.uint8)

        out_dir = os.path.join(args.out, str(tile.z), str(tile.x))
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "{}.png".format(tile.y))

        if os.path.exists(out_path):
            prev = np.array(Image.open(out_path))
            out = np.maximum(out, prev)

        img = Image.fromarray(out, mode="P")
        img.putpalette(palette)
        img.save(out_path, optimize=True)
