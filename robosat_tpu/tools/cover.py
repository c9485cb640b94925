"""`rs cover` — CSV of all tiles covering a GeoJSON feature collection.

Contract parity: robosat/tools/cover.py (tile cover per feature, set-deduped),
using the in-repo tile covering instead of supermercado.
"""

import argparse
import csv
import json

from tqdm import tqdm

from robosat_tpu.geo.raster import burn_tiles


def add_parser(subparser):
    parser = subparser.add_parser(
        "cover",
        help="generates tiles covering GeoJSON features",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("--zoom", type=int, required=True, help="zoom level of tiles")
    parser.add_argument("features", type=str, help="path to GeoJSON features")
    parser.add_argument("out", type=str, help="path to csv file to store tiles in")

    parser.set_defaults(func=main)


def main(args):
    with open(args.features) as f:
        collection = json.load(f)

    tiles = set()
    for feature in tqdm(collection["features"], ascii=True, unit="feature"):
        tiles.update((t.x, t.y, t.z) for t in burn_tiles(feature, args.zoom))

    with open(args.out, "w") as fp:
        writer = csv.writer(fp)
        writer.writerows(sorted(tiles))
