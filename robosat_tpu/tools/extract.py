"""`rs extract` — GeoJSON features from an OpenStreetMap base map.

Contract parity: robosat/tools/extract.py (parking/building/road handlers,
chunked GeoJSON output). Reads .osm.pbf via the in-repo pure-Python PBF
decoder instead of libosmium; .osm XML also works.
"""

import argparse

from robosat_tpu.osm.building import BuildingHandler
from robosat_tpu.osm.parking import ParkingHandler
from robosat_tpu.osm.road import RoadHandler

# Handlers need the osmium-style `way(w)` callback plus `flush()`.
handlers = {"parking": ParkingHandler, "building": BuildingHandler, "road": RoadHandler}


def add_parser(subparser):
    parser = subparser.add_parser(
        "extract",
        help="extracts GeoJSON features from OpenStreetMap",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("--type", type=str, required=True, choices=handlers.keys(), help="type of feature to extract")
    parser.add_argument("--batch", type=int, default=100000, help="number of features to save per file")
    parser.add_argument("map", type=str, help="path to .osm.pbf base map")
    parser.add_argument("out", type=str, help="path to GeoJSON file to store features in")

    parser.set_defaults(func=main)


def main(args):
    handler = handlers[args.type](args.out, args.batch)
    handler.apply_file(filename=args.map, locations=True)
    handler.flush()
