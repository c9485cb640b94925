"""`rs dedupe` — drop predicted features that OpenStreetMap already has.

Contract parity: robosat/tools/dedupe.py. A prediction survives when nothing
in OSM is near it (R-tree candidates), nothing intersects it, or its IoU
against the union of intersecting OSM shapes stays under the threshold.
"""

import argparse
import json

from tqdm import tqdm

from robosat_tpu.geo import geojson
from robosat_tpu.geo.geometry import geometries_intersect, mapping, shape
from robosat_tpu.spatial.core import iou, make_index, union


def add_parser(subparser):
    parser = subparser.add_parser(
        "dedupe",
        help="removes predictions that duplicate OpenStreetMap features",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("osm", type=str, help="GeoJSON ground truth extracted from OpenStreetMap")
    parser.add_argument("predicted", type=str, help="GeoJSON predictions to thin out")
    parser.add_argument(
        "--threshold", type=float, required=True, help="IoU above which a prediction counts as a duplicate"
    )
    parser.add_argument("out", type=str, help="GeoJSON file for the surviving predictions")

    parser.set_defaults(func=main)


def _load_shapes(path):
    with open(path) as fp:
        return [shape(feature["geometry"]) for feature in json.load(fp)["features"]]


def _is_novel(predicted, osm_shapes, index, threshold):
    nearby = [osm_shapes[i] for i in index.intersection(predicted.bounds)]
    if not nearby:
        return True

    overlapping = [geom for geom in nearby if geometries_intersect(predicted, geom)]
    if not overlapping:
        return True

    return iou(predicted, union(overlapping)) < threshold


def main(args):
    osm_shapes = _load_shapes(args.osm)
    predicted_shapes = _load_shapes(args.predicted)

    index = make_index(osm_shapes)

    kept = [
        geojson.feature(mapping(predicted))
        for predicted in tqdm(predicted_shapes, desc="Deduplicating", unit="shapes", ascii=True)
        if _is_novel(predicted, osm_shapes, index, args.threshold)
    ]

    with open(args.out, "w") as fp:
        geojson.dump(geojson.feature_collection(kept), fp)
