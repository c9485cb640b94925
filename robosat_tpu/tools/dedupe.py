"""`rs dedupe` — drop predictions already mapped in OpenStreetMap.

Contract parity: robosat/tools/dedupe.py — keep a predicted feature when no
OSM shape is nearby (R-tree), none intersects, or the IoU against the union
of the intersecting OSM shapes is below the threshold.
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
        help="deduplicates features against OpenStreetMap",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("osm", type=str, help="ground truth GeoJSON feature collection from OpenStreetMap")
    parser.add_argument("predicted", type=str, help="predicted GeoJSON feature collection to deduplicate")
    parser.add_argument(
        "--threshold", type=float, required=True, help="maximum allowed IoU to keep predictions, between 0.0 and 1.0"
    )
    parser.add_argument("out", type=str, help="path to GeoJSON to save deduplicated features to")

    parser.set_defaults(func=main)


def main(args):
    with open(args.osm) as fp:
        osm_shapes = [shape(feature["geometry"]) for feature in json.load(fp)["features"]]

    with open(args.predicted) as fp:
        predicted_shapes = [shape(feature["geometry"]) for feature in json.load(fp)["features"]]

    idx = make_index(osm_shapes)
    features = []

    for predicted in tqdm(predicted_shapes, desc="Deduplicating", unit="shapes", ascii=True):
        nearby = [osm_shapes[i] for i in idx.intersection(predicted.bounds)]

        keep = False
        if not nearby:
            keep = True
        else:
            intersecting = [geom for geom in nearby if geometries_intersect(predicted, geom)]
            if not intersecting:
                keep = True
            elif iou(predicted, union(intersecting)) < args.threshold:
                keep = True

        if keep:
            features.append(geojson.feature(mapping(predicted)))

    with open(args.out, "w") as fp:
        geojson.dump(geojson.feature_collection(features), fp)
