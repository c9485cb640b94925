"""`rs merge` — merge adjacent GeoJSON features within a distance threshold.

Contract parity: robosat/tools/merge.py — buffer each shape by the threshold
in EPSG:3395 meters, connect intersecting buffered shapes into components
(R-tree candidates + union-find), union each component, negative-buffer back,
orient exteriors counter-clockwise, attach the equal-area m^2 `area`
property. Built entirely on the in-repo geometry engine.
"""

import argparse
import sys

from tqdm import tqdm

from robosat_tpu.geo import geojson
from robosat_tpu.geo.buffer import buffer_geometry
from robosat_tpu.geo.geometry import MultiPolygon, geometries_intersect, mapping, orient_polygon, shape
from robosat_tpu.graph import UndirectedGraph
from robosat_tpu.spatial.core import make_index, project_ea, project_el_wgs, project_wgs_el, union


def add_parser(subparser):
    parser = subparser.add_parser(
        "merge", help="fuses GeoJSON features that sit close together", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("features", type=str, help="GeoJSON features to merge")
    parser.add_argument("--threshold", type=int, required=True, help="merge features closer than this many meters")
    parser.add_argument("out", type=str, help="GeoJSON file for the merged features")

    parser.set_defaults(func=main)


def main(args):
    with open(args.features) as fp:
        collection = geojson.load(fp)

    shapes = [shape(feature["geometry"]) for feature in collection["features"]]
    del collection

    # Project into EPSG:3395 ONCE and run the whole grow/graph/union/erode
    # pipeline in meters; World Mercator is separable and monotone per axis,
    # so bounding boxes and intersection predicates agree with their WGS84
    # counterparts, and only the final merged outlines project back.
    shapes_el = [project_wgs_el(geom) for geom in shapes]

    graph = UndirectedGraph()
    idx = make_index(shapes_el)

    embiggened = []
    for i, geom in enumerate(tqdm(shapes_el, desc="Building graph", unit="shapes", ascii=True)):
        grown = buffer_geometry(geom, args.threshold)
        embiggened.append(grown)

        graph.add_edge(i, i)
        if grown.is_empty:
            continue
        nearest = [j for j in idx.intersection(grown.bounds) if i != j]
        for t in nearest:
            if geometries_intersect(grown, shapes_el[t]):
                graph.add_edge(i, t)

    components = list(graph.components())
    assert sum(len(v) for v in components) == len(shapes), "components capture all shape indices"

    features = []
    for component in tqdm(components, desc="Merging components", unit="component", ascii=True):
        merged = project_el_wgs(buffer_geometry(union([embiggened[v] for v in component]), -args.threshold))

        if not merged.is_valid or merged.is_empty:
            print("Warning: merged feature is not valid, skipping", file=sys.stderr)
            continue

        polys = merged.geoms if isinstance(merged, MultiPolygon) else [merged]
        oriented = [orient_polygon(p, sign=1.0) for p in polys]
        geometry = oriented[0] if len(oriented) == 1 else MultiPolygon(oriented)

        # Equal-area projection; round to full m^2 (robosat/tools/merge.py:79).
        area = int(round(project_ea(geometry).area))

        features.append(geojson.feature(mapping(geometry), properties={"area": area}))

    with open(args.out, "w") as fp:
        geojson.dump(geojson.feature_collection(features), fp)
