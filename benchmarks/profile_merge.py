"""Per-phase timing of `rs merge` on the 10k synthetic city (VERDICT r3 #7).

Replicates tools/merge.py's exact pipeline with a timer around each phase —
load/parse, EPSG:3395 projection, grow buffers, R-tree build, graph
(candidates + intersection predicates), per-component union, negative-buffer
erode, orient/area/dump — so the GEOS-gap estimate (docs/PERF.md) rests on a
measured table and optimization effort goes at the top line. Reference
semantics: robosat/tools/merge.py:47-65.

Run: python benchmarks/profile_merge.py [n_features] [--threshold 2]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_vector import synthetic_city  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("n", type=int, nargs="?", default=10000)
    parser.add_argument("--threshold", type=int, default=2)
    args = parser.parse_args()

    from robosat_tpu.geo import geojson
    from robosat_tpu.geo.buffer import buffer_geometry
    from robosat_tpu.geo.geometry import MultiPolygon, geometries_intersect, mapping, orient_polygon, shape
    from robosat_tpu.graph import UndirectedGraph
    from robosat_tpu.spatial.core import make_index, project_ea, project_el_wgs, project_wgs_el, union

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "features.geojson")
        with open(src, "w") as fp:
            json.dump(synthetic_city(args.n), fp)

        phases = {}

        def clock(name, t0):
            phases[name] = round(time.perf_counter() - t0, 3)
            return time.perf_counter()

        t = time.perf_counter()
        with open(src) as fp:
            collection = geojson.load(fp)
        shapes = [shape(feature["geometry"]) for feature in collection["features"]]
        del collection
        t = clock("load_parse", t)

        shapes_el = [project_wgs_el(geom) for geom in shapes]
        t = clock("project_3395", t)

        idx = make_index(shapes_el)
        t = clock("rtree_build", t)

        embiggened = [buffer_geometry(geom, args.threshold) for geom in shapes_el]
        t = clock("grow_buffer", t)

        graph = UndirectedGraph()
        n_pred = 0
        for i, grown in enumerate(embiggened):
            graph.add_edge(i, i)
            if grown.is_empty:
                continue
            nearest = [j for j in idx.intersection(grown.bounds) if i != j]
            for j in nearest:
                n_pred += 1
                if geometries_intersect(grown, shapes_el[j]):
                    graph.add_edge(i, j)
        components = list(graph.components())
        t = clock("graph_predicates", t)

        unions = [union([embiggened[v] for v in component]) for component in components]
        t = clock("component_union", t)

        eroded = [buffer_geometry(u, -args.threshold) for u in unions]
        t = clock("erode_buffer", t)

        features = []
        for merged in eroded:
            merged = project_el_wgs(merged)
            if not merged.is_valid or merged.is_empty:
                continue
            polys = merged.geoms if isinstance(merged, MultiPolygon) else [merged]
            oriented = [orient_polygon(p, sign=1.0) for p in polys]
            geometry = oriented[0] if len(oriented) == 1 else MultiPolygon(oriented)
            area = int(round(project_ea(geometry).area))
            features.append(geojson.feature(mapping(geometry), properties={"area": area}))
        out_path = os.path.join(tmp, "merged.geojson")
        with open(out_path, "w") as fp:
            geojson.dump(geojson.feature_collection(features), fp)
        t = clock("project_back_orient_dump", t)

        total = sum(phases.values())
        print(
            json.dumps(
                {
                    "metric": "merge_phase_seconds",
                    "n": args.n,
                    "threshold_m": args.threshold,
                    "phases": phases,
                    "total_s": round(total, 3),
                    "features_per_sec": round(args.n / total, 1),
                    "intersection_predicates": n_pred,
                    "components": len(components),
                }
            )
        )


if __name__ == "__main__":
    main()
