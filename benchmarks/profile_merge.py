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
    parser.add_argument("--two_step", action="store_true",
                        help="profile the pre-fusion per-component union/erode path")
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

        if args.two_step:
            idx = make_index(shapes_el)
        t = clock("rtree_build", t)

        graph = UndirectedGraph()
        n_pred = 0
        if args.two_step:
            embiggened = [buffer_geometry(geom, args.threshold) for geom in shapes_el]
            t = clock("grow_buffer", t)

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
        else:
            # The shipped batched phases (tools/merge.grow_all / build_graph).
            from robosat_tpu.tools.merge import build_graph, grow_all

            embiggened = grow_all(shapes_el, args.threshold)
            t = clock("grow_buffer", t)

            build_graph(shapes_el, embiggened, graph)
            components = list(graph.components())
            t = clock("graph_predicates", t)

        if args.two_step:
            unions = [union([embiggened[v] for v in component]) for component in components]
            t = clock("component_union", t)

            eroded = [buffer_geometry(u, -args.threshold) for u in unions]
            t = clock("erode_buffer", t)
        else:
            # The shipped path: ONE fused native call for every component's
            # union + negative buffer (tools/merge.merge_components).
            from robosat_tpu.tools.merge import merge_components

            eroded = merge_components(embiggened, components, args.threshold)
            t = clock("union_erode_fused", t)

        features = []
        if args.two_step:
            for merged in eroded:
                merged = project_el_wgs(merged)
                if not merged.is_valid or merged.is_empty:
                    continue
                polys = merged.geoms if isinstance(merged, MultiPolygon) else [merged]
                oriented = [orient_polygon(p, sign=1.0) for p in polys]
                geometry = oriented[0] if len(oriented) == 1 else MultiPolygon(oriented)
                area = int(round(project_ea(geometry).area))
                features.append(geojson.feature(mapping(geometry), properties={"area": area}))
        else:
            # The shipped batched finish (tools/merge.main's tail).
            from robosat_tpu.geo import proj
            from robosat_tpu.geo.geometry import ring_area
            from robosat_tpu.tools.merge import _project_multipolygons

            merged_all = _project_multipolygons(eroded, proj.worldmercator_to_wgs)
            from robosat_tpu import native

            valid = native.polys_valid_batch([list(mp.geoms) for mp in merged_all])
            oriented_all = []
            for merged, ok in zip(merged_all, valid):
                if not ok or merged.is_empty:
                    continue
                polys = merged.geoms if isinstance(merged, MultiPolygon) else [merged]
                oriented = [orient_polygon(p, sign=1.0) for p in polys]
                oriented_all.append(oriented[0] if len(oriented) == 1 else MultiPolygon(oriented))
            as_mps = [g if isinstance(g, MultiPolygon) else MultiPolygon([g]) for g in oriented_all]
            for geometry, ea in zip(oriented_all, _project_multipolygons(as_mps, proj.wgs_to_mollweide)):
                area = int(round(sum(
                    abs(ring_area(p.shell)) - sum(abs(ring_area(h)) for h in p.holes) for p in ea.geoms
                )))
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
