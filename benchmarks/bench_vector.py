"""Vector-pipeline scale benchmark: `rs merge` + `rs dedupe` on 10k features.

The reference backs these tools with GEOS/libspatialindex C loops
(robosat/tools/merge.py:47-58, dedupe.py:45-63); this measures the in-repo
engine (STR R-tree + vectorized segment predicates + slab-overlay booleans)
at city scale. Prints one JSON line per tool.

Run: python benchmarks/bench_vector.py [n_features]
"""

import argparse
import json
import math
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_city(n, seed=0):
    """n parking-lot-ish polygons clustered around a city center (lon/lat)."""
    rng = np.random.default_rng(seed)
    base_lon, base_lat = -122.42, 37.77
    # Clusters of ~8 lots so merge finds real components.
    centers = rng.normal((base_lon, base_lat), (0.04, 0.03), (max(n // 8, 1), 2))
    features = []
    for i in range(n):
        cx, cy = centers[i % len(centers)] + rng.normal(0, 2e-4, 2)
        r = rng.uniform(5e-5, 2e-4)  # ~5-20 m
        k = int(rng.integers(5, 9))
        phase = rng.uniform(0, 2 * math.pi)
        ring = [
            [cx + r * math.cos(phase + 2 * math.pi * j / k), cy + 0.8 * r * math.sin(phase + 2 * math.pi * j / k)]
            for j in range(k)
        ]
        ring.append(ring[0])
        features.append({"type": "Feature", "properties": {}, "geometry": {"type": "Polygon", "coordinates": [ring]}})
    return {"type": "FeatureCollection", "features": features}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("n", type=int, nargs="?", default=10000)
    args = parser.parse_args()

    from robosat_tpu.tools import dedupe, merge

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "features.geojson")
        with open(src, "w") as fp:
            json.dump(synthetic_city(args.n), fp)

        merged = os.path.join(tmp, "merged.geojson")
        t0 = time.perf_counter()
        merge.main(argparse.Namespace(features=src, threshold=2, out=merged))
        dt = time.perf_counter() - t0
        with open(merged) as fp:
            n_merged = len(json.load(fp)["features"])
        print(
            json.dumps(
                {
                    "metric": "merge_features_per_sec",
                    "value": round(args.n / dt, 1),
                    "unit": "features/s",
                    "n_in": args.n,
                    "n_out": n_merged,
                    "seconds": round(dt, 2),
                }
            )
        )

        # Dedupe the same features against a shifted copy (half overlap OSM).
        osm = os.path.join(tmp, "osm.geojson")
        fc = synthetic_city(args.n, seed=0)
        for f in fc["features"][: args.n // 2]:
            for ring in f["geometry"]["coordinates"]:
                for pt in ring:
                    pt[0] += 0.01  # move half the "OSM" far away
        with open(osm, "w") as fp:
            json.dump(fc, fp)

        kept = os.path.join(tmp, "kept.geojson")
        t0 = time.perf_counter()
        dedupe.main(argparse.Namespace(osm=osm, predicted=src, threshold=0.5, out=kept))
        dt = time.perf_counter() - t0
        with open(kept) as fp:
            n_kept = len(json.load(fp)["features"])
        print(
            json.dumps(
                {
                    "metric": "dedupe_features_per_sec",
                    "value": round(args.n / dt, 1),
                    "unit": "features/s",
                    "n_in": args.n,
                    "n_out": n_kept,
                    "seconds": round(dt, 2),
                }
            )
        )


if __name__ == "__main__":
    sys.exit(main())
