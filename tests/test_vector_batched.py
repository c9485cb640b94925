"""Batched native vector paths vs the per-feature fallbacks, at tool level.

The round-5 merge/dedupe rebuilds route every hot phase through one batched
native call (tools/merge.grow_all / build_graph / merge_components,
tools/dedupe._novel_flags). These tests pin that the batched paths and the
per-feature loops (the reference-shaped fallbacks, robosat/tools/merge.py:
47-75, dedupe.py:40-49) produce the same tool outputs on a randomized
city-block scenario — counts, area properties, and novelty decisions.
"""

import argparse
import json
import os

import numpy as np
import pytest

from robosat_tpu import native


def _city(n, seed=0, shift=0.0):
    """Random lot-sized quads around a San-Francisco-ish block (WGS84)."""
    rng = np.random.default_rng(seed)
    feats = []
    for _ in range(n):
        cx = -122.42 + rng.uniform(0, 0.004) + shift
        cy = 37.76 + rng.uniform(0, 0.003)
        w = rng.uniform(8e-5, 2.4e-4)
        h = rng.uniform(6e-5, 2.0e-4)
        ring = [[cx, cy], [cx + w, cy], [cx + w, cy + h], [cx, cy + h], [cx, cy]]
        feats.append({"type": "Feature", "properties": {}, "geometry": {"type": "Polygon", "coordinates": [ring]}})
    return {"type": "FeatureCollection", "features": feats}


@pytest.fixture(autouse=True)
def _require_native():
    if native.load() is None:
        pytest.skip("native geometry engine unavailable")


def test_merge_batched_matches_per_feature_fallback(tmp_path, monkeypatch):
    from robosat_tpu.tools import merge

    src = tmp_path / "features.geojson"
    src.write_text(json.dumps(_city(180, seed=3)))

    out_batched = tmp_path / "batched.geojson"
    merge.main(argparse.Namespace(features=str(src), threshold=2, out=str(out_batched)))

    # The fallback loops still run the per-feature native buffer/overlay —
    # the comparison isolates exactly the batching/fusion layer.
    monkeypatch.setattr(merge, "_native", lambda: None)
    out_loop = tmp_path / "loop.geojson"
    merge.main(argparse.Namespace(features=str(src), threshold=2, out=str(out_loop)))

    a = json.loads(out_batched.read_text())["features"]
    b = json.loads(out_loop.read_text())["features"]
    assert len(a) == len(b)
    assert sorted(f["properties"]["area"] for f in a) == sorted(f["properties"]["area"] for f in b)


def test_dedupe_batched_matches_per_prediction_fallback(tmp_path):
    from robosat_tpu.tools import dedupe

    preds = _city(160, seed=5)
    osm = _city(160, seed=5)
    # Shift half the "OSM" far away: those predictions must survive; the
    # identical half must be dropped at any sane threshold.
    for f in osm["features"][:80]:
        for ring in f["geometry"]["coordinates"]:
            for pt in ring:
                pt[0] += 0.05
    pred_shapes = [dedupe.shape(f["geometry"]) for f in preds["features"]]
    osm_shapes = [dedupe.shape(f["geometry"]) for f in osm["features"]]

    batched = dedupe._novel_flags(pred_shapes, osm_shapes, 0.5)

    from robosat_tpu.spatial.core import make_index

    index = make_index(osm_shapes)
    loop = [dedupe._is_novel(p, osm_shapes, index, 0.5) for p in pred_shapes]

    assert list(batched) == loop
    # Sanity on the scenario itself: most of the identical half is dropped
    # (neighbors overlapping an identical twin can dilute its IoU below the
    # threshold, so not all 80).
    assert sum(1 for v in loop if not v) >= 50


def test_merge_handles_non_polygonal_features(tmp_path):
    """A LineString feature must route the batched phases to the fallback
    loops instead of crashing the native packer (round-5 review finding)."""
    from robosat_tpu.tools import merge

    city = _city(6, seed=9)
    city["features"].append({
        "type": "Feature", "properties": {},
        "geometry": {"type": "LineString",
                     "coordinates": [[-122.41, 37.75], [-122.409, 37.7501]]},
    })
    src = tmp_path / "mixed.geojson"
    src.write_text(json.dumps(city))
    out = tmp_path / "merged.geojson"
    merge.main(argparse.Namespace(features=str(src), threshold=2, out=str(out)))
    assert json.loads(out.read_text())["type"] == "FeatureCollection"


def test_vectorized_input_projection_matches_per_feature():
    """The merge tool's one-pass EPSG:3395 input projection must produce
    bit-identical coordinates to the per-feature `project_wgs_el` path it
    replaced (the projection is an elementwise ufunc chain, so values must
    match exactly, not approximately)."""
    from robosat_tpu.geo.geometry import (
        MultiPolygon, Polygon, shape, transform_multipolygons,
    )
    from robosat_tpu.geo import proj
    from robosat_tpu.spatial.core import project_wgs_el

    city = _city(12, seed=3)
    # include a hole and a genuine MultiPolygon to cover every layout branch
    sq = city["features"][0]["geometry"]["coordinates"][0]
    cx, cy = sq[0]
    city["features"][0]["geometry"]["coordinates"].append(
        [[cx + 2e-5, cy + 2e-5], [cx + 4e-5, cy + 2e-5],
         [cx + 3e-5, cy + 4e-5], [cx + 2e-5, cy + 2e-5]])
    mp_coords = [city["features"][1]["geometry"]["coordinates"],
                 city["features"][2]["geometry"]["coordinates"]]
    city["features"][1]["geometry"] = {"type": "MultiPolygon", "coordinates": mp_coords}
    del city["features"][2]

    shapes = [shape(f["geometry"]) for f in city["features"]]
    batched = transform_multipolygons(
        [g if isinstance(g, MultiPolygon) else MultiPolygon([g]) for g in shapes],
        proj.wgs_to_worldmercator,
    )
    for g, b in zip(shapes, batched):
        ref = project_wgs_el(g)
        ref_polys = list(ref.geoms) if isinstance(ref, MultiPolygon) else [ref]
        assert len(ref_polys) == len(b.geoms)
        for rp, bp in zip(ref_polys, b.geoms):
            assert np.array_equal(np.asarray(rp.shell), np.asarray(bp.shell))
            assert len(rp.holes) == len(bp.holes)
            for rh, bh in zip(rp.holes, bp.holes):
                assert np.array_equal(np.asarray(rh), np.asarray(bh))


def test_mollweide_batching_invariant_near_pole():
    """The Mollweide Newton long tail is decided PER POINT: a slow-converging
    near-pole vertex in a batch must not perturb other points' coordinates
    (round-5 review finding — batched transform_multipolygons vs per-ring)."""
    from robosat_tpu.geo import proj

    alone = proj.wgs_to_mollweide(np.array([-122.42]), np.array([37.76]))
    batched = proj.wgs_to_mollweide(np.array([-122.42, 0.0]), np.array([37.76, 89.99999]))
    assert alone[0][0] == batched[0][0] and alone[1][0] == batched[1][0]
