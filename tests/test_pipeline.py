"""End-to-end pipeline integration test: every `rs` tool chained on a tiny
synthetic dataset (CPU, 64px tiles), mirroring the reference's data flow
(README pipeline: extract -> cover -> rasterize -> train -> predict -> masks
-> features -> merge -> dedupe; plus weights/subset/compare)."""

import argparse
import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.config import save_config
from robosat_tpu.geo import tilemath
from robosat_tpu.geo.tilemath import Tile

TILES = [Tile(x, y, 18) for x in (69620, 69621, 69622) for y in (104940, 104941, 104942)]
SIZE = 64


def _tile_feature(tile, inset=0.2):
    west, south, east, north = tilemath.bounds(tile)
    dx, dy = (east - west) * inset, (north - south) * inset
    ring = [
        [west + dx, south + dy],
        [east - dx, south + dy],
        [east - dx, north - dy],
        [west + dx, north - dy],
        [west + dx, south + dy],
    ]
    return {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [ring]}, "properties": {}}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")

    # Ground-truth features inside two tiles.
    features = [_tile_feature(TILES[0]), _tile_feature(TILES[4])]
    features_path = root / "features.geojson"
    features_path.write_text(json.dumps({"type": "FeatureCollection", "features": features}))

    # Synthetic imagery for all nine tiles.
    images = root / "images"
    rng = np.random.default_rng(0)
    for t in TILES:
        d = images / str(t.z) / str(t.x)
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)).save(d / "{}.png".format(t.y))

    # Tiles CSV covering all nine tiles.
    tiles_csv = root / "tiles.csv"
    with open(tiles_csv, "w") as fp:
        csv.writer(fp).writerows([(t.x, t.y, t.z) for t in TILES])

    # Dataset + model configs.
    dataset_dir = root / "dataset"
    checkpoint_dir = root / "checkpoints"
    dataset_toml = root / "dataset.toml"
    model_toml = root / "model.toml"
    save_config(
        {
            "common": {
                "dataset": str(dataset_dir),
                "classes": ["background", "parking"],
                "colors": ["denim", "orange"],
            },
            "weights": {"values": [1.6, 5.7]},
        },
        str(dataset_toml),
    )
    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": SIZE, "checkpoint": str(checkpoint_dir),
                       # per-replica BN (reference DataParallel semantics): the sync-BN
                       # pjit path interleaves ~110 all-reduces that XLA:CPU's spinning
                       # rendezvous makes pathologically slow on this 1-core harness.
                       "sync_bn": False},
            "opt": {"epochs": 1, "lr": 0.0001, "loss": "Lovasz"},
        },
        str(model_toml),
    )
    return root


def test_full_pipeline(workspace):
    from robosat_tpu.tools import compare, cover, dedupe, features, masks, merge, predict, rasterize, subset, train, weights

    root = workspace

    # --- cover: tiles covering the features.
    cover.main(argparse.Namespace(zoom=18, features=str(root / "features.geojson"), out=str(root / "cover.csv")))
    covered = {tuple(map(int, row)) for row in csv.reader(open(root / "cover.csv"))}
    assert (TILES[0].x, TILES[0].y, 18) in covered

    # --- rasterize: labels for all nine tiles.
    rasterize.main(
        argparse.Namespace(
            features=str(root / "features.geojson"),
            tiles=str(root / "tiles.csv"),
            out=str(root / "labels"),
            dataset=str(root / "dataset.toml"),
            zoom=18,
            size=SIZE,
        )
    )
    burned = np.array(Image.open(root / "labels" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)))
    empty = np.array(Image.open(root / "labels" / "18" / str(TILES[1].x) / "{}.png".format(TILES[1].y)))
    assert burned.sum() > 0
    assert empty.sum() == 0

    # --- dataset layout for training.
    for split in ("training", "validation"):
        for kind in ("images", "labels"):
            src = root / ("images" if kind == "images" else "labels")
            dst = root / "dataset" / split / kind
            dst.parent.mkdir(parents=True, exist_ok=True)
            if not dst.exists():
                os.symlink(src, dst)

    # --- weights over training labels.
    weights.main(argparse.Namespace(dataset=str(root / "dataset.toml")))

    # --- train one epoch.
    train.main(
        argparse.Namespace(
            model=str(root / "model.toml"),
            dataset=str(root / "dataset.toml"),
            checkpoint=None,
            resume=False,
            workers=2,
            profile=None,
        )
    )
    ckpt = root / "checkpoints" / "checkpoint-00001-of-00001.npz"
    assert ckpt.exists()
    assert (root / "checkpoints" / "history-00001-of-00001.png").exists()
    log_text = (root / "checkpoints" / "log").read_text()
    assert "Train    loss:" in log_text and "Validate loss:" in log_text

    # --- resume training refuses when epochs already reached.
    with pytest.raises(SystemExit):
        train.main(
            argparse.Namespace(
                model=str(root / "model.toml"),
                dataset=str(root / "dataset.toml"),
                checkpoint=str(ckpt),
                resume=True,
                workers=2,
                profile=None,
            )
        )

    # --- predict probabilities (buffered input 64+2*32=128; like the
    # reference's 576, H/32 must be even for the center pool+upsample).
    predict.main(
        argparse.Namespace(
            batch_size=4,
            checkpoint=str(ckpt),
            overlap=32,
            strip=1,
            tile_size=SIZE,
            workers=2,
            tiles=str(root / "images"),
            probs=str(root / "probs"),
            model=str(root / "model.toml"),
            dataset=str(root / "dataset.toml"),
            profile=None,
        )
    )
    prob_png = root / "probs" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)
    assert prob_png.exists()
    prob_img = Image.open(prob_png)
    assert prob_img.mode == "P"
    assert prob_img.size == (SIZE, SIZE)

    # --- sharded predict: two `--shard i/2` runs into one directory must
    # reproduce the unsharded output byte-identically, each writing a
    # disjoint non-empty block (multi-process/host tile sharding).
    shard_counts = []
    for i in range(2):
        predict.main(
            argparse.Namespace(
                batch_size=4,
                checkpoint=str(ckpt),
                overlap=32,
                strip=1,
                tile_size=SIZE,
                workers=2,
                shard="{}/2".format(i),
                tiles=str(root / "images"),
                probs=str(root / "probs_sharded"),
                model=str(root / "model.toml"),
                dataset=str(root / "dataset.toml"),
                profile=None,
            )
        )
        shard_counts.append(len(list((root / "probs_sharded").rglob("*.png"))))
    full = sorted(p.relative_to(root / "probs") for p in (root / "probs").rglob("*.png"))
    sharded = sorted(p.relative_to(root / "probs_sharded") for p in (root / "probs_sharded").rglob("*.png"))
    assert sharded == full and 0 < shard_counts[0] < shard_counts[1]
    for rel in full:
        assert (root / "probs_sharded" / rel).read_bytes() == (root / "probs" / rel).read_bytes()

    # --- QAT finetune (rs train --qat) from the trained checkpoint: the
    # frozen calibrated scales ship in checkpoint meta, and an int8 predict
    # from that checkpoint consumes exactly those scales (tools/train.py,
    # parallel/steps.make_qat_train_step, tools/predict.py qat_amaxes).
    from robosat_tpu.checkpoint import load_checkpoint
    from robosat_tpu.config import save_config

    qat_model_toml = root / "model-qat.toml"
    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": SIZE,
                       "checkpoint": str(root / "checkpoints_qat"), "sync_bn": False, "int8": True},
            "opt": {"epochs": 1, "lr": 0.00005, "loss": "Lovasz"},
        },
        str(qat_model_toml),
    )
    train.main(
        argparse.Namespace(
            model=str(qat_model_toml),
            dataset=str(root / "dataset.toml"),
            checkpoint=str(ckpt),
            resume=False,
            workers=2,
            profile=None,
            qat=True,
        )
    )
    qat_ckpt = root / "checkpoints_qat" / "checkpoint-00001-of-00001.npz"
    assert qat_ckpt.exists()
    _, qat_meta = load_checkpoint(str(qat_ckpt))
    # 52 bottleneck + 7 decoder conv sites; the frozen spec is recorded.
    assert len(qat_meta["qat_amaxes"]) == 59
    assert qat_meta["qat_calibration"] == "99.8"
    assert "QAT finetune: 59 int8 sites" in (root / "checkpoints_qat" / "log").read_text()
    predict.main(
        argparse.Namespace(
            batch_size=4,
            checkpoint=str(qat_ckpt),
            overlap=32,
            strip=1,
            tile_size=SIZE,
            workers=2,
            tiles=str(root / "images"),
            probs=str(root / "probs_qat"),
            model=str(qat_model_toml),
            dataset=str(root / "dataset.toml"),
            profile=None,
        )
    )
    assert (root / "probs_qat" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)).exists()

    # --- masks from probabilities.
    masks.main(argparse.Namespace(masks=str(root / "masks"), probs=[str(root / "probs")], weights=None))
    mask_png = root / "masks" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)
    assert mask_png.exists()
    assert np.array(Image.open(mask_png)).max() <= 1

    # --- features from the *label* masks (deterministic foreground).
    features.main(
        argparse.Namespace(
            type="parking",
            masks=str(root / "labels"),
            out=str(root / "predicted.geojson"),
            dataset=str(root / "dataset.toml"),
            chunk=4,
        )
    )
    predicted = json.loads((root / "predicted.geojson").read_text())
    assert predicted["type"] == "FeatureCollection"
    assert len(predicted["features"]) >= 1

    # --- merge nearby predictions.
    merge.main(
        argparse.Namespace(features=str(root / "predicted.geojson"), threshold=5, out=str(root / "merged.geojson"))
    )
    merged = json.loads((root / "merged.geojson").read_text())
    assert len(merged["features"]) >= 1
    assert all(f["properties"]["area"] > 0 for f in merged["features"])

    # --- dedupe against "OSM" (the ground-truth features) removes everything.
    dedupe.main(
        argparse.Namespace(
            osm=str(root / "features.geojson"),
            predicted=str(root / "merged.geojson"),
            threshold=0.3,
            out=str(root / "deduped.geojson"),
        )
    )
    deduped = json.loads((root / "deduped.geojson").read_text())
    assert len(deduped["features"]) < len(merged["features"]) or len(merged["features"]) == 0

    # --- dedupe against empty OSM keeps everything.
    (root / "empty.geojson").write_text(json.dumps({"type": "FeatureCollection", "features": []}))
    dedupe.main(
        argparse.Namespace(
            osm=str(root / "empty.geojson"),
            predicted=str(root / "merged.geojson"),
            threshold=0.3,
            out=str(root / "kept.geojson"),
        )
    )
    kept = json.loads((root / "kept.geojson").read_text())
    assert len(kept["features"]) == len(merged["features"])

    # --- subset copies CSV-listed tiles.
    subset.main(
        argparse.Namespace(images=str(root / "images"), tiles=str(root / "cover.csv"), out=str(root / "subset"))
    )
    assert (root / "subset" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)).exists()

    # --- compare strips.
    compare.main(
        argparse.Namespace(
            out=str(root / "compare"),
            images=str(root / "images"),
            labels=str(root / "labels"),
            masks=[str(root / "masks")],
            minimum=0.0,
            maximum=1.0,
        )
    )
    strip = root / "compare" / "18" / str(TILES[0].x) / "{}.png".format(TILES[0].y)
    assert strip.exists()
    assert Image.open(strip).size == (3 * SIZE, SIZE)


def test_extract_from_osm_xml(tmp_path):
    """`rs extract` on a small .osm XML: parking way kept, filtered way dropped."""
    from robosat_tpu.tools import extract

    nodes = {
        1: (13.40, 52.52),
        2: (13.401, 52.52),
        3: (13.401, 52.521),
        4: (13.40, 52.521),
    }
    node_xml = "".join(
        '<node id="{}" lat="{}" lon="{}"/>'.format(i, lat, lon) for i, (lon, lat) in nodes.items()
    )
    xml = """<?xml version="1.0"?>
<osm version="0.6">
 {}
 <way id="100">
  <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
  <tag k="amenity" v="parking"/>
 </way>
 <way id="101">
  <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
  <tag k="amenity" v="parking"/>
  <tag k="parking" v="underground"/>
 </way>
 <way id="102">
  <nd ref="1"/><nd ref="2"/><nd ref="3"/>
  <tag k="amenity" v="parking"/>
 </way>
</osm>""".format(node_xml)
    osm_path = tmp_path / "map.osm"
    osm_path.write_text(xml)

    out = tmp_path / "parking.geojson"
    extract.main(argparse.Namespace(type="parking", batch=10, map=str(osm_path), out=str(out)))

    chunks = list(tmp_path.glob("parking-*.geojson"))
    assert len(chunks) == 1
    collection = json.loads(chunks[0].read_text())
    assert len(collection["features"]) == 1  # way 101 filtered, 102 not closed
    ring = collection["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]


def test_train_resume_continues_epochs(workspace):
    """--checkpoint + --resume restores the optimizer/epoch and continues:
    raising epochs to 2 and resuming from epoch 1 trains exactly epoch 2."""
    import argparse

    from robosat_tpu.config import save_config
    from robosat_tpu.tools import train

    root = workspace
    ckpt1 = root / "checkpoints" / "checkpoint-00001-of-00001.npz"
    assert ckpt1.exists(), "runs after test_full_pipeline"

    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": SIZE, "checkpoint": str(root / "checkpoints"), "sync_bn": False},
            "opt": {"epochs": 2, "lr": 0.0001, "loss": "Lovasz"},
        },
        str(root / "model2.toml"),
    )

    train.main(
        argparse.Namespace(
            model=str(root / "model2.toml"),
            dataset=str(root / "dataset.toml"),
            checkpoint=str(ckpt1),
            resume=True,
            workers=2,
            profile=None,
        )
    )

    assert (root / "checkpoints" / "checkpoint-00002-of-00002.npz").exists()
    # Only epoch 2 ran in the resumed session.
    log_text = (root / "checkpoints" / "log").read_text()
    assert "Epoch: 2/2" in log_text
