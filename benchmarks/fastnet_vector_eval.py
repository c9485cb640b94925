"""FastNet accuracy at the VECTOR level: the full tool chain, twice.

VERDICT r4 item 2: FastNet's accuracy story was a single pixel-level
teacher-agreement number; nothing validated the shipped artifact — GeoJSON
features after predict -> masks -> features -> merge — against the
flagship's. This harness closes that: on a held-out synthetic AOI (world-
space polygons rasterized across tile boundaries, rendered with the training
distribution's texture recipe) it runs the ENTIRE tool chain once with the
parity flagship and once with FastNet (optionally int8, the headline
`config/model-fast.toml` datapath), then reports POLYGON-level agreement:

- precision/recall of fast-chain features against flagship-chain features
  (greedy IoU matching in an equal-area projection, threshold 0.5 — the
  deployment question: does switching families change the shipped vectors?),
- mean IoU over matched pairs,
- the same metrics for each chain against the ground-truth polygons.

The chain is the real tools (tools/predict, masks, features, merge), not a
reimplementation; reference chain being validated:
robosat/tools/features.py:34-51, robosat/tools/merge.py:25-89.

Run: python benchmarks/fastnet_vector_eval.py [--teacher_steps 400]
     [--distill_steps 800] [--grid 5] [--int8]
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distill_eval import synth_tiles  # noqa: E402

SIZE = 256
ZOOM = 18
# A z18 block in a mid-latitude area (same neighborhood as the pipeline test).
X0, Y0 = 69620, 104940


def _render(rng, masks):
    """Label masks -> aerial-ish u8 images with distill_eval.synth_tiles'
    texture recipe (bg 40-90 + per-pixel texture, fg 150-240 + noise), so a
    model trained on synth_tiles transfers to these tiles."""
    n, size, _ = masks.shape
    images = rng.integers(40, 90, (n, size, size, 3), dtype=np.int32)
    images += rng.integers(-15, 16, (n, size, size, 1), dtype=np.int32)
    for i in range(n):
        hit = masks[i].astype(bool)
        if hit.any():
            color = rng.integers(150, 240, 3)
            images[i][hit] = color + rng.integers(-10, 11, (int(hit.sum()), 3))
    return np.clip(images, 0, 255).astype(np.uint8)


def _aoi_features(rng, grid, n_shapes):
    """World-space gt polygons spanning tile boundaries inside the AOI."""
    from robosat_tpu.geo import tilemath
    from robosat_tpu.geo.tilemath import Tile

    west, south, _, _ = tilemath.bounds(Tile(X0, Y0, ZOOM))
    _, _, east, north = tilemath.bounds(Tile(X0 + grid - 1, Y0 + grid - 1, ZOOM))
    feats = []
    for _ in range(n_shapes):
        cx = west + (east - west) * rng.uniform(0.1, 0.9)
        cy = south + (north - south) * rng.uniform(0.1, 0.9)
        # Half-sizes between ~1/4 and ~3/4 of one tile so many shapes cross
        # tile seams (the merge tool's whole reason to exist).
        hw = (east - west) / grid * rng.uniform(0.12, 0.38)
        hh = (north - south) / grid * rng.uniform(0.12, 0.38)
        if rng.random() < 0.5:
            ring = [[cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh], [cx - hw, cy + hh], [cx - hw, cy - hh]]
        else:
            t = np.linspace(0, 2 * np.pi, 17)
            ring = [[cx + hw * np.cos(a), cy + hh * np.sin(a)] for a in t]
            ring[-1] = ring[0]
        feats.append({"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [ring]}, "properties": {}})
    return {"type": "FeatureCollection", "features": feats}


def _chain(root, tag, ckpt, model_toml, dataset_toml, grid, threshold_m):
    """predict -> masks -> features -> merge with the real tools; returns the
    merged GeoJSON path."""
    from robosat_tpu.tools import features as features_tool
    from robosat_tpu.tools import masks as masks_tool
    from robosat_tpu.tools import merge as merge_tool
    from robosat_tpu.tools import predict as predict_tool

    probs = os.path.join(root, "probs_" + tag)
    masks_dir = os.path.join(root, "masks_" + tag)
    feats = os.path.join(root, "feats_{}.geojson".format(tag))
    merged = os.path.join(root, "merged_{}.geojson".format(tag))
    predict_tool.main(
        argparse.Namespace(
            batch_size=4, checkpoint=ckpt, overlap=32, strip=1, tile_size=SIZE, workers=2,
            tiles=os.path.join(root, "images"), probs=probs, model=model_toml, dataset=dataset_toml,
            profile=None,
        )
    )
    masks_tool.main(argparse.Namespace(masks=masks_dir, probs=[probs], weights=None))
    features_tool.main(
        argparse.Namespace(type="parking", masks=masks_dir, out=feats, dataset=dataset_toml, chunk=8)
    )
    merge_tool.main(argparse.Namespace(features=feats, threshold=threshold_m, out=merged))
    return merged


def _match(pred_path, ref_path, thr=0.5):
    """Greedy polygon matching by equal-area IoU; returns metrics dict."""
    from robosat_tpu.geo.geometry import shape
    from robosat_tpu.spatial.core import iou as shape_iou
    from robosat_tpu.spatial.core import make_index

    def load(path):
        with open(path) as fp:
            fc = json.load(fp)
        return [shape(f["geometry"]) for f in fc["features"]]

    pred, ref = load(pred_path), load(ref_path)
    if not pred or not ref:
        return {"precision": 0.0, "recall": 0.0, "mean_matched_iou": 0.0,
                "n_pred": len(pred), "n_ref": len(ref), "tp": 0}
    index = make_index(ref)
    # Highest-IoU-first greedy assignment (stable against enumeration order).
    cands = []
    for i, p in enumerate(pred):
        for j in index.intersection(p.bounds):
            v = shape_iou(p, ref[j])
            if v > 0:
                cands.append((v, i, j))
    cands.sort(reverse=True)
    used_p, used_r, ious = set(), set(), []
    for v, i, j in cands:
        if v < thr:
            break
        if i in used_p or j in used_r:
            continue
        used_p.add(i)
        used_r.add(j)
        ious.append(v)
    tp = len(ious)
    return {
        "precision": round(tp / len(pred), 4),
        "recall": round(tp / len(ref), 4),
        "mean_matched_iou": round(float(np.mean(ious)) if ious else 0.0, 4),
        "n_pred": len(pred),
        "n_ref": len(ref),
        "tp": tp,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_steps", type=int, default=400)
    ap.add_argument("--distill_steps", type=int, default=800)
    ap.add_argument("--grid", type=int, default=5, help="AOI side in z18 tiles")
    ap.add_argument("--shapes", type=int, default=18, help="gt polygons in the AOI")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--merge_threshold", type=int, default=8, help="merge distance (meters)")
    ap.add_argument("--int8", action="store_true", help="run the fast chain int8 (the model-fast.toml headline)")
    ap.add_argument("--keep", type=str, default=None, help="copy the workspace here for inspection")
    cli = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import optax
    from PIL import Image

    from robosat_tpu.checkpoint import save_checkpoint
    from robosat_tpu.config import save_config
    from robosat_tpu.models import fastnet, unet
    from robosat_tpu.ops.losses import get_loss
    from robosat_tpu.parallel.steps import make_distill_train_step, make_train_step
    from robosat_tpu.tools import rasterize as rasterize_tool

    device = jax.devices()[0]
    root = tempfile.mkdtemp(prefix="fastnet_vector_eval_")

    # ---- held-out AOI: gt polygons -> labels (rasterize tool) -> images ---
    rng = np.random.default_rng(42)
    fc = _aoi_features(rng, cli.grid, cli.shapes)
    gt_path = os.path.join(root, "gt.geojson")
    with open(gt_path, "w") as fp:
        json.dump(fc, fp)
    tiles = [(X0 + dx, Y0 + dy, ZOOM) for dx in range(cli.grid) for dy in range(cli.grid)]
    tiles_csv = os.path.join(root, "tiles.csv")
    with open(tiles_csv, "w") as fp:
        fp.write("\n".join("{},{},{}".format(*t) for t in tiles) + "\n")
    dataset_toml = os.path.join(root, "dataset.toml")
    save_config(
        {"common": {"dataset": root, "classes": ["background", "parking"], "colors": ["denim", "orange"]},
         "weights": {"values": [1.6, 5.7]}},
        dataset_toml,
    )
    rasterize_tool.main(
        argparse.Namespace(features=gt_path, tiles=tiles_csv, out=os.path.join(root, "labels"),
                           dataset=dataset_toml, zoom=ZOOM, size=SIZE)
    )
    label_arrays = {}
    for x, y, z in tiles:
        p = os.path.join(root, "labels", str(z), str(x), "{}.png".format(y))
        label_arrays[(x, y)] = np.array(Image.open(p), dtype=np.uint8)
    for (x, y), mask in label_arrays.items():
        img = _render(np.random.default_rng(x * 100003 + y), mask[None])[0]
        d = os.path.join(root, "images", str(ZOOM), str(x))
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, "{}.png".format(y)))

    # ---- train flagship + distill fastnet on the same distribution --------
    t0 = time.perf_counter()
    pool_images, pool_masks = synth_tiles(np.random.default_rng(0), 256, SIZE)
    params, state = unet.init(0, num_classes=2)
    opt = optax.adam(1e-3)
    step = make_train_step(unet, get_loss("CrossEntropy"), opt, compute_dtype=jnp.bfloat16, augment=True)
    p = jax.device_put(params, device)
    s = jax.device_put(state, device)
    o = jax.device_put(opt.init(params), device)
    key = jax.random.PRNGKey(0)
    order = np.random.default_rng(1)
    for i in range(cli.teacher_steps):
        sel = order.integers(0, len(pool_images), cli.batch)
        p, s, o, loss, _ = step(p, s, o, jax.random.fold_in(key, i), pool_images[sel], pool_masks[sel])
    teacher_folded = jax.jit(unet.fold)(p, s)
    flag_ckpt = os.path.join(root, "flagship.npz")
    save_checkpoint(flag_ckpt, {"params": jax.device_get(p), "state": jax.device_get(s)}, meta={"epoch": 1})

    sp_, ss_ = fastnet.init(1, num_classes=2)
    s_opt = optax.adam(1e-3)
    d_step = make_distill_train_step(fastnet, unet, get_loss("CrossEntropy"), s_opt,
                                     compute_dtype=jnp.bfloat16, augment=True)
    sp = jax.device_put(sp_, device)
    ss = jax.device_put(ss_, device)
    so = jax.device_put(s_opt.init(sp_), device)
    for i in range(cli.distill_steps):
        sel = order.integers(0, len(pool_images), cli.batch)
        sp, ss, so, dloss, _ = d_step(sp, ss, so, teacher_folded, jax.random.fold_in(key, 10_000 + i),
                                      pool_images[sel], pool_masks[sel])
    fast_ckpt = os.path.join(root, "fast.npz")
    save_checkpoint(fast_ckpt, {"params": jax.device_get(sp), "state": jax.device_get(ss)}, meta={"epoch": 1})
    train_s = time.perf_counter() - t0

    # ---- the two chains ----------------------------------------------------
    flag_toml = os.path.join(root, "model-flag.toml")
    save_config(
        {"common": {"cuda": True, "batch_size": 4, "image_size": SIZE, "checkpoint": root, "bf16": True},
         "opt": {"epochs": 1, "lr": 1e-3, "loss": "CrossEntropy"}},
        flag_toml,
    )
    fast_toml = os.path.join(root, "model-fast.toml")
    save_config(
        {"common": {"cuda": True, "batch_size": 4, "image_size": SIZE, "checkpoint": root, "bf16": True,
                    "model": "fast", "int8": bool(cli.int8)},
         "opt": {"epochs": 1, "lr": 1e-3, "loss": "CrossEntropy"}},
        fast_toml,
    )
    t0 = time.perf_counter()
    merged_flag = _chain(root, "flag", flag_ckpt, flag_toml, dataset_toml, cli.grid, cli.merge_threshold)
    merged_fast = _chain(root, "fast", fast_ckpt, fast_toml, dataset_toml, cli.grid, cli.merge_threshold)
    chain_s = time.perf_counter() - t0

    # The chains merge features within the threshold, so gt shapes closer
    # than the threshold fuse in any correct output; matching 1:1 against the
    # UNMERGED gt would cap recall below 1 even for a perfect chain. Run the
    # gt collection through the same merge for the apples-to-apples rows.
    from robosat_tpu.tools import merge as merge_tool

    gt_merged = os.path.join(root, "gt_merged.geojson")
    merge_tool.main(argparse.Namespace(features=gt_path, threshold=cli.merge_threshold, out=gt_merged))

    fast_vs_flag = _match(merged_fast, merged_flag)
    flag_vs_gt = _match(merged_flag, gt_merged)
    fast_vs_gt = _match(merged_fast, gt_merged)

    if cli.keep:
        shutil.copytree(root, cli.keep, dirs_exist_ok=True)
    shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "fastnet_vector_agreement_f1",
                "value": round(
                    2 * fast_vs_flag["precision"] * fast_vs_flag["recall"]
                    / max(fast_vs_flag["precision"] + fast_vs_flag["recall"], 1e-9),
                    4,
                ),
                "fast_vs_flagship": fast_vs_flag,
                "flagship_vs_gt": flag_vs_gt,
                "fast_vs_gt": fast_vs_gt,
                "int8": bool(cli.int8),
                "grid": cli.grid,
                "gt_shapes": cli.shapes,
                "teacher_steps": cli.teacher_steps,
                "distill_steps": cli.distill_steps,
                "train_s": round(train_s, 1),
                "chain_s": round(chain_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
