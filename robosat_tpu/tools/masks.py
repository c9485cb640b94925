"""`rs masks` — class masks from (ensembles of) probability tilesets.

Contract parity with robosat/tools/masks.py: un-quantize each probability PNG
via the 256 anchors, weighted-average soft-vote across tilesets, argmax to a
class index, write palette masks (denim/orange).
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image
from tqdm import tqdm

from robosat_tpu.colors import make_palette
from robosat_tpu.ops.quantize import ANCHORS
from robosat_tpu.tiles import tiles_from_slippy_map


def add_parser(subparser):
    parser = subparser.add_parser(
        "masks",
        help="turns probability tiles into class masks (with optional ensembling)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("masks", type=str, help="slippy map directory for the output masks")
    parser.add_argument("probs", type=str, nargs="+", help="one or more slippy map directories of probability tiles")
    parser.add_argument("--weights", type=float, nargs="+", help="per-directory weights for the soft-vote average")

    parser.set_defaults(func=main)


def softvote(probs, axis=0, weights=None):
    """Weighted-average soft-voting across probability stacks -> class indices."""
    return np.argmax(np.average(probs, axis=axis, weights=weights), axis=axis)


def _load_probs(path):
    """A quantized probability PNG -> (2, H, W) [background; foreground].

    Saturation un-wrap (deliberate deviation, docs/PARITY.md): the digitize
    quantizer maps p == 1.0 to index 256, which the uint8 cast wraps to 0 —
    and index 0 is reachable ONLY that way (p == 0.0 lands on index 1, since
    searchsorted-right counts the 0.0 anchor). The reference reads the wrap
    back as fg = 0.0 (robosat/tools/masks.py:42-52 with predict.py:102-103),
    silently turning every saturated-confident foreground pixel into
    background — a trained model loses its blob INTERIORS and keeps only the
    uncertain boundary ring. Mapping 0 -> 1.0 is the lossless inverse."""
    from robosat_tpu.native import imagecodec

    quantized = imagecodec.decode_indices(path)
    if quantized is None:
        quantized = np.array(Image.open(path).convert("P"))
    fg = ANCHORS[quantized]
    fg[quantized == 0] = 1.0
    return np.stack([1.0 - fg, fg], axis=0)


def main(args):
    if args.weights and len(args.probs) != len(args.weights):
        sys.exit("Error: number of slippy map directories and weights must be the same")

    tilesets = [list(tiles_from_slippy_map(path)) for path in args.probs]
    palette = make_palette("denim", "orange")

    for tileset in tqdm(list(zip(*tilesets)), desc="Masks", unit="tile", ascii=True):
        tiles = [tile for tile, _ in tileset]
        assert len(set(tiles)) == 1, "tilesets in sync"
        x, y, z = tiles[0]

        probs = [_load_probs(path) for _, path in tileset]
        mask = softvote(probs, axis=0, weights=args.weights).astype(np.uint8)

        out = Image.fromarray(mask, mode="P")
        out.putpalette(palette)

        os.makedirs(os.path.join(args.masks, str(z), str(x)), exist_ok=True)
        # zlib level 1, not optimize=True: identical pixels, ~37x less encode
        # CPU (docs/PERF.md "host pipeline"); reference robosat/tools/masks.py:69.
        out.save(os.path.join(args.masks, str(z), str(x), "{}.png".format(y)), optimize=False, compress_level=1)
