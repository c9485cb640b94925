"""`rs compare` — side-by-side strips of image, label, and masks.

Contract parity: robosat/tools/compare.py (keep-filter by foreground-pixel
percentage across any of the masks).
"""

import argparse
import os

import numpy as np
from PIL import Image
from tqdm import tqdm

from robosat_tpu.tiles import tiles_from_slippy_map


def add_parser(subparser):
    parser = subparser.add_parser(
        "compare",
        help="compare images, labels and masks side by side",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("out", type=str, help="directory to save visualizations to")
    parser.add_argument("images", type=str, help="directory to read slippy map images from")
    parser.add_argument("labels", type=str, help="directory to read slippy map labels from")
    parser.add_argument("masks", type=str, nargs="+", help="slippy map directories to read masks from")
    parser.add_argument("--minimum", type=float, default=0.0, help="minimum percentage of mask not background")
    parser.add_argument("--maximum", type=float, default=1.0, help="maximum percentage of mask not background")

    parser.set_defaults(func=main)


def main(args):
    for tile, path in tqdm(list(tiles_from_slippy_map(args.images)), desc="Compare", unit="image", ascii=True):
        x, y, z = map(str, tile)

        image = Image.open(path).convert("RGB")
        label = Image.open(os.path.join(args.labels, z, x, "{}.png".format(y))).convert("P")
        assert image.size == label.size

        keep = False
        masks = []
        for mask_dir in args.masks:
            mask = Image.open(os.path.join(mask_dir, z, x, "{}.png".format(y))).convert("P")
            assert image.size == mask.size
            masks.append(mask)

            percentage = np.sum(np.array(mask) != 0) / np.prod(image.size)
            if args.minimum <= percentage <= args.maximum:
                keep = True

        if not keep:
            continue

        width, height = image.size
        columns = 2 + len(masks)
        combined = Image.new(mode="RGB", size=(columns * width, height))
        combined.paste(image, box=(0, 0))
        combined.paste(label, box=(width, 0))
        for i, mask in enumerate(masks):
            combined.paste(mask, box=((2 + i) * width, 0))

        os.makedirs(os.path.join(args.out, z, x), exist_ok=True)
        combined.save(os.path.join(args.out, z, x, "{}.png".format(y)), optimize=True)
