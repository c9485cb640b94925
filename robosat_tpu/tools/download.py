"""`rs download` — fetch tile imagery for a CSV tile list.

Contract parity: robosat/tools/download.py (rate-limited thread pool,
skip-if-exists, PIL re-encode, failures logged and skipped).
"""

import argparse
import concurrent.futures as futures
import os
import sys
import time

import requests
from PIL import Image
from tqdm import tqdm

from robosat_tpu.tiles import fetch_image, tiles_from_csv


def add_parser(subparser):
    parser = subparser.add_parser(
        "download", help="downloads images from a tile server", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("url", type=str, help="endpoint with {z}/{x}/{y} variables to fetch image tiles from")
    parser.add_argument("--ext", type=str, default="webp", help="file format to save images in")
    parser.add_argument("--rate", type=int, default=10, help="rate limit in max. requests per second")
    parser.add_argument("tiles", type=str, help="path to .csv tiles file")
    parser.add_argument("out", type=str, help="path to slippy map directory for storing tiles")

    parser.set_defaults(func=main)


def main(args):
    tiles = list(tiles_from_csv(args.tiles))
    num_workers = args.rate

    with requests.Session() as session:
        progress = tqdm(total=len(tiles), ascii=True, unit="image")

        def worker(tile):
            tick = time.monotonic()

            x, y, z = map(str, [tile.x, tile.y, tile.z])
            os.makedirs(os.path.join(args.out, z, x), exist_ok=True)
            path = os.path.join(args.out, z, x, "{}.{}".format(y, args.ext))

            if os.path.isfile(path):
                progress.update()
                return tile, True

            url = args.url.format(x=tile.x, y=tile.y, z=tile.z)
            res = fetch_image(session, url)
            if not res:
                progress.update()
                return tile, False

            try:
                image = Image.open(res)
                image.save(path, optimize=True)
            except OSError:
                progress.update()
                return tile, False

            # Crude rate limiting: a worker sleeps so the pool's aggregate
            # request rate stays at --rate requests/sec.
            elapsed = time.monotonic() - tick
            budget = num_workers / args.rate
            if elapsed < budget:
                time.sleep(budget - elapsed)

            progress.update()
            return tile, True

        with futures.ThreadPoolExecutor(num_workers) as executor:
            for tile, ok in executor.map(worker, tiles):
                if not ok:
                    print("Warning: {} failed, skipping".format(tile), file=sys.stderr)
