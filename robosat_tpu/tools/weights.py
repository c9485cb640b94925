"""`rs weights` — class weights over a dataset's training labels.

Contract parity: robosat/tools/weights.py (pixel histogram over training
labels, w = 1/ln(1.02 + p), printed rounded to 6 decimals for manual copy
into the dataset TOML's [weights] section).
"""

import argparse
import os

import numpy as np
from tqdm import tqdm

from robosat_tpu.config import load_config
from robosat_tpu.data.datasets import SlippyMapTiles


def add_parser(subparser):
    parser = subparser.add_parser(
        "weights", help="computes class weights on dataset", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    parser.add_argument("--dataset", type=str, required=True, help="path to dataset configuration file")

    parser.set_defaults(func=main)


def main(args):
    dataset = load_config(args.dataset)

    path = dataset["common"]["dataset"]
    num_classes = len(dataset["common"]["classes"])

    train_dataset = SlippyMapTiles(os.path.join(path, "training", "labels"), mode="P")

    n = 0
    counts = np.zeros(num_classes, dtype=np.int64)

    for i in tqdm(range(len(train_dataset)), desc="Loading", unit="image", ascii=True):
        image, _ = train_dataset[i]
        n += image.shape[0] * image.shape[1]
        counts += np.bincount(image.ravel(), minlength=num_classes)[:num_classes]

    assert n > 0, "dataset with masks must not be empty"

    # ENet/LinkNet class weighting: w = 1 / ln(1.02 + p).
    probs = counts / n
    weights = 1 / np.log(1.02 + probs)

    weights.round(6, out=weights)
    print(weights.tolist())
