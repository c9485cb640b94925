"""The `rs` command line: 15 subcommands composing via the filesystem.

Same tool names, ordering, and flags as the reference CLI
(robosat/tools/__main__.py:22-63). Each tool module exposes
`add_parser(subparser)` and `main(args)`.
"""

import argparse

from robosat_tpu.tools import (
    compare,
    cover,
    dedupe,
    download,
    export,
    extract,
    features,
    masks,
    merge,
    predict,
    rasterize,
    serve,
    subset,
    train,
    weights,
)


def main():
    parser = argparse.ArgumentParser(prog="./rs")
    subparser = parser.add_subparsers(title="robosat-tpu tools", metavar="")

    # Keep the reference's registration order (robosat/tools/__main__.py:28-46).
    extract.add_parser(subparser)
    cover.add_parser(subparser)
    download.add_parser(subparser)
    rasterize.add_parser(subparser)

    train.add_parser(subparser)
    export.add_parser(subparser)
    predict.add_parser(subparser)

    masks.add_parser(subparser)
    features.add_parser(subparser)
    merge.add_parser(subparser)
    dedupe.add_parser(subparser)

    serve.add_parser(subparser)

    weights.add_parser(subparser)

    compare.add_parser(subparser)
    subset.add_parser(subparser)

    subparser.required = True

    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
