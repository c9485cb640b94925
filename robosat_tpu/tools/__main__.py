"""The `rs` command line: 15 subcommands composing via the filesystem.

Tool names and ordering follow the reference CLI (robosat/tools/__main__.py);
each tool module contributes `add_parser(subparser)` + `main(args)`.
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

# Data prep -> ML -> post-processing -> serving -> utilities.
TOOLS = (
    extract,
    cover,
    download,
    rasterize,
    train,
    export,
    predict,
    masks,
    features,
    merge,
    dedupe,
    serve,
    weights,
    compare,
    subset,
)


def main():
    parser = argparse.ArgumentParser(prog="./rs")
    subparser = parser.add_subparsers(title="robosat-tpu tools", metavar="")

    for tool in TOOLS:
        tool.add_parser(subparser)

    subparser.required = True

    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
