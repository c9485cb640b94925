"""Threaded prefetch loader and download-tool tests (no external network)."""

import argparse
import functools
import http.server
import os
import threading

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.data.loader import batches


class _RangeDataset:
    def __init__(self, n, shape=(4, 4)):
        self.n = n
        self.shape = shape

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full(self.shape, i, np.uint8), np.full(self.shape, i + 100, np.int32), ("meta", i)


def test_batches_shapes_and_padding():
    ds = _RangeDataset(10)
    out = list(batches(ds, batch_size=4))
    assert [b.valid for b in out] == [4, 4, 2]
    for b in out:
        assert b.arrays[0].shape == (4, 4, 4)  # padded to batch size
        assert b.arrays[1].shape == (4, 4, 4)
        assert len(b.meta) == b.valid
    # Padding repeats the last sample.
    last = out[-1]
    np.testing.assert_array_equal(last.arrays[0][1], last.arrays[0][3])


def test_batches_drop_last_and_order():
    ds = _RangeDataset(10)
    out = list(batches(ds, batch_size=4, drop_last=True))
    assert [b.valid for b in out] == [4, 4]
    ids = [m[1] for b in out for m in b.meta]
    assert ids == list(range(8))  # deterministic order without shuffle


def test_batches_shuffle_deterministic_by_seed():
    ds = _RangeDataset(16)
    ids_a = [m[1] for b in batches(ds, 4, shuffle=True, seed=7) for m in b.meta]
    ids_b = [m[1] for b in batches(ds, 4, shuffle=True, seed=7) for m in b.meta]
    ids_c = [m[1] for b in batches(ds, 4, shuffle=True, seed=8) for m in b.meta]
    assert ids_a == ids_b
    assert ids_a != ids_c
    assert sorted(ids_a) == list(range(16))


def test_batches_propagates_errors():
    class Broken(_RangeDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("decode failed")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="decode failed"):
        list(batches(Broken(8), 4))


def test_download_tool_local_server(tmp_path):
    """`rs download` against a local HTTP server: fetch, re-encode, skip failures."""
    from robosat_tpu.tools import download

    # Source tiles served over HTTP.
    src = tmp_path / "src"
    (src / "18" / "100").mkdir(parents=True)
    Image.fromarray(np.full((32, 32, 3), 42, np.uint8)).save(src / "18" / "100" / "200.png")

    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(src))
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    csv_path = tmp_path / "tiles.csv"
    csv_path.write_text("100,200,18\n100,201,18\n")  # second tile 404s

    out = tmp_path / "out"
    try:
        download.main(
            argparse.Namespace(
                url="http://127.0.0.1:{}/{{z}}/{{x}}/{{y}}.png".format(port),
                ext="png",
                rate=10,
                tiles=str(csv_path),
                out=str(out),
            )
        )
    finally:
        server.shutdown()

    fetched = out / "18" / "100" / "200.png"
    assert fetched.exists()
    img = np.asarray(Image.open(fetched).convert("RGB"))
    assert (img == 42).all()
    # The 404 tile was skipped, not written.
    assert not (out / "18" / "100" / "201.png").exists()
