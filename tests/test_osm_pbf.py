"""OSM PBF decoder test against a hand-encoded synthetic .osm.pbf file."""

import struct
import zlib

import pytest

from robosat_tpu.osm.pbf import iter_pbf_ways


def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_enc(n):
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _field(num, wire, payload):
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    raise ValueError(wire)


def _packed_signed(values):
    out = b""
    for v in values:
        out += _varint(_zigzag_enc(v))
    return out


def _packed_unsigned(values):
    out = b""
    for v in values:
        out += _varint(v)
    return out


@pytest.fixture
def pbf_file(tmp_path):
    """A minimal OSMData blob: 4 dense nodes + 1 closed tagged way."""
    # String table: index 0 must be the empty string.
    strings = [b"", b"amenity", b"parking"]
    stringtable = b"".join(_field(1, 2, s) for s in strings)

    # Dense nodes: ids 1..4, lon/lat deltas in nano-degrees / granularity 100.
    ids = [1, 1, 1, 1]  # deltas -> 1, 2, 3, 4
    # lon 13.4, 13.401, 13.401, 13.4 ; lat 52.52, 52.52, 52.521, 52.521
    lons_nano = [13400000000, 1000000, 0, -1000000]
    lats_nano = [52520000000, 0, 1000000, 0]
    gran = 100
    lons = [v // gran for v in lons_nano]
    lats = [v // gran for v in lats_nano]
    dense = (
        _field(1, 2, _packed_signed(ids))
        + _field(8, 2, _packed_signed(lats))
        + _field(9, 2, _packed_signed(lons))
    )

    # Way 100: refs 1,2,3,4,1 (closed), tags amenity=parking.
    refs = [1, 1, 1, 1, -3]
    way = (
        _field(1, 0, 100)
        + _field(2, 2, _packed_unsigned([1]))  # keys -> "amenity"
        + _field(3, 2, _packed_unsigned([2]))  # vals -> "parking"
        + _field(8, 2, _packed_signed(refs))
    )

    group_nodes = _field(2, 2, dense)
    group_ways = _field(3, 2, way)

    block = _field(1, 2, stringtable) + _field(2, 2, group_nodes) + _field(2, 2, group_ways)

    compressed = zlib.compress(block)
    blob = _field(2, 0, len(block)) + _field(3, 2, compressed)
    header = _field(1, 2, b"OSMData") + _field(3, 0, len(blob))

    path = tmp_path / "map.osm.pbf"
    with open(path, "wb") as fp:
        fp.write(struct.pack(">i", len(header)))
        fp.write(header)
        fp.write(blob)
    return str(path)


def test_iter_pbf_ways(pbf_file):
    ways = list(iter_pbf_ways(pbf_file))
    assert len(ways) == 1
    w = ways[0]
    assert w.id == 100
    assert w.tags == {"amenity": "parking"}
    assert w.is_closed()
    assert len(w.nodes) == 5
    assert w.nodes[0].lon == pytest.approx(13.4, abs=1e-7)
    assert w.nodes[0].lat == pytest.approx(52.52, abs=1e-7)
    assert w.nodes[2].lon == pytest.approx(13.401, abs=1e-7)
    assert w.nodes[2].lat == pytest.approx(52.521, abs=1e-7)
    assert w.nodes[4].ref == w.nodes[0].ref
