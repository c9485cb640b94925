"""Minimal XSpace/XPlane protobuf parser for TPU op-level profiling.

jax.profiler traces serialize to the xplane wire format
(tensorflow/tsl/profiler/protobuf/xplane.proto); nothing in this image can
read it back (tensorboard-plugin-profile ships no xplane_pb2 and tensorflow
isn't installed), so this decodes the few fields op-level timing needs
straight off the wire. Usage:

    python benchmarks/xplane.py /tmp/trace/plugins/profile/*/NAME.xplane.pb

prints per-op total device time, sorted, per TPU plane.
"""

import collections
import struct
import sys


def _read_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) for one message's wire bytes."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            value = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == 2:  # length-delimited
            size, pos = _read_varint(buf, pos)
            value = buf[pos : pos + size]
            pos += size
        elif wire == 5:  # 32-bit
            value = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError("unsupported wire type {}".format(wire))
        yield field, wire, value


def parse_plane(buf):
    """XPlane bytes -> (name, {op_name: total_ms}, {op_name: count})."""
    name = ""
    ev_names = {}
    lines = []
    for field, _, value in _fields(buf):
        if field == 2:
            name = value.decode()
        elif field == 3:
            lines.append(value)
        elif field == 4:  # map<int64, XEventMetadata>
            meta_id = meta_name = None
            for f2, _, v2 in _fields(value):
                if f2 == 2:  # value: XEventMetadata
                    mid = mname = None
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 2:
                            mname = v3.decode()
                    meta_id, meta_name = mid, mname
            if meta_id is not None:
                ev_names[meta_id] = meta_name or ""
    totals = collections.Counter()
    counts = collections.Counter()
    for line_buf in lines:
        for field, _, value in _fields(line_buf):
            if field == 4:  # XEvent
                meta_id = duration_ps = 0
                occurrences = 1
                for f2, _, v2 in _fields(value):
                    if f2 == 1:
                        meta_id = v2
                    elif f2 == 3:
                        duration_ps = v2
                    elif f2 == 5:
                        occurrences = v2
                op = ev_names.get(meta_id, "?")
                totals[op] += duration_ps / 1e9  # -> ms
                counts[op] += occurrences
    return name, totals, counts


def parse_space(path):
    """xplane.pb file -> [(plane_name, totals_ms, counts)]."""
    buf = open(path, "rb").read()
    planes = []
    for field, _, value in _fields(buf):
        if field == 1:
            planes.append(parse_plane(value))
    return planes


def main(argv):
    top = int(argv[2]) if len(argv) > 2 else 40
    for plane_name, totals, counts in parse_space(argv[1]):
        if "TPU" not in plane_name and "/device" not in plane_name.lower():
            continue
        print("== plane: {}  (total {:.2f} ms)".format(plane_name, sum(totals.values())))
        for op, ms in totals.most_common(top):
            print("{:9.3f} ms  x{:<5d} {}".format(ms, counts[op], op[:120]))


if __name__ == "__main__":
    main(sys.argv)
