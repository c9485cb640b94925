"""ONNX export (robosat_tpu/utils/onnx.py): schema + semantics validation.

Three independent pins, none requiring the onnx package:

1. Schema ground truth: torch.onnx.export (its C++ serializer embeds the
   real onnx.proto) emits a tiny Conv+Relu model; our wire-format reader
   must recover its structure — field numbers, attribute encodings, tensor
   raw_data — proving our hand-rolled schema subset matches real ONNX.
2. Writer->reader roundtrip over the exported U-Net.
3. Semantics: the exported U-Net graph is executed by a from-scratch ONNX
   interpreter built on TORCH ops (an independent executor) and compared
   numerically to the JAX forward (unet.apply_folded).

Reference export surface: robosat/tools/export.py:38-40 (torch.onnx).
"""

import numpy as np
import pytest

from robosat_tpu.utils import onnx as ox

torch = pytest.importorskip("torch")


def _torch_onnx_bytes(module, x):
    """torch.onnx.export without the onnx pip package: the serialization is
    all C++; only the no-op onnxscript post-step imports onnx — bypass it."""
    import io

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(module, x, buf, dynamo=False)
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


# --- minimal ONNX reader on top of the wire decoder --------------------------


def _parse_tensor(data):
    fm = ox.field_map(data)
    dims = [int(v) for v in fm.get(1, [])]
    dtype = int(fm[2][0])
    name = fm.get(8, [b""])[0].decode()
    if 9 in fm:
        raw = fm[9][0]
    elif 4 in fm:  # float_data fallback (unused by torch/our writer)
        import struct

        raw = b"".join(struct.pack("<f", struct.unpack("<f", v)[0]) for v in fm[4])
    else:
        raw = b""
    np_dtype = {ox.FLOAT: np.float32, ox.INT64: np.int64, ox.INT32: np.int32}[dtype]
    arr = np.frombuffer(raw, np_dtype).reshape(dims) if raw else np.zeros(dims, np_dtype)
    return name, arr


def _parse_attr(data):
    import struct

    fm = ox.field_map(data)
    name = fm[1][0].decode()
    at = int(fm.get(20, [0])[0])
    if at == 2:  # INT
        return name, int(fm[3][0])
    if at == 1:  # FLOAT
        return name, struct.unpack("<f", fm[2][0])[0]
    if at == 3:  # STRING
        return name, fm[4][0]
    if at == 7:  # INTS
        return name, [int(v) for v in fm.get(8, [])]
    if at == 6:  # FLOATS
        return name, [struct.unpack("<f", v)[0] for v in fm.get(7, [])]
    if at == 4:  # TENSOR
        return name, _parse_tensor(fm[5][0])[1]
    return name, None


def _parse_node(data):
    fm = ox.field_map(data)
    return {
        "inputs": [v.decode() for v in fm.get(1, [])],
        "outputs": [v.decode() for v in fm.get(2, [])],
        "op": fm[4][0].decode(),
        "attrs": dict(_parse_attr(a) for a in fm.get(5, [])),
    }


def parse_model(data):
    fm = ox.field_map(data)
    g = ox.field_map(fm[7][0])
    inits = dict(_parse_tensor(t) for t in g.get(5, []))
    nodes = [_parse_node(n) for n in g.get(1, [])]
    inputs = [ox.field_map(vi)[1][0].decode() for vi in g.get(11, [])]
    outputs = [ox.field_map(vi)[1][0].decode() for vi in g.get(12, [])]
    return {
        "ir_version": int(fm[1][0]),
        "nodes": nodes,
        "initializers": inits,
        "inputs": inputs,
        "outputs": outputs,
    }


def test_reader_parses_real_torch_onnx():
    """Field-number agreement with real-world ONNX: decode an actual
    torch.onnx export with our reader."""
    m = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 3, padding=1), torch.nn.ReLU()).eval()
    parsed = parse_model(_torch_onnx_bytes(m, torch.randn(1, 3, 8, 8)))

    assert parsed["ir_version"] >= 7
    ops = [n["op"] for n in parsed["nodes"]]
    assert "Conv" in ops and "Relu" in ops
    conv = next(n for n in parsed["nodes"] if n["op"] == "Conv")
    assert conv["attrs"]["pads"] == [1, 1, 1, 1]
    assert conv["attrs"]["strides"] == [1, 1]
    assert conv["attrs"]["kernel_shape"] == [3, 3]
    # weight initializer bytes equal the torch tensor bytes
    wname = conv["inputs"][1]
    got = parsed["initializers"][wname]
    np.testing.assert_array_equal(got, m[0].weight.detach().numpy())


# --- independent executor: ONNX graph -> torch ops ---------------------------


def run_onnx_with_torch(model_bytes, feeds):
    """Execute a parsed ONNX graph with torch functional ops. Supports the
    op set the exporter emits: Conv, Relu, MaxPool, Add, Concat, Resize."""
    import torch.nn.functional as F

    parsed = parse_model(model_bytes)
    env = {k: torch.from_numpy(np.asarray(v)) for k, v in parsed["initializers"].items()}
    env.update({k: torch.from_numpy(np.asarray(v)) for k, v in feeds.items()})
    env[""] = None

    for n in parsed["nodes"]:
        ins = [env[i] for i in n["inputs"]]
        a = n["attrs"]
        if n["op"] == "Conv":
            ph, pw = a["pads"][0], a["pads"][1]
            assert a["pads"] == [ph, pw, ph, pw], "symmetric pads only"
            bias = ins[2] if len(ins) > 2 else None
            out = F.conv2d(ins[0], ins[1], bias, stride=tuple(a["strides"]), padding=(ph, pw))
        elif n["op"] == "Relu":
            out = F.relu(ins[0])
        elif n["op"] == "MaxPool":
            out = F.max_pool2d(
                ins[0], tuple(a["kernel_shape"]), stride=tuple(a["strides"]), padding=a["pads"][0]
            )
        elif n["op"] == "Add":
            out = ins[0] + ins[1]
        elif n["op"] == "Concat":
            out = torch.cat(ins, dim=a["axis"])
        elif n["op"] == "Resize":
            assert a["mode"] == b"nearest" and a["coordinate_transformation_mode"] == b"asymmetric"
            scales = ins[2].tolist()
            assert scales[:2] == [1.0, 1.0]
            out = F.interpolate(ins[0], scale_factor=tuple(scales[2:]), mode="nearest")
        else:
            raise AssertionError("unexpected op {}".format(n["op"]))
        env[n["outputs"][0]] = out

    return {name: env[name].numpy() for name in parsed["outputs"]}


def test_unet_onnx_matches_jax_forward():
    """The exported ONNX U-Net, executed by the torch interpreter above,
    reproduces unet.apply_folded logits (fp32, rel<=1e-4)."""
    import jax.numpy as jnp

    from robosat_tpu.models import unet

    params, state = unet.init(0, num_classes=2)
    folded = unet.fold(params, state)

    size = 64
    model_bytes = ox.export_unet_onnx(folded, num_classes=2, image_size=size, batch_size=1)

    rng = np.random.default_rng(3)
    x_nhwc = rng.normal(0, 1, (1, size, size, 3)).astype(np.float32)

    ref = np.asarray(unet.apply_folded(folded, jnp.asarray(x_nhwc)), np.float32)

    out = run_onnx_with_torch(model_bytes, {"input": np.transpose(x_nhwc, (0, 3, 1, 2))})
    got = np.transpose(out["logits"], (0, 2, 3, 1))

    assert got.shape == ref.shape
    # fp32 conv accumulation orders differ between executors; random-init
    # logits span ~1e3, so pin error relative to the logit SCALE (per-pixel
    # relative error explodes at near-zero logits for no semantic reason).
    scale = float(np.abs(ref).max())
    assert float(np.max(np.abs(got - ref))) <= 1e-4 * scale


def test_unet_onnx_roundtrip_structure():
    """Writer->reader roundtrip: graph IO names, op census, initializer
    count/dtype, and static shapes."""
    from robosat_tpu.models import unet

    params, state = unet.init(1, num_classes=3)
    folded = unet.fold(params, state)
    parsed = parse_model(ox.export_unet_onnx(folded, num_classes=3, image_size=128, batch_size=2))

    assert parsed["inputs"] == ["input"] and parsed["outputs"] == ["logits"]
    ops = [n["op"] for n in parsed["nodes"]]
    # 1 stem + 16 blocks x (3|4 convs) + 7 decoder convs + final:
    # blocks with projection: layer1[0], layer2[0], layer3[0], layer4[0].
    assert ops.count("Conv") == 1 + (3 * 16 + 4) + 7 + 1
    assert ops.count("Resize") == 6  # center + dec0..dec4 upsamples
    assert ops.count("Concat") == 4
    assert ops.count("MaxPool") == 2  # stem + center pool
    # every initializer is float32 and named by its consumer
    for name, arr in parsed["initializers"].items():
        assert arr.dtype == np.float32
        assert name.endswith(("_w", "_b", "_scales"))
    # consumers resolve: every node input is a prior output, initializer, or input
    known = set(parsed["initializers"]) | {"input", ""}
    for n in parsed["nodes"]:
        for i in n["inputs"]:
            assert i in known, "dangling input {}".format(i)
        known.update(n["outputs"])
