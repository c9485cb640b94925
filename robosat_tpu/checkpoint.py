"""Checkpointing: pytree <-> single-file .npz archives, plus a torch converter.

Replaces the reference's torch.save/torch.load checkpoints
(robosat/tools/train.py:156-160, predict.py:60) with a self-describing numpy
archive: every leaf is stored under its flattened pytree path, and a `__meta__`
JSON blob carries epoch and structural info. Loading restores the exact nested
dict/list structure.

Also provides a converter from torchvision resnet50 state_dicts into this
framework's encoder layout (OIHW -> HWIO transpose), for running with
ImageNet-pretrained weights when a .pth file is supplied.
"""

import json
import os

import numpy as np

_META_KEY = "__meta__"


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], prefix + (str(k),), out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, prefix + ("#{}".format(i),), out)
    else:
        out["/".join(prefix)] = np.asarray(tree)


def _unflatten(flat):
    root = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [listify(node["#{}".format(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path, trees, meta=None):
    """Save named pytrees (e.g. {"params": ..., "opt_state": ...}) to `path`.

    The write is atomic (tmp file + rename) so an interrupted run never
    leaves a truncated checkpoint behind.
    """
    flat = {}
    for name, tree in trees.items():
        _flatten(tree, (name,), flat)
    flat[_META_KEY] = np.frombuffer(json.dumps(meta or {}).encode(), dtype=np.uint8)

    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Load a checkpoint; returns (trees dict, meta dict)."""
    with np.load(path) as archive:
        flat = {k: archive[k] for k in archive.files if k != _META_KEY}
        meta = json.loads(archive[_META_KEY].tobytes().decode()) if _META_KEY in archive.files else {}
    tree = _unflatten(flat)
    return tree, meta


def opt_state_to_leaves(opt_state):
    """Optimizer state (optax namedtuple pytree) -> flat list of leaves.

    npz archives store dicts/lists; optax states are namedtuple trees, so
    they are saved as their leaf list and rebuilt against a freshly
    initialized state's structure on load.
    """
    import jax

    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(opt_state)]


def leaves_to_opt_state(template, leaves):
    """Rebuild an optimizer state from leaves using `template`'s structure."""
    import jax

    structure = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(structure, leaves)


def convert_torch_unet(state_dict, num_classes=2):
    """Convert a reference robosat UNet checkpoint state_dict to our pytree.

    Reference checkpoints carry DataParallel "module." key prefixes
    (robosat/tools/train.py:156-160) and the layout of robosat/unet.py:
    resnet.* encoder, center/dec0..dec4 DecoderBlocks (x.block.block = conv),
    dec5 ConvRelu (x.block = conv), final 1x1 conv with bias. Returns
    (params, state) for robosat_tpu.models.unet — enables bit-level parity
    testing against PyTorch-trained models.
    """
    sd = {}
    for key, value in state_dict.items():
        sd[key[len("module.") :] if key.startswith("module.") else key] = value

    def arr(key):
        v = sd[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    def conv_w(key):
        return {"w": np.transpose(arr(key), (2, 3, 1, 0))}

    enc_sd = {k[len("resnet.") :]: v for k, v in sd.items() if k.startswith("resnet.")}
    enc_params, enc_state = convert_torch_resnet50(enc_sd)

    params = {"encoder": enc_params}
    params["center"] = conv_w("center.block.block.weight")
    for i in range(5):
        params["dec{}".format(i)] = conv_w("dec{}.block.block.weight".format(i))
    params["dec5"] = conv_w("dec5.block.weight")
    params["final"] = {
        "w": np.transpose(arr("final.weight"), (2, 3, 1, 0)),
        "b": arr("final.bias"),
    }
    return params, {"encoder": enc_state}


def load_model_checkpoint(path, num_classes=2):
    """Load a model checkpoint: native .npz or a reference torch .pth.

    Returns (params, state, meta).
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        chkpt = torch.load(path, map_location="cpu", weights_only=True)
        state_dict = chkpt.get("state_dict", chkpt)
        params, state = convert_torch_unet(state_dict, num_classes)
        return params, state, {"epoch": int(chkpt.get("epoch", 0))}

    trees, meta = load_checkpoint(path)
    return trees["params"], trees["state"], meta


def convert_torch_resnet50(state_dict):
    """Convert a torchvision resnet50 state_dict into this encoder's pytree.

    Handles the key layout of torchvision.models.resnet50 (the reference
    encoder, robosat/unet.py:94): conv weights transpose OIHW -> HWIO; batch
    norm weight/bias -> scale/bias params and running_mean/var -> state.
    Accepts tensors or numpy arrays as values. Returns (params, state) for
    robosat_tpu.models.resnet.
    """

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    def conv(key):
        return {"w": np.transpose(arr(key + ".weight"), (2, 3, 1, 0))}

    def bn(key):
        params = {"scale": arr(key + ".weight"), "bias": arr(key + ".bias")}
        state = {"mean": arr(key + ".running_mean"), "var": arr(key + ".running_var")}
        return params, state

    params, state = {}, {}
    params["conv1"] = conv("conv1")
    params["bn1"], state["bn1"] = bn("bn1")

    blocks_per_stage = (3, 4, 6, 3)
    for si, blocks in enumerate(blocks_per_stage):
        stage_p, stage_s = [], []
        for bi in range(blocks):
            base = "layer{}.{}".format(si + 1, bi)
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp["conv{}".format(ci)] = conv("{}.conv{}".format(base, ci))
                bp["bn{}".format(ci)], bs["bn{}".format(ci)] = bn("{}.bn{}".format(base, ci))
            if "{}.downsample.0.weight".format(base) in state_dict:
                bp["down_conv"] = conv("{}.downsample.0".format(base))
                bp["down_bn"], bs["down_bn"] = bn("{}.downsample.1".format(base))
            stage_p.append(bp)
            stage_s.append(bs)
        params["layer{}".format(si + 1)] = stage_p
        state["layer{}".format(si + 1)] = stage_s

    return params, state


def convert_torch_deeplab(state_dict, num_classes=2):
    """Convert a torch DeepLabv3+ state_dict (the layout of the raw-torch
    oracle in tests/test_torch_deeplab_parity.py: `resnet.*` torchvision
    backbone with dilated layer4 + `<name>.0/.1` conv/BN pairs for ASPP and
    decoder heads) to robosat_tpu.models.deeplab's (params, state)."""
    sd = {}
    for key, value in state_dict.items():
        sd[key[len("module.") :] if key.startswith("module.") else key] = value

    def arr(key):
        v = sd[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    enc_sd = {k[len("resnet.") :]: v for k, v in sd.items() if k.startswith("resnet.")}
    enc_params, enc_state = convert_torch_resnet50(enc_sd)
    params = {"encoder": enc_params}
    state = {"encoder": enc_state}

    def cbr(name):
        p = {
            "conv": {"w": np.transpose(arr(name + ".0.weight"), (2, 3, 1, 0))},
            "bn": {"scale": arr(name + ".1.weight"), "bias": arr(name + ".1.bias")},
        }
        s = {"bn": {"mean": arr(name + ".1.running_mean"), "var": arr(name + ".1.running_var")}}
        return p, s

    for name in ("aspp1", "aspp_d0", "aspp_d1", "aspp_d2", "aspp_pool", "aspp_proj", "lowlevel", "dec1", "dec2"):
        params[name], state[name] = cbr(name)
    params["final"] = {
        "w": np.transpose(arr("final.weight"), (2, 3, 1, 0)),
        "b": arr("final.bias"),
    }
    return params, state


def convert_torch_segformer(state_dict, num_classes=2):
    """Convert a torch SegFormer state_dict (the layout of the raw-torch
    oracle in tests/test_torch_segformer_parity.py: `stages.<i>.*` MiT
    stages, `proj.<i>` decoder projections, fuse/fuse_bn/final) to
    robosat_tpu.models.segformer's (params, state)."""
    from robosat_tpu.models.segformer import DEPTHS, EMBED_DIMS, SR_RATIOS

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    def conv_w(key):
        return np.transpose(arr(key), (2, 3, 1, 0))

    def dw_conv_w(key):
        # torch depthwise (C, 1, kh, kw) -> HWIO with feature groups: (kh, kw, 1, C).
        return np.transpose(arr(key), (2, 3, 1, 0))

    def dense(key):
        return {"w": np.transpose(arr(key + ".weight"), (1, 0)), "b": arr(key + ".bias")}

    def ln(key):
        return {"scale": arr(key + ".weight"), "bias": arr(key + ".bias")}

    params = {"stages": []}
    for si in range(len(EMBED_DIMS)):
        base = "stages.{}".format(si)
        stage = {
            "patch": {"w": conv_w(base + ".patch.weight"), "b": arr(base + ".patch.bias")},
            "patch_ln": ln(base + ".patch_ln"),
            "blocks": [],
            "ln": ln(base + ".ln"),
        }
        for bi in range(DEPTHS[si]):
            bb = "{}.blocks.{}".format(base, bi)
            block = {
                "ln1": ln(bb + ".ln1"),
                "q": dense(bb + ".q"),
                "kv": dense(bb + ".kv"),
                "proj": dense(bb + ".proj"),
                "ln2": ln(bb + ".ln2"),
                "fc1": dense(bb + ".fc1"),
                "dw": {"w": dw_conv_w(bb + ".dw.weight"), "b": arr(bb + ".dw.bias")},
                "fc2": dense(bb + ".fc2"),
            }
            if SR_RATIOS[si] > 1:
                block["sr"] = {"w": conv_w(bb + ".sr.weight"), "b": arr(bb + ".sr.bias")}
                block["sr_ln"] = ln(bb + ".sr_ln")
            stage["blocks"].append(block)
        params["stages"].append(stage)

    params["proj"] = [dense("proj.{}".format(i)) for i in range(len(EMBED_DIMS))]
    params["fuse"] = {"w": conv_w("fuse.weight")}
    params["fuse_bn"] = {"scale": arr("fuse_bn.weight"), "bias": arr("fuse_bn.bias")}
    state = {
        "fuse_bn": {"mean": arr("fuse_bn.running_mean"), "var": arr("fuse_bn.running_var")}
    }
    params["final"] = {"w": conv_w("final.weight"), "b": arr("final.bias")}
    return params, state
