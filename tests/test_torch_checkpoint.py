"""Reference .pth checkpoint ingestion: torch state_dict -> rs predict."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image

from robosat_tpu.checkpoint import convert_torch_unet, load_model_checkpoint


def _reference_style_state_dict(num_classes=2):
    """A state_dict with the reference UNet's exact key layout and shapes
    (DataParallel 'module.' prefixes, torchvision resnet50 encoder keys,
    decoder blocks as <name>.block.block.weight), random-valued."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    def add_bn(key, c):
        sd[key + ".weight"] = torch.ones(c)
        sd[key + ".bias"] = torch.zeros(c)
        sd[key + ".running_mean"] = t(c)
        sd[key + ".running_var"] = torch.ones(c) + t(c).abs()
        sd[key + ".num_batches_tracked"] = torch.tensor(1)

    p = "module.resnet."
    sd[p + "conv1.weight"] = t(64, 3, 7, 7)
    add_bn(p + "bn1", 64)
    blocks, mids = (3, 4, 6, 3), (64, 128, 256, 512)
    cin = 64
    for si, (nb, mid) in enumerate(zip(blocks, mids)):
        for bi in range(nb):
            base = "{}layer{}.{}".format(p, si + 1, bi)
            sd[base + ".conv1.weight"] = t(mid, cin, 1, 1)
            add_bn(base + ".bn1", mid)
            sd[base + ".conv2.weight"] = t(mid, mid, 3, 3)
            add_bn(base + ".bn2", mid)
            sd[base + ".conv3.weight"] = t(mid * 4, mid, 1, 1)
            add_bn(base + ".bn3", mid * 4)
            if bi == 0:
                sd[base + ".downsample.0.weight"] = t(mid * 4, cin, 1, 1)
                add_bn(base + ".downsample.1", mid * 4)
            cin = mid * 4

    nf = 32
    decoder = [
        ("center", 2048, nf * 8),
        ("dec0", 2048 + nf * 8, nf * 8),
        ("dec1", 1024 + nf * 8, nf * 8),
        ("dec2", 512 + nf * 8, nf * 2),
        ("dec3", 256 + nf * 2, nf * 4),
        ("dec4", nf * 4, nf),
    ]
    for name, c_in, c_out in decoder:
        sd["module.{}.block.block.weight".format(name)] = t(c_out, c_in, 3, 3)
    sd["module.dec5.block.weight"] = t(nf, nf, 3, 3)
    sd["module.final.weight"] = t(num_classes, nf, 1, 1)
    sd["module.final.bias"] = t(num_classes)
    return sd


def test_convert_torch_unet_shapes_match_init():
    import jax

    from robosat_tpu.models import unet

    sd = _reference_style_state_dict()
    params, state = convert_torch_unet(sd)
    ref_params, ref_state = unet.init(0, num_classes=2)

    def shapes(tree):
        return [np.shape(l) for l in jax.tree_util.tree_leaves(tree)]

    assert shapes(params) == shapes(ref_params)
    assert shapes(state) == shapes(ref_state)


def test_rs_predict_accepts_pth_checkpoint(tmp_path, slippy_fixtures):
    """The tool loads a reference-layout .pth directly (documented parity
    path) and produces valid probability tiles."""
    from robosat_tpu.config import save_config
    from robosat_tpu.tools import predict

    chkpt = {"epoch": 7, "state_dict": _reference_style_state_dict()}
    pth = tmp_path / "checkpoint-00007-of-00010.pth"
    torch.save(chkpt, str(pth))

    params, state, meta = load_model_checkpoint(str(pth), num_classes=2)
    assert meta["epoch"] == 7

    save_config(
        {"common": {"cuda": False, "batch_size": 2, "image_size": 256, "checkpoint": str(tmp_path)}},
        str(tmp_path / "model.toml"),
    )
    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    predict.main(
        argparse.Namespace(
            batch_size=2,
            checkpoint=str(pth),
            overlap=32,
            strip=1,
            tile_size=256,
            workers=2,
            tiles=str(slippy_fixtures / "images"),
            probs=str(tmp_path / "probs"),
            model=str(tmp_path / "model.toml"),
            dataset=str(tmp_path / "dataset.toml"),
            profile=None,
        )
    )

    outs = list((tmp_path / "probs").rglob("*.png"))
    assert len(outs) == 3
    img = Image.open(outs[0])
    assert img.mode == "P"
    assert img.size == (256, 256)
