"""Numeric forward parity of the DeepLabv3+ family against a raw-torch oracle.

DeepLabv3+ is this framework's second model family (beyond the reference,
BASELINE.json stretch config). Its correctness story needs an EXTERNAL
oracle like the U-Net's (tests/test_torch_parity.py): the same architecture
(Chen et al. 2018 — dilated-layer4 ResNet-50 backbone, ASPP at rates
6/12/18 with an image-pool branch, 48-channel low-level fusion decoder) is
built here in raw torch, random weights convert through
robosat_tpu.checkpoint.convert_torch_deeplab, and the JAX eval forward must
agree at logit level; the folded and hybrid-int8 fast paths must agree with
the eval path downstream of that.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robosat_tpu.checkpoint import convert_torch_deeplab  # noqa: E402
from robosat_tpu.models import deeplab  # noqa: E402
from robosat_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD, normalize  # noqa: E402


class _BottleneckD(nn.Module):
    """torchvision resnet50 bottleneck with optional conv2 dilation."""

    def __init__(self, cin, mid, stride, dilation=1):
        super().__init__()
        cout = mid * 4
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        shortcut = x if self.downsample is None else self.downsample(x)
        return F.relu(out + shortcut)


class _Resnet50OS16(nn.Module):
    """resnet50 at output stride 16: layer4 stride 1, conv2 dilation 2
    (mirrors robosat_tpu.models.resnet apply(dilate_last_stage=True))."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for si, (blocks, mid) in enumerate(((3, 64), (4, 128), (6, 256), (3, 512))):
            last = si == 3
            stage = []
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0 and not last) else 1
                stage.append(_BottleneckD(cin, mid, stride, dilation=2 if last else 1))
                cin = mid * 4
            setattr(self, "layer{}".format(si + 1), nn.Sequential(*stage))

    def forward(self, x):
        e0 = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        e1 = self.layer1(e0)
        e4 = self.layer4(self.layer3(self.layer2(e1)))
        return e1, e4


def _cbr(cin, cout, k, dilation=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=(k // 2) * dilation, dilation=dilation, bias=False),
        nn.BatchNorm2d(cout),
    )


class TorchDeepLab(nn.Module):
    """Raw-torch mirror of robosat_tpu.models.deeplab (same key layout as
    checkpoint.convert_torch_deeplab expects)."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.resnet = _Resnet50OS16()
        self.aspp1 = _cbr(2048, 256, 1)
        self.aspp_d0 = _cbr(2048, 256, 3, dilation=6)
        self.aspp_d1 = _cbr(2048, 256, 3, dilation=12)
        self.aspp_d2 = _cbr(2048, 256, 3, dilation=18)
        self.aspp_pool = _cbr(2048, 256, 1)
        self.aspp_proj = _cbr(256 * 5, 256, 1)
        self.lowlevel = _cbr(256, 48, 1)
        self.dec1 = _cbr(256 + 48, 256, 3)
        self.dec2 = _cbr(256, 256, 3)
        self.final = nn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        h, w = x.shape[2], x.shape[3]
        e1, e4 = self.resnet(x)
        branches = [
            F.relu(self.aspp1(e4)),
            F.relu(self.aspp_d0(e4)),
            F.relu(self.aspp_d1(e4)),
            F.relu(self.aspp_d2(e4)),
        ]
        pooled = F.relu(self.aspp_pool(e4.mean(dim=(2, 3), keepdim=True)))
        branches.append(pooled.expand_as(branches[0]))
        aspp = F.relu(self.aspp_proj(torch.cat(branches, 1)))

        low = F.relu(self.lowlevel(e1))
        up = F.interpolate(aspp, size=low.shape[2:], mode="bilinear", align_corners=False)
        out = F.relu(self.dec1(torch.cat([up, low], 1)))
        out = F.relu(self.dec2(out))
        logits = self.final(out)
        return F.interpolate(logits, size=(h, w), mode="bilinear", align_corners=False)


def _random_net(seed):
    torch.manual_seed(seed)
    net = TorchDeepLab()
    # Keep magnitudes sane so deep products stay in a comparable range.
    with torch.no_grad():
        for p in net.parameters():
            if p.dim() > 1:
                p.mul_(0.25)
    net.eval()
    return net


@pytest.mark.slow
def test_deeplab_forward_logit_parity():
    """Converted torch weights: eval logits agree at rel <= 1e-4 (256px)."""
    net = _random_net(0)
    params, state = convert_torch_deeplab(net.state_dict())

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8)
    x = (raw.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    with torch.no_grad():
        ref = np.transpose(net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy(), (0, 2, 3, 1))

    ours = np.asarray(
        jax.jit(lambda p, s, r: deeplab.apply(p, s, normalize(r), train=False)[0])(params, state, raw),
        np.float32,
    )
    rel = np.linalg.norm(ours - ref) / max(np.linalg.norm(ref), 1e-30)
    assert rel <= 1e-4, "DeepLab eval logits drifted from the torch oracle (rel {})".format(rel)


@pytest.mark.slow
def test_deeplab_folded_and_int8_track_oracle():
    """The folded fast path stays at oracle-level agreement and the hybrid
    int8 path's quantized masks agree with the folded ones on converted
    (realistic-layout) weights."""
    from robosat_tpu.models import int8 as q8

    net = _random_net(1)
    params, state = convert_torch_deeplab(net.state_dict())

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    x = np.asarray(normalize(raw), np.float32)

    folded = jax.jit(deeplab.fold)(params, state)
    eval_logits = np.asarray(
        jax.jit(lambda p, s, r: deeplab.apply(p, s, r, train=False)[0])(params, state, x), np.float32
    )
    folded_logits = np.asarray(jax.jit(deeplab.apply_folded)(folded, x), np.float32)
    rel = np.linalg.norm(folded_logits - eval_logits) / max(np.linalg.norm(eval_logits), 1e-30)
    assert rel <= 1e-4

    amaxes = np.asarray(jax.jit(lambda f, r: deeplab.calibration_amaxes_int8(f, r))(folded, x))
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(deeplab.quantize_folded_int8)(folded)
    fp_q = np.asarray(jax.jit(lambda f, r: deeplab.predict_quantized_folded(f, r))(folded, x))
    q_q = np.asarray(
        jax.jit(lambda qt, r: deeplab.predict_quantized_int8(qt, scales, r, compute_dtype=jnp.float32))(qtree, x)
    )
    assert ((fp_q >= 128) == (q_q >= 128)).mean() >= 0.97
