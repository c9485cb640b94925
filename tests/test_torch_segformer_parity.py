"""Numeric forward parity of the SegFormer family against a raw-torch oracle.

Same pattern as the U-Net/DeepLab oracles: the identical architecture
(MiT-B0 encoder — overlapped patch embeddings, spatial-reduction attention,
Mix-FFN — plus the all-MLP decoder) built in raw torch, random weights
converted via robosat_tpu.checkpoint.convert_torch_segformer, and the JAX
eval forward pinned at logit level. Exercises LayerNorm, attention
softmax, exact-erf GELU, depthwise convs, and bilinear resizes across the
framework boundary.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from robosat_tpu.checkpoint import convert_torch_segformer  # noqa: E402
from robosat_tpu.models import segformer  # noqa: E402
from robosat_tpu.models.segformer import DECODER_DIM, DEPTHS, EMBED_DIMS, MLP_RATIO, NUM_HEADS, SR_RATIOS  # noqa: E402
from robosat_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD, normalize  # noqa: E402

LN_EPS = 1e-6


class _Block(nn.Module):
    def __init__(self, dim, heads, sr_ratio):
        super().__init__()
        self.heads = heads
        self.sr_ratio = sr_ratio
        self.ln1 = nn.LayerNorm(dim, eps=LN_EPS)
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, 2 * dim)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio)
            self.sr_ln = nn.LayerNorm(dim, eps=LN_EPS)
        self.ln2 = nn.LayerNorm(dim, eps=LN_EPS)
        self.fc1 = nn.Linear(dim, MLP_RATIO * dim)
        self.dw = nn.Conv2d(MLP_RATIO * dim, MLP_RATIO * dim, 3, padding=1, groups=MLP_RATIO * dim)
        self.fc2 = nn.Linear(MLP_RATIO * dim, dim)

    def forward(self, x):  # x: NCHW
        n, c, h, w = x.shape
        hd = c // self.heads
        y = self.ln1(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        q = self.q(y.flatten(2).transpose(1, 2)).reshape(n, h * w, self.heads, hd)
        if self.sr_ratio > 1:
            red = self.sr(y)
            red = self.sr_ln(red.permute(0, 2, 3, 1))
            kv_in = red.reshape(n, -1, c)
        else:
            kv_in = y.flatten(2).transpose(1, 2)
        kv = self.kv(kv_in).reshape(n, -1, 2, self.heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = torch.einsum("nqhd,nkhd->nhqk", q, k) / (hd**0.5)
        attn = attn.softmax(dim=-1)
        out = torch.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, h, w, c)
        x = x + self.proj(out).permute(0, 3, 1, 2)

        y = self.ln2(x.permute(0, 2, 3, 1))
        y = self.fc1(y).permute(0, 3, 1, 2)
        y = self.dw(y)
        y = F.gelu(y)  # exact erf
        y = self.fc2(y.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return x + y


class _Stage(nn.Module):
    def __init__(self, si, cin):
        super().__init__()
        dim = EMBED_DIMS[si]
        k, s = (7, 4) if si == 0 else (3, 2)
        self.patch = nn.Conv2d(cin, dim, k, stride=s, padding=k // 2)
        self.patch_ln = nn.LayerNorm(dim, eps=LN_EPS)
        self.blocks = nn.ModuleList([_Block(dim, NUM_HEADS[si], SR_RATIOS[si]) for _ in range(DEPTHS[si])])
        self.ln = nn.LayerNorm(dim, eps=LN_EPS)

    def forward(self, x):
        x = self.patch(x)
        x = self.patch_ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for b in self.blocks:
            x = b(x)
        return self.ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class TorchSegFormer(nn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        cin = 3
        self.stages = nn.ModuleList()
        for si, dim in enumerate(EMBED_DIMS):
            self.stages.append(_Stage(si, cin))
            cin = dim
        self.proj = nn.ModuleList([nn.Linear(dim, DECODER_DIM) for dim in EMBED_DIMS])
        self.fuse = nn.Conv2d(4 * DECODER_DIM, DECODER_DIM, 1, bias=False)
        self.fuse_bn = nn.BatchNorm2d(DECODER_DIM)
        self.final = nn.Conv2d(DECODER_DIM, num_classes, 1)

    def forward(self, x):
        h, w = x.shape[2], x.shape[3]
        feats = []
        out = x
        for stage in self.stages:
            out = stage(out)
            feats.append(out)
        h4, w4 = feats[0].shape[2], feats[0].shape[3]
        fused = []
        for feat, proj in zip(feats, self.proj):
            y = proj(feat.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            if y.shape[2] != h4:
                y = F.interpolate(y, size=(h4, w4), mode="bilinear", align_corners=False)
            fused.append(y)
        out = self.fuse(torch.cat(fused, 1))
        out = F.relu(self.fuse_bn(out))
        logits = self.final(out)
        return F.interpolate(logits, size=(h, w), mode="bilinear", align_corners=False)


@pytest.mark.slow
def test_segformer_forward_logit_parity():
    torch.manual_seed(0)
    net = TorchSegFormer()
    net.eval()
    params, state = convert_torch_segformer(net.state_dict())

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    x = (raw.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    with torch.no_grad():
        ref = np.transpose(net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy(), (0, 2, 3, 1))

    ours = np.asarray(
        jax.jit(lambda p, s, r: segformer.apply(p, s, normalize(r), train=False)[0])(params, state, raw),
        np.float32,
    )
    rel = np.linalg.norm(ours - ref) / max(np.linalg.norm(ref), 1e-30)
    assert rel <= 1e-4, "SegFormer eval logits drifted from the torch oracle (rel {})".format(rel)
