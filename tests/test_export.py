"""`rs export` StableHLO artifact: serialize, reload, run, compare."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from robosat_tpu.checkpoint import save_checkpoint
from robosat_tpu.config import save_config
from robosat_tpu.models import unet
from robosat_tpu.tools import export


def test_export_roundtrip(tmp_path):
    params, state = unet.init(0, num_classes=2)
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(str(ckpt), {"params": params, "state": state}, {"epoch": 1})

    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    out = tmp_path / "model.stablehlo"
    export.main(
        argparse.Namespace(
            dataset=str(tmp_path / "dataset.toml"),
            image_size=64,
            checkpoint=str(ckpt),
            batch_size=1,
            model=str(out),
        )
    )

    assert out.stat().st_size > 1_000_000  # weights are baked in

    # The serialized artifact loads and reproduces the in-process forward.
    from jax import export as jax_export

    rehydrated = jax_export.deserialize(out.read_bytes())
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(rehydrated.call(jnp.asarray(x)))

    expected, _ = jax.jit(lambda p, s, v: unet.apply(p, s, v, train=False))(params, state, x)
    # The artifact compiles separately from the in-process jit; fp32 conv
    # reassociation differs between the two programs (~4e-3 on random-init
    # logits of magnitude ~5).
    np.testing.assert_allclose(got, np.asarray(expected), rtol=1e-3, atol=1e-2)
