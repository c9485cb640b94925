"""Tool error-path contracts (the reference's sys.exit guards)."""

import argparse

import pytest

from robosat_tpu.config import save_config


def test_train_requires_weights_for_weighted_losses(tmp_path):
    """CrossEntropy/mIoU/Focal without [weights] exits with an error
    (robosat/tools/train.py:75-79 parity)."""
    from robosat_tpu.tools import train

    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )
    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": 64, "checkpoint": str(tmp_path / "ckpt")},
            "opt": {"epochs": 1, "lr": 0.0001, "loss": "CrossEntropy"},
        },
        str(tmp_path / "model.toml"),
    )

    with pytest.raises(SystemExit, match="weights"):
        train.main(
            argparse.Namespace(
                model=str(tmp_path / "model.toml"),
                dataset=str(tmp_path / "dataset.toml"),
                checkpoint=None,
                resume=False,
                workers=0,
                profile=None,
            )
        )


def test_train_rejects_unknown_loss(tmp_path):
    from robosat_tpu.tools import train

    save_config(
        {
            "common": {"dataset": str(tmp_path), "classes": ["background", "parking"], "colors": ["denim", "orange"]},
            "weights": {"values": [1.0, 2.0]},
        },
        str(tmp_path / "dataset.toml"),
    )
    save_config(
        {
            "common": {"cuda": False, "batch_size": 2, "image_size": 64, "checkpoint": str(tmp_path / "ckpt")},
            "opt": {"epochs": 1, "lr": 0.0001, "loss": "Dice"},
        },
        str(tmp_path / "model.toml"),
    )

    with pytest.raises(SystemExit, match="loss"):
        train.main(
            argparse.Namespace(
                model=str(tmp_path / "model.toml"),
                dataset=str(tmp_path / "dataset.toml"),
                checkpoint=None,
                resume=False,
                workers=0,
                profile=None,
            )
        )


def test_masks_weights_count_mismatch(tmp_path):
    """Weighted soft-voting requires one weight per probability directory
    (robosat/tools/masks.py:30-31 parity)."""
    from robosat_tpu.tools import masks

    with pytest.raises(SystemExit, match="weights"):
        masks.main(argparse.Namespace(masks=str(tmp_path), probs=[str(tmp_path), str(tmp_path)], weights=[1.0]))


def test_features_unknown_type_in_dataset(tmp_path):
    """`rs features --type` must appear in the dataset's classes list."""
    from robosat_tpu.tools import features

    save_config(
        {"common": {"dataset": str(tmp_path), "classes": ["background", "water"], "colors": ["denim", "orange"]}},
        str(tmp_path / "dataset.toml"),
    )

    with pytest.raises(SystemExit, match="classes"):
        features.main(
            argparse.Namespace(
                type="parking",
                masks=str(tmp_path),
                out=str(tmp_path / "out.geojson"),
                dataset=str(tmp_path / "dataset.toml"),
                chunk=4,
            )
        )


def test_train_backend_failure_fence():
    """Known TPU-backend infrastructure failures (remote-compile 500s, the
    transient post-crash poisoned backend) become actionable errors instead
    of raw tracebacks; anything else passes through."""
    from robosat_tpu.tools.train import _explain_backend_failure

    cfg = {"common": {"image_size": 512, "remat": True}}

    with pytest.raises(SystemExit, match="remote compile"):
        _explain_backend_failure(
            RuntimeError("INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1"),
            64,
            cfg,
        )

    with pytest.raises(SystemExit, match="transiently"):
        _explain_backend_failure(
            RuntimeError("INVALID_ARGUMENT: TPU backend error (InvalidArgument)."), 16, cfg
        )

    # Genuine graph/user errors are not swallowed.
    assert _explain_backend_failure(ValueError("shape mismatch"), 16, cfg) is None
