"""Palette and config contract tests."""

import colorsys

from robosat_tpu.colors import NAMED_COLORS, continuous_palette_for_color, make_palette
from robosat_tpu.config import dumps_config, load_config, save_config


def test_make_palette_denim_orange():
    # Exact bytes the reference writes into mask PNG palettes
    # (robosat/colors.py: denim #50667f, orange #f9886c).
    assert make_palette("denim", "orange") == [0x50, 0x66, 0x7F, 0xF9, 0x88, 0x6C]


def test_continuous_palette_pink():
    palette = continuous_palette_for_color("pink", 256)
    assert len(palette) == 3 * 256
    # Spot-check: the last bin is full saturation at pink's hue/value.
    r, g, b = (v / 255 for v in NAMED_COLORS["pink"])
    h, _, v = colorsys.rgb_to_hsv(r, g, b)
    expected_last = [int(c * 255) for c in colorsys.hsv_to_rgb(h, 1.0, v)]
    assert palette[-3:] == expected_last
    # First bin is near-white (tiny saturation).
    assert palette[0] == palette[1] == int(v * 255) or abs(palette[0] - palette[1]) <= 1


def test_config_roundtrip(tmp_path):
    attrs = {
        "common": {"cuda": True, "batch_size": 2, "image_size": 512, "checkpoint": "/tmp/pth/"},
        "opt": {"epochs": 10, "lr": 0.0001, "loss": "Lovasz"},
    }
    path = tmp_path / "model.toml"
    save_config(attrs, str(path))
    loaded = load_config(str(path))
    assert loaded == attrs


def test_dumps_config_lists():
    s = dumps_config({"weights": {"values": [1.6248, 5.762827]}, "common": {"classes": ["background", "parking"]}})
    assert "values = [1.6248, 5.762827]" in s
    assert 'classes = ["background", "parking"]' in s
