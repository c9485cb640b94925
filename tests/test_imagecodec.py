"""Native image codec vs the PIL oracle.

Decode must be pixel-identical to PIL's `convert("RGB")` for every format
the tile pipeline produces (PNG gray/palette/RGB/RGBA, JPEG, WebP — JPEG
shares libjpeg-turbo with PIL so even lossy decode is bitwise-reproducible);
encode must round-trip through PIL byte-exactly at the pixel level.
"""

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.native import imagecodec


@pytest.fixture(scope="module")
def lib():
    lib = imagecodec.load()
    if lib is None:
        pytest.skip("native image codec unavailable")
    return lib


def _roundtrip_decode(tmp_path, img, name):
    path = str(tmp_path / name)
    img.save(path)
    ours = imagecodec.decode_rgb(path)
    assert ours is not None, "native decode refused {}".format(name)
    with Image.open(path) as ref_img:
        ref = np.asarray(ref_img.convert("RGB"))
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_decode_png_rgb(tmp_path, lib):
    rng = np.random.default_rng(0)
    _roundtrip_decode(tmp_path, Image.fromarray(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)), "t.png")


def test_decode_png_gray(tmp_path, lib):
    rng = np.random.default_rng(1)
    _roundtrip_decode(tmp_path, Image.fromarray(rng.integers(0, 256, (32, 40), dtype=np.uint8), "L"), "g.png")


def test_decode_png_rgba(tmp_path, lib):
    rng = np.random.default_rng(2)
    _roundtrip_decode(
        tmp_path, Image.fromarray(rng.integers(0, 256, (33, 31, 4), dtype=np.uint8), "RGBA"), "a.png"
    )


def test_decode_png_palette(tmp_path, lib):
    """Palette PNGs are what rasterize/masks/predict emit."""
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 4, (64, 64), dtype=np.uint8), "P")
    img.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255] + [0] * (768 - 12))
    _roundtrip_decode(tmp_path, img, "p.png")


def test_decode_jpeg(tmp_path, lib):
    rng = np.random.default_rng(4)
    img = Image.fromarray(rng.integers(0, 256, (96, 80, 3), dtype=np.uint8))
    path = str(tmp_path / "t.jpg")
    img.save(path, quality=90)
    ours = imagecodec.decode_rgb(path)
    assert ours is not None
    with Image.open(path) as ref_img:
        ref = np.asarray(ref_img.convert("RGB"))
    # Same bitstream through libjpeg-turbo on both sides: decodes agree
    # exactly (both default to the slow-but-exact IDCT).
    np.testing.assert_array_equal(ours, ref)


def test_decode_webp(tmp_path, lib):
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    path = str(tmp_path / "t.webp")
    img.save(path, lossless=True)
    ours = imagecodec.decode_rgb(path)
    assert ours is not None
    with Image.open(path) as ref_img:
        ref = np.asarray(ref_img.convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


def test_decode_missing_and_garbage(tmp_path, lib):
    assert imagecodec.decode_rgb(str(tmp_path / "nope.png")) is None
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image at all")
    assert imagecodec.decode_rgb(str(bad)) is None


def test_encode_palette_png_roundtrip(tmp_path, lib):
    from robosat_tpu.colors import continuous_palette_for_color

    rng = np.random.default_rng(6)
    indices = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    palette = continuous_palette_for_color("pink", 256)
    path = str(tmp_path / "out.png")
    assert imagecodec.encode_palette_png(path, indices, palette)
    with Image.open(path) as img:
        assert img.mode == "P"
        np.testing.assert_array_equal(np.asarray(img), indices)
        # Palette preserved (PIL may store fewer entries; compare prefix).
        got = img.getpalette()
        assert got[: len(palette)] == list(palette)


def test_encode_palette_png_d2s_matches_interleave(tmp_path, lib):
    """The fused depth-to-space encode equals interleaving on the host then
    encoding: blocked[di][dj][i][j] -> fine[2i+di][2j+dj]."""
    rng = np.random.default_rng(7)
    blocked = rng.integers(0, 256, (128, 128, 4), dtype=np.uint8)
    fine = np.zeros((256, 256), np.uint8)
    for di in range(2):
        for dj in range(2):
            fine[di::2, dj::2] = blocked[:, :, 2 * di + dj]
    palette = [i for v in range(256) for i in (v, 0, 255 - v)]
    path = str(tmp_path / "d2s.png")
    assert imagecodec.encode_palette_png_d2s(path, blocked, palette)
    with Image.open(path) as img:
        np.testing.assert_array_equal(np.asarray(img), fine)


def test_decode_indices_palette(tmp_path, lib):
    """Palette PNG index arrays decode raw (no palette application),
    identical to PIL's P-mode pixels."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    pal = np.tile(np.arange(256, dtype=np.uint8)[:, None], (1, 3)).reshape(-1)
    img = Image.fromarray(idx, mode="P")
    img.putpalette(pal)
    path = str(tmp_path / "p.png")
    img.save(path)

    ours = imagecodec.decode_indices(path)
    assert ours is not None
    with Image.open(path) as ref_img:
        ref = np.asarray(ref_img.convert("P"))
    np.testing.assert_array_equal(ours, ref)


def test_decode_indices_refuses_rgb(tmp_path, lib):
    rng = np.random.default_rng(8)
    path = str(tmp_path / "rgb.png")
    Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(path)
    assert imagecodec.decode_indices(path) is None
