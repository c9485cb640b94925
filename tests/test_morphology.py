"""Bit-exactness of device morphology against cv2 (the reference's engine)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from robosat_tpu.ops.morphology import closing, denoise_grow, dilate, ellipse_kernel, erode, opening


def _blobs(seed, n=2, size=96):
    rng = np.random.default_rng(seed)
    masks = np.zeros((n, size, size), np.uint8)
    for i in range(n):
        for _ in range(4):
            x0, y0 = rng.integers(0, size - 20, 2)
            w, h = rng.integers(4, 40, 2)
            masks[i, y0 : y0 + h, x0 : x0 + w] = 1
        # Pepper noise.
        noise = rng.random((size, size)) < 0.02
        masks[i] ^= noise.astype(np.uint8)
    return masks


@pytest.mark.parametrize("size", [3, 4, 5, 8, 20, 21])
def test_ellipse_kernel_matches_cv2(size):
    ours = ellipse_kernel(size)
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize", [4, 5, 20])
@pytest.mark.parametrize("seed", [0, 1])
def test_erode_dilate_match_cv2(ksize, seed):
    masks = _blobs(seed)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))

    ours_d = np.asarray(dilate(masks, se))
    ours_e = np.asarray(erode(masks, se))
    for i in range(len(masks)):
        np.testing.assert_array_equal(ours_d[i], cv2.dilate(masks[i], se), err_msg="dilate")
        np.testing.assert_array_equal(ours_e[i], cv2.erode(masks[i], se), err_msg="erode")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_open_close_match_cv2(seed):
    masks = _blobs(seed)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (20, 20))

    ours_o = np.asarray(opening(masks, se))
    ours_c = np.asarray(closing(masks, se))
    for i in range(len(masks)):
        np.testing.assert_array_equal(ours_o[i], cv2.morphologyEx(masks[i], cv2.MORPH_OPEN, se))
        np.testing.assert_array_equal(ours_c[i], cv2.morphologyEx(masks[i], cv2.MORPH_CLOSE, se))


def test_denoise_grow_fused_matches_cv2_pipeline():
    masks = _blobs(3)
    se_d = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (20, 20))
    se_g = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (20, 20))

    fused = np.asarray(denoise_grow(masks, 20, 20))
    for i in range(len(masks)):
        ref = cv2.morphologyEx(cv2.morphologyEx(masks[i], cv2.MORPH_OPEN, se_d), cv2.MORPH_CLOSE, se_g)
        np.testing.assert_array_equal(fused[i], ref)


def test_visualize_writes_binary_palette_png(tmp_path):
    from PIL import Image

    from robosat_tpu.features.core import visualize

    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 1
    out = tmp_path / "vis.png"
    visualize(mask, str(out))
    img = Image.open(out)
    assert img.mode == "P"
    np.testing.assert_array_equal(np.array(img), mask)
