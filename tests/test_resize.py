"""Golden tests: INTER_AREA resize kernel vs OpenCV."""

import cv2
import numpy as np
import pytest

from deepmerge_tpu.ops.resize import area_resize, crop_resize, resize_weights


@pytest.mark.parametrize("src,dst", [(45, 32), (64, 32), (128, 64), (37, 32), (224, 32)])
def test_downscale_matches_cv2_float(src, dst, rng):
    img = (rng.rand(src, src, 3) * 255).astype(np.float32)
    ours = np.asarray(area_resize(img, dst))
    ref = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


@pytest.mark.parametrize("src,dst", [(20, 32), (10, 32), (31, 32), (40, 64), (3, 16)])
def test_upscale_matches_cv2_float(src, dst, rng):
    img = (rng.rand(src, src, 3) * 255).astype(np.float32)
    ours = np.asarray(area_resize(img, dst))
    ref = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


@pytest.mark.parametrize("src,dst", [(45, 32), (64, 32), (20, 32), (9, 32), (97, 64)])
def test_uint8_quantization_within_one_lsb(src, dst, rng):
    img = (rng.rand(src, src, 3) * 255).astype(np.uint8)
    ours = np.asarray(area_resize(img, dst, quantize_uint8=True))
    ref = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_AREA).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_identity_resize(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.float32)
    ours = np.asarray(area_resize(img, 32))
    np.testing.assert_allclose(ours, img, atol=1e-3)


def test_weights_rows_sum_to_one():
    for s, out in [(45, 32), (20, 32), (128, 64), (1, 32)]:
        w = np.asarray(resize_weights(out, 256, s, 17))
        np.testing.assert_allclose(w.sum(1), np.ones(out), atol=1e-5)
        # nothing outside the adaptive window contributes
        assert w[:, :17].sum() == 0
        assert w[:, 17 + s :].sum() == 0


def test_crop_resize_equals_crop_then_resize(rng):
    cap, s, out = 128, 45, 32
    window = (rng.rand(cap, cap, 3) * 255).astype(np.uint8)
    off = 30
    ours = np.asarray(crop_resize(window, s, off, off, out, quantize_uint8=True))
    crop = window[off : off + s, off : off + s]
    ref = (
        cv2.resize(crop, (out, out), interpolation=cv2.INTER_AREA).astype(np.float32)
        / 255.0
    )
    assert np.abs(ours * 255 - ref * 255).max() <= 1.0


def test_crop_resize_asymmetric_offsets(rng):
    cap, s, out = 64, 20, 16
    window = (rng.rand(cap, cap, 3) * 255).astype(np.uint8)
    ours = np.asarray(crop_resize(window, s, 10, 25, out, quantize_uint8=True))
    crop = window[10 : 10 + s, 25 : 25 + s]
    ref = (
        cv2.resize(crop, (out, out), interpolation=cv2.INTER_AREA).astype(np.float32)
        / 255.0
    )
    assert np.abs(ours * 255 - ref * 255).max() <= 1.0
