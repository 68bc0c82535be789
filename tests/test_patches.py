"""Patch pipeline parity vs the reference-semantics oracle (cut + resize)."""

import numpy as np
import pytest

from deepmerge_tpu.ops.patches import (
    adaptive_scales,
    extract_multiscale_patches,
    pad_scene,
)
from tests.oracle import ref_get_scales, ref_patches

PATCH_SIZES = (16, 32, 64)
CAP = 128


def test_adaptive_scales_match_reference():
    inner = np.array([10, 4, 30])
    obj = np.array([20, 9, 50])
    scales, factors = adaptive_scales(inner, obj, tuple(PATCH_SIZES) + (1,))
    for i in range(3):
        s_ref, f_ref = ref_get_scales(inner[i], obj[i], tuple(PATCH_SIZES) + (1,))
        np.testing.assert_array_equal(np.asarray(scales)[i], s_ref)
        np.testing.assert_allclose(np.asarray(factors)[i], f_ref, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_patches_match_oracle_interior(seed, rng):
    h, w = 200, 180
    image = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    padded = pad_scene(image, CAP)
    pts = np.array([[100, 90], [64, 64], [150, 120], [33, 140]], np.int32)
    inner = np.array([8, 15, 21, 5], np.int32)
    obj = np.array([20, 25, 40, 11], np.int32)
    scales, _ = adaptive_scales(inner, obj, tuple(PATCH_SIZES) + (1,))

    ours = extract_multiscale_patches(
        padded, pts, scales, PATCH_SIZES, caps=CAP, chunk=2, out_channels=3
    )
    for b in range(len(pts)):
        ref, _, _ = ref_patches(image, pts[b], inner[b], obj[b], PATCH_SIZES)
        for slot in range(len(PATCH_SIZES)):
            got = np.asarray(ours[slot][b])
            assert (
                np.abs(got * 255 - ref[slot] * 255).max() <= 1.001
            ), f"point {b} slot {slot}"


def test_patches_match_oracle_at_borders(rng):
    """Windows straddling scene borders must reproduce zero-padded clipping."""
    h, w = 96, 96
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    padded = pad_scene(image, CAP)
    # corners and edges, with scales big enough to overhang
    pts = np.array(
        [[0, 0], [2, 90], [95, 0], [95, 95], [1, 48], [48, 1]], np.int32
    )
    inner = np.full(len(pts), 9, np.int32)
    obj = np.full(len(pts), 31, np.int32)
    scales, _ = adaptive_scales(inner, obj, tuple(PATCH_SIZES) + (1,))

    ours = extract_multiscale_patches(
        padded, pts, scales, PATCH_SIZES, caps=CAP, chunk=3, out_channels=3
    )
    for b in range(len(pts)):
        ref, _, _ = ref_patches(image, pts[b], inner[b], obj[b], PATCH_SIZES)
        for slot in range(len(PATCH_SIZES)):
            got = np.asarray(ours[slot][b])
            assert (
                np.abs(got * 255 - ref[slot] * 255).max() <= 1.001
            ), f"border point {b} slot {slot}"


def test_batch_padding_roundtrip(rng):
    """Batch size not divisible by chunk still returns exactly B patches."""
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    padded = pad_scene(image, CAP)
    pts = np.array([[32, 32]] * 5, np.int32)
    scales = np.tile(np.array([[8, 16, 24, 32]], np.int32), (5, 1))
    out = extract_multiscale_patches(
        padded, pts, scales, PATCH_SIZES, caps=CAP, chunk=4, out_channels=3
    )
    assert out[0].shape == (5, 16, 16, 3)
    # identical points -> identical patches
    np.testing.assert_array_equal(np.asarray(out[0][0]), np.asarray(out[0][4]))


def test_scale_clamp_warns(tiny_data_cfg):
    """Adaptive scales beyond max_window clamp with a warning (parity note)."""
    import warnings

    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.train.sampler import stage_scene

    scene = generate_scene(h=96, w=96, n_regions=6, n_objects=2, seed=0)
    scene.regions.object_[:] = 400  # envi scale = 3*obj - 2*inner >> 128
    import dataclasses

    cfg = dataclasses.replace(tiny_data_cfg, max_window=128)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = stage_scene(scene, cfg)
    assert any("clamped" in str(x.message) for x in w)
    assert max(ds.caps) == 128


def test_patches_match_oracle_large_windows(rng):
    """Window sides past 256 must stay LSB-accurate vs cv2.

    The exact reduced-pass resize is only sound for s <= 256 (scaled
    integer weights stop being bf16-exact and the f32 accumulator passes
    2^24 beyond that), so a cap > 256 slot must take the 3-pass HIGH
    fallback — this pins the flagship's (128, 256, 512) cap ladder against
    the oracle at window sides up to 400.
    """
    h, w = 560, 560
    image = (np.random.RandomState(11).rand(h, w, 3) * 255).astype(np.uint8)
    sizes = (32, 64, 128)
    caps = (128, 256, 512)
    padded = pad_scene(image, caps)
    pts = np.array([[280, 280], [220, 330], [300, 250]], np.int32)
    inner = np.array([100, 90, 120], np.int32)
    obj = np.array([250, 240, 256], np.int32)  # "scene" slot: 372..400
    scales, _ = adaptive_scales(inner, obj, tuple(sizes) + (1,))
    assert int(np.asarray(scales)[:, 2].max()) > 256

    ours = extract_multiscale_patches(
        padded, pts, scales, sizes, caps=caps, chunk=3, out_channels=3
    )
    for b in range(len(pts)):
        ref, _, _ = ref_patches(image, pts[b], inner[b], obj[b], sizes)
        for slot in range(len(sizes)):
            got = np.asarray(ours[slot][b])
            assert (
                np.abs(got * 255 - ref[slot] * 255).max() <= 1.001
            ), f"large-window point {b} slot {slot}"


def test_patches_5band_bottom_edge(rng):
    """Scenes staging to >=8 channels have a SMALLER column alignment (16px)
    than the 32-row DMA tile: the row pad must still cover the 32-aligned-
    down origin + cap + 32 window. A 5-band scene with a bottom-edge point
    regresses the under-padding (windows read past the padded array)."""
    h, w = 113, 160
    image = (rng.rand(h, w, 5) * 255).astype(np.uint8)
    padded = pad_scene(image, CAP)
    pts = np.array([[112, 80], [112, 0], [0, 159]], np.int32)
    inner = np.full(len(pts), 30, np.int32)
    obj = np.full(len(pts), 49, np.int32)  # envi scale 87 -> cap 128 window
    scales, _ = adaptive_scales(inner, obj, tuple(PATCH_SIZES) + (1,))

    ours = extract_multiscale_patches(
        padded, pts, scales, PATCH_SIZES, caps=CAP, chunk=3, out_channels=5
    )
    for b in range(len(pts)):
        ref, _, _ = ref_patches(image, pts[b], inner[b], obj[b], PATCH_SIZES)
        for slot in range(len(PATCH_SIZES)):
            got = np.asarray(ours[slot][b])
            assert (
                np.abs(got * 255 - ref[slot] * 255).max() <= 1.001
            ), f"point {b} slot {slot}"


def test_stage_scene_device_pad_matches_host(tiny_data_cfg):
    """Staging uploads the RAW tile and pads in HBM; the device-side pad
    must be byte-identical to the host ``pad_scene`` layout (zero fill
    where ``cut_image`` zero-fills, MyUtils1.py:174-191, channel pad to
    the staged power-of-two) for 1/3/5-band scenes."""
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.train.sampler import stage_scene

    for bands in (1, 3, 5):
        scene = generate_scene(h=96, w=128, n_regions=10, n_objects=3,
                               seed=bands)
        if bands != 3:
            reps = -(-bands // 3)
            scene.image = np.tile(scene.image, (1, 1, reps))[..., :bands]
        ds = stage_scene(scene, tiny_data_cfg)
        ref = pad_scene(scene.image, ds.caps)
        got = np.asarray(ds.padded)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)
