"""Data-layer parity vs the reference's OWN code, executed VERBATIM.

The model and loss layers are already parity-tested against the actual
reference classes (``tests/test_true_reference_parity.py`` via the timm
shim); this closes the last re-implemented-oracle gap: the patch pipeline.
``MyUtils1.MergingSegmensPairDataset.get_all_features`` (geo→pixel with the
abs()+1 quirk, adaptive scale ladder, ``cut_image`` zero-padded clipping,
per-band cv2 INTER_AREA ``resize_data``, the 15+4 designed vector) and
``MyUtils2.ExtractFeatureDataset.__getitem__`` run over a numpy-backed
``osgeo`` shim, against ``ops/patches.extract_multiscale_patches``.
Reference lines: ``MyUtils1.py:60-223``, ``MyUtils2.py:225-247``.
"""

import numpy as np
import pytest

from deepmerge_tpu.geodata.geotiff import GeoTiff
from deepmerge_tpu.ops.patches import (
    adaptive_scales,
    extract_multiscale_patches,
    pad_scene,
    slot_caps,
)

try:
    from tests.osgeo_shim import (
        FakeFeature,
        FakeLayer,
        FakeRasterDataset,
        import_reference_data_layer,
    )

    MU1, MU2 = import_reference_data_layer()
    _HAVE_REF = True
except ImportError:  # pragma: no cover
    _HAVE_REF = False

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference tree / torch / cv2 unavailable"
)

GT = (500000.0, 2.0, 0.0, 4100000.0, 0.0, -2.0)  # non-unit pixel size
PATCH_SIZES = (32, 64, 128)

FIELD_NAMES = (
    "area", "peri", "len", "width", "smooth", "std0", "std1", "std2",
    "mean0", "mean1", "mean2", "shapeness", "compact", "bright", "border",
)


def _geo_of_pixel(y: int, x: int, frac: float = 0.25):
    """Geo coords that the reference's abs()+1 transform maps to (y, x)."""
    x_geo = GT[0] + (x - 1 + frac) * GT[1]
    y_geo = GT[3] + (y - 1 + frac) * GT[5]
    return x_geo, y_geo


def _fake_feature(rng, y, x, inner, obj):
    fields = {n: float(rng.rand() * 100) for n in FIELD_NAMES}
    fields["inner"] = int(inner)
    fields["object"] = int(obj)
    x_geo, y_geo = _geo_of_pixel(y, x)
    return FakeFeature(fields, x_geo, y_geo), fields


def _ref_pair_dataset():
    ds = MU1.MergingSegmensPairDataset.__new__(MU1.MergingSegmensPairDataset)
    ds.band_num = 3
    return ds


def _ours(image, centers, inner, obj, max_window=512):
    inner64 = np.asarray(inner, np.int64)
    obj64 = np.asarray(obj, np.int64)
    ladder = np.stack(
        [inner64, obj64, 2 * obj64 - inner64, 3 * obj64 - 2 * inner64], 1
    )
    caps = slot_caps(ladder.max(0)[: len(PATCH_SIZES)], max_window)
    padded = pad_scene(image, caps)
    scales, factors = adaptive_scales(inner, obj, PATCH_SIZES + (1,))
    patches = extract_multiscale_patches(
        padded, np.asarray(centers, np.int32), np.asarray(scales),
        PATCH_SIZES, caps=caps, out_channels=image.shape[-1],
    )
    return patches, np.asarray(scales), np.asarray(factors)


def test_get_all_features_verbatim_parity():
    """Interior + boundary-clipped points through the REFERENCE pipeline."""
    rng = np.random.RandomState(0)
    image = (rng.rand(120, 140, 3) * 255).astype(np.uint8)
    img_ds = FakeRasterDataset(image, GT)
    ref_ds = _ref_pair_dataset()
    tif = GeoTiff(array=image, geotransform=GT)

    cases = [  # (y, x, inner, object) — includes corner/edge clipping
        (60, 70, 8, 20),
        (3, 5, 9, 31),
        (118, 138, 5, 11),
        (60, 2, 15, 25),
    ]
    centers = []
    feats = []
    for y, x, inner, obj in cases:
        f, fields = _fake_feature(rng, y, x, inner, obj)
        feats.append((f, fields))
        # our geo→pixel must reproduce the reference's (incl. the +1)
        x_geo, y_geo = _geo_of_pixel(y, x)
        yl, xp = tif.geo_to_pixel(x_geo, y_geo)
        assert (yl, xp) == (y, x)
        centers.append([yl, xp])

    inner = np.asarray([c[2] for c in cases], np.int32)
    obj = np.asarray([c[3] for c in cases], np.int32)
    ours, scales_j, factors_j = _ours(image, centers, inner, obj)

    for b, ((f, fields), _) in enumerate(zip(feats, cases)):
        designed, scales, patches = ref_ds.get_all_features(img_ds, f)
        designed = designed.numpy()[0]
        scales = scales.numpy()[0]
        # adaptive scale ladder + factors (MyUtils1.py:130-156)
        np.testing.assert_array_equal(scales_j[b], scales.astype(np.int64))
        want_designed = np.concatenate(
            [[fields[n] for n in FIELD_NAMES], factors_j[b]]
        )
        np.testing.assert_allclose(designed, want_designed, rtol=1e-6)
        # patches: reference returns a list of (C, s, s) float32 in [0, 1]
        for slot in range(len(PATCH_SIZES)):
            ref_p = np.transpose(patches[slot], (1, 2, 0))
            got = np.asarray(ours[slot][b])
            assert (
                np.abs(got * 255 - ref_p * 255).max() <= 1.001
            ), f"case {b} slot {slot}"


def test_extract_feature_dataset_getitem_verbatim_parity():
    """MyUtils2.ExtractFeatureDataset.__getitem__ (``:225-247``) verbatim."""
    rng = np.random.RandomState(1)
    image = (rng.rand(96, 108, 3) * 255).astype(np.uint8)
    es = MU2.ExtractFeatureDataset.__new__(MU2.ExtractFeatureDataset)
    es.band_num = 3
    es.img_dataset = FakeRasterDataset(image, GT)

    cases = [(40, 50, 7, 19), (2, 104, 10, 22)]
    features = {}
    for fid, (y, x, inner, obj) in enumerate(cases):
        f, _ = _fake_feature(rng, y, x, inner, obj)
        features[fid] = f
    es.point_layers = FakeLayer(features)
    es.data = list(range(len(cases)))

    centers = [[c[0], c[1]] for c in cases]
    inner = np.asarray([c[2] for c in cases], np.int32)
    obj = np.asarray([c[3] for c in cases], np.int32)
    ours, _, _ = _ours(image, centers, inner, obj)

    for i in range(len(cases)):
        fid, (designed, scales, patches) = es[i]
        assert fid == i
        for slot in range(len(PATCH_SIZES)):
            ref_p = np.transpose(patches[slot], (1, 2, 0))
            got = np.asarray(ours[slot][i])
            assert (
                np.abs(got * 255 - ref_p * 255).max() <= 1.001
            ), f"fid {fid} slot {slot}"


def test_clamped_window_matches_reference_at_cap():
    """When an adaptive scale exceeds data.max_window the framework clamps
    the window (with a warning) — the clamped patch must equal the
    REFERENCE pipeline run verbatim at the cap scale (cut_image +
    resize_data at s=cap), pinning the divergence semantics exactly."""
    rng = np.random.RandomState(2)
    image = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    img_ds = FakeRasterDataset(image, GT)
    ref_ds = _ref_pair_dataset()

    y, x, inner, obj = 128, 130, 20, 80  # scene scale 140 > 128 cap
    max_window = 128
    ours, scales_j, _ = _ours(
        image, [[y, x]], np.asarray([inner]), np.asarray([obj]),
        max_window=max_window,
    )
    assert int(scales_j[0, 2]) == 140 > max_window

    # unclamped slots agree with the true-scale reference pipeline
    f, _ = _fake_feature(rng, y, x, inner, obj)
    _, _, ref_patches = ref_ds.get_all_features(img_ds, f)
    for slot in (0, 1):
        ref_p = np.transpose(ref_patches[slot], (1, 2, 0))
        got = np.asarray(ours[slot][0])
        assert np.abs(got * 255 - ref_p * 255).max() <= 1.001, slot

    # the clamped slot equals the reference pipeline AT the cap scale
    window = ref_ds.cut_image(
        img_ds,
        ref_ds.calculate_left_top_point_and_size(x, y, max_window),
    )
    ref_clamped = np.transpose(
        ref_ds.resize_data(window, PATCH_SIZES[2], PATCH_SIZES[2]), (1, 2, 0)
    )
    got = np.asarray(ours[2][0])
    assert np.abs(got * 255 - ref_clamped * 255).max() <= 1.001

    # and staging a scene with such scales warns loudly
    import warnings

    from deepmerge_tpu.config import DataConfig
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.train.sampler import stage_scene

    scene = generate_scene(h=96, w=96, n_regions=9, n_objects=3, seed=5)
    scene.regions.inner[:] = inner
    scene.regions.object_[:] = obj
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stage_scene(scene, DataConfig(patch_sizes=PATCH_SIZES,
                                      max_window=max_window))
    assert any("clamped" in str(x.message) for x in w)


def test_uint16_wrap_verbatim_parity():
    """uint16 imagery through the REFERENCE pipeline, verbatim.

    ``cut_image`` assigns the GDAL buffer into a ``np.zeros(...,
    dtype=np.uint8)`` destination (``MyUtils1.py:189-191``), so deeper
    dtypes truncate modulo 256 before cv2/``/255`` ever run. Our
    ``deep_pixels="wrap"`` reproduces exactly that; this pins it against
    the reference's own code running on a genuine uint16 raster.
    """
    rng = np.random.RandomState(7)
    # full 16-bit range: high bytes differ per pixel so a wrong policy
    # (shift/clip) CANNOT pass this test
    image16 = (rng.rand(120, 140, 3) * 65535).astype(np.uint16)
    img_ds = FakeRasterDataset(image16, GT)
    ref_ds = _ref_pair_dataset()

    wrapped = image16.astype(np.uint8)  # deep_pixels="wrap" semantics
    assert wrapped.max() > 0 and not np.array_equal(
        wrapped, np.clip(image16, 0, 255).astype(np.uint8)
    )

    cases = [(60, 70, 8, 20), (3, 5, 9, 31)]
    centers = [[y, x] for y, x, _, _ in cases]
    inner = np.asarray([c[2] for c in cases], np.int32)
    obj = np.asarray([c[3] for c in cases], np.int32)
    ours, _, _ = _ours(wrapped, centers, inner, obj)

    for b, (y, x, i_, o_) in enumerate(cases):
        f, _ = _fake_feature(rng, y, x, i_, o_)
        _, _, ref_patches = ref_ds.get_all_features(img_ds, f)
        for slot in range(len(PATCH_SIZES)):
            ref_p = np.transpose(ref_patches[slot], (1, 2, 0))
            got = np.asarray(ours[slot][b])
            assert np.abs(got * 255 - ref_p * 255).max() <= 1.001, (b, slot)
