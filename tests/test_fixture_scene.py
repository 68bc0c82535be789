"""Real-file smoke test over the vendored fixture (VERDICT r2 item 9).

The raster is a PIL-produced LZW-compressed GeoTIFF (an independent TIFF
producer — the closest stand-in for GDAL output in this zero-egress image);
its BigTIFF sibling exercises the magic-43 / 8-byte-offset parsing path and
is cross-read by PIL as an independent consumer. The full door is driven:
``ingest.load_scene`` → device extraction → merge → label map.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "scene")
GT = (500000.0, 2.0, 0.0, 4100000.0, 0.0, -2.0)


def _paths():
    return {
        "image": os.path.join(FIX, "synthetic.tif"),
        "big": os.path.join(FIX, "synthetic_big.tif"),
        "polygons": os.path.join(FIX, "synthetic.shp"),
        "points": os.path.join(FIX, "synthetic", "PointsGCS.shp"),
        "lines": os.path.join(FIX, "synthetic", "lines.shp"),
        "labels": os.path.join(FIX, "labels.npy"),
        "objects": os.path.join(FIX, "object_of_region.npy"),
    }


def test_lzw_geotiff_and_bigtiff_read_identically():
    from deepmerge_tpu.geodata.geotiff import read_geotiff

    p = _paths()
    classic = read_geotiff(p["image"])
    assert classic.meta["compression"] == 5  # LZW — written by PIL
    assert classic.geotransform == GT
    big = read_geotiff(p["big"])
    assert big.geotransform == GT
    np.testing.assert_array_equal(classic.array, big.array)


def test_pil_cross_reads_our_bigtiff():
    """Independent consumer: PIL decodes the BigTIFF our writer produced."""
    PIL = pytest.importorskip("PIL.Image")
    from deepmerge_tpu.geodata.geotiff import read_geotiff

    p = _paths()
    ours = read_geotiff(p["big"]).array
    theirs = np.asarray(PIL.open(p["big"]))
    np.testing.assert_array_equal(ours, theirs)


def test_fixture_scene_end_to_end():
    """load_scene → extract → merge → label map on the vendored files."""
    import jax

    from deepmerge_tpu.config import DataConfig, ModelConfig
    from deepmerge_tpu.geodata.ingest import load_scene
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.models.s2former import build_model, init_params

    p = _paths()
    labels = np.load(p["labels"])
    scene = load_scene(p["image"], p["polygons"], p["points"], p["lines"],
                       labels=labels)
    assert scene.image.shape == (96, 96, 3)
    assert scene.regions.num_regions == 12
    assert scene.rag.num_edges > 0

    mcfg = ModelConfig(variant="v3", input_image_scales=(16, 32, 64), cube=8,
                       embed_dim=64, depth=(1, 1, 1), num_heads=4,
                       out_dim=16, dtype="float32")
    dcfg = DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                      eval_batch_size=8)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0))
    emb = FeatureExtractor(model, variables["params"],
                           batch_size=8).extract_scene(scene, dcfg)
    assert emb.shape == (scene.regions.num_points, 16)
    assert np.isfinite(emb).all()

    merged = merge_scene_device(scene, emb, threshold=10.0, max_rounds=4)
    assert 1 <= merged.num_clusters <= scene.regions.num_regions
    label_map = merged.label_map(scene)
    assert label_map.shape == labels.shape


def test_fixture_matches_generator():
    """The committed fixture still matches its generation recipe (pixels +
    points round-trip through the independent producer unchanged)."""
    from deepmerge_tpu.geodata.geotiff import read_geotiff
    from deepmerge_tpu.geodata.synthetic import generate_scene

    scene = generate_scene(h=96, w=96, n_regions=12, n_objects=4, seed=42,
                           points_per_region=2)
    got = read_geotiff(_paths()["image"])
    np.testing.assert_array_equal(got.array, scene.image)


def _tiny_pipeline(scene):
    import jax

    from deepmerge_tpu.config import DataConfig, ModelConfig
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.models.s2former import build_model, init_params

    mcfg = ModelConfig(variant="v3", input_image_scales=(16, 32, 64), cube=8,
                       embed_dim=64, depth=(1, 1, 1), num_heads=4,
                       out_dim=16, dtype="float32",
                       in_channels=scene.image.shape[-1])
    dcfg = DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                      eval_batch_size=8)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0))
    emb = FeatureExtractor(model, variables["params"],
                           batch_size=8).extract_scene(scene, dcfg)
    merged = merge_scene_device(scene, emb, threshold=10.0, max_rounds=4)
    return np.asarray(emb), merged


def test_deep16_fixture_pipeline():
    """The vendored uint16 LZW GeoTIFF (PIL producer): 16-bit decode parity
    vs PIL, deep_pixels='shift' recovery of the 8-bit payload, and the full
    pipeline over the recovered scene."""
    PIL = pytest.importorskip("PIL.Image")
    from deepmerge_tpu.geodata.geotiff import read_geotiff
    from deepmerge_tpu.geodata.ingest import load_scene

    img = os.path.join(FIX, "deep16.tif")
    r = read_geotiff(img)
    assert r.array.dtype == np.uint16 and r.geotransform == GT
    np.testing.assert_array_equal(r.array[..., 0], np.asarray(PIL.open(img)))

    labels = np.load(os.path.join(FIX, "deep16_labels.npy"))
    scene = load_scene(
        img, os.path.join(FIX, "deep16.shp"),
        os.path.join(FIX, "deep16", "PointsGCS.shp"),
        os.path.join(FIX, "deep16", "lines.shp"),
        labels=labels, deep_pixels="shift",
    )
    assert scene.image.dtype == np.uint8
    np.testing.assert_array_equal(scene.image[..., 0],
                                  (r.array[..., 0] >> 8).astype(np.uint8))
    emb, merged = _tiny_pipeline(scene)
    assert np.isfinite(emb).all()
    assert 1 <= merged.num_clusters <= scene.regions.num_regions


def test_jpeg_fixture_end_to_end_with_simi_writeback(tmp_path):
    """The vendored JPEG-compressed GeoTIFF (PIL producer): decode parity
    vs PIL, then the FULL serving door — load, extract, score, ``simi``
    write-back, re-read (the reference's output contract,
    ``test_for_shp``/``ExtractFeatures.py:182-219``)."""
    import shutil

    PIL = pytest.importorskip("PIL.Image")
    from deepmerge_tpu.geodata.geotiff import read_geotiff
    from deepmerge_tpu.geodata.ingest import load_scene, write_simi
    from deepmerge_tpu.geodata.shapefile import ShapefileTable
    from deepmerge_tpu.infer.scoring import score_scene_edges

    img = os.path.join(FIX, "synthetic_jpeg.tif")
    r = read_geotiff(img)
    assert r.meta["compression"] == 7  # JPEG
    np.testing.assert_array_equal(r.array, np.asarray(PIL.open(img)))

    # writable copies: write_simi mutates the lines layer
    p = _paths()
    work = {}
    for base in ("synthetic", os.path.join("synthetic", "PointsGCS"),
                 os.path.join("synthetic", "lines")):
        os.makedirs(os.path.dirname(tmp_path / base) if os.sep in base
                    else tmp_path, exist_ok=True)
        for ext in (".shp", ".shx", ".dbf"):
            src = os.path.join(FIX, base + ext)
            dst = str(tmp_path / (base + ext))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy(src, dst)
        work[base] = str(tmp_path / (base + ".shp"))

    labels = np.load(p["labels"])
    scene = load_scene(img, work["synthetic"],
                       work[os.path.join("synthetic", "PointsGCS")],
                       work[os.path.join("synthetic", "lines")],
                       labels=labels)
    emb, merged = _tiny_pipeline(scene)
    simi = score_scene_edges(scene, emb)
    lines_path = work[os.path.join("synthetic", "lines")]
    write_simi(lines_path, simi)
    back = ShapefileTable.read(lines_path)
    np.testing.assert_allclose(
        np.asarray(back.get_field("simi"), np.float64), simi, atol=1e-6)


def test_pointz_fixture_matches_2d_layer():
    """The Z-typed PointsGCS sibling (OGR 2.5-D layout: PointZ records,
    no-data M) loads to the SAME scene as the 2-D layer — z never enters
    the pipeline, exactly as the reference's OGR walk ignores it."""
    from deepmerge_tpu.geodata.ingest import load_scene

    p = _paths()
    labels = np.load(p["labels"])
    a = load_scene(p["image"], p["polygons"], p["points"], p["lines"],
                   labels=labels)
    b = load_scene(p["image"], p["polygons"],
                   os.path.join(FIX, "synthetic", "PointsZ.shp"),
                   p["lines"], labels=labels)
    np.testing.assert_array_equal(a.regions.points_yx, b.regions.points_yx)
    np.testing.assert_array_equal(a.regions.point_region,
                                  b.regions.point_region)
    np.testing.assert_allclose(a.regions.features, b.regions.features)
