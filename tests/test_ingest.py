"""Scene export/ingest round-trip through the reference file layout."""

import numpy as np

from deepmerge_tpu.geodata.ingest import export_scene, load_scene, write_simi
from deepmerge_tpu.geodata.shapefile import ShapefileTable
from deepmerge_tpu.geodata.synthetic import generate_scene

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_scene_roundtrip(tmp_path):
    scene = generate_scene(h=96, w=96, n_regions=12, n_objects=4, seed=3,
                           points_per_region=2)
    scene.meta["geotransform"] = (500000.0, 1.0, 0.0, 4100000.0, 0.0, -1.0)
    paths = export_scene(scene, str(tmp_path))

    loaded = load_scene(
        paths["image"], paths["polygons"], paths["points"], paths["lines"],
        labels=scene.labels,
    )
    np.testing.assert_array_equal(loaded.image, scene.image)
    assert loaded.regions.num_regions == scene.regions.num_regions
    assert loaded.regions.num_points == scene.regions.num_points
    np.testing.assert_allclose(
        loaded.regions.features, scene.regions.features, rtol=2e-6, atol=1e-4
    )
    np.testing.assert_array_equal(loaded.regions.inner, scene.regions.inner)
    np.testing.assert_array_equal(loaded.regions.object_, scene.regions.object_)
    np.testing.assert_array_equal(
        loaded.regions.point_region, scene.regions.point_region
    )
    # geo->pixel->geo round trip preserves sample-point pixel centers
    # (border pixels 0 clamp to 1: the reference's abs()+1 transform cannot
    # represent row/col 0 — MyUtils1.py:70-72)
    np.testing.assert_array_equal(
        loaded.regions.points_yx, np.maximum(scene.regions.points_yx, 1)
    )
    np.testing.assert_array_equal(loaded.rag.edges, scene.rag.edges)


def test_simi_writeback(tmp_path):
    scene = generate_scene(h=64, w=64, n_regions=8, n_objects=3, seed=1)
    paths = export_scene(scene, str(tmp_path))
    simi = np.arange(scene.rag.num_edges, dtype=np.float32) * 0.5
    write_simi(paths["lines"], simi)
    lines = ShapefileTable.read(paths["lines"])
    np.testing.assert_allclose(lines.get_field("simi"), simi, atol=1e-6)


def test_process_folder_walks_reference_layout(tmp_path):
    """Two scenes in the reference folder layout: both get embedded, scored,
    simi-written and merged by the multi-scene driver."""
    import dataclasses
    import os

    from deepmerge_tpu.config import Config, DataConfig, MergeConfig, ModelConfig
    from deepmerge_tpu.geodata.shapefile import ShapefileTable
    from deepmerge_tpu.infer.driver import process_folder

    images = tmp_path / "images"
    shps = tmp_path / "shps"
    for seed in (1, 2):
        scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3,
                               seed=seed, name=f"tile{seed}")
        paths = export_scene(scene, str(tmp_path / "stage"))
        os.makedirs(images, exist_ok=True)
        os.makedirs(shps / scene.name, exist_ok=True)
        os.rename(paths["image"], images / f"{scene.name}.tif")
        for ext in (".shp", ".shx", ".dbf"):
            os.rename(str(tmp_path / "stage" / f"{scene.name}{ext}"),
                      shps / f"{scene.name}{ext}")
            for base in ("PointsGCS", "lines"):
                src = tmp_path / "stage" / scene.name / f"{base}{ext}"
                if src.exists():
                    os.rename(str(src), shps / scene.name / f"{base}{ext}")

    cfg = Config(
        model=ModelConfig(variant="v3", input_image_scales=(16, 32, 64),
                          cube=8, embed_dim=32, depth=(1, 1, 1), num_heads=4,
                          out_dim=8, dtype="float32"),
        data=DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                        eval_batch_size=16),
        merge=MergeConfig(engine="host"),
    )
    done = process_folder(cfg, str(images), str(shps), log_fn=lambda *_: None)
    assert done == ["tile1", "tile2"]
    for name in done:
        h5 = shps / name / f"{cfg.model.name}_features.h5"
        assert h5.exists()
        lines = ShapefileTable.read(str(shps / name / "lines.shp"))
        assert "simi" in lines.field_names()
        assert all(v is not None for v in lines.get_field("simi"))

    # prefetch-thread staging parity: the walk staged each scene on the
    # worker thread (device_scene handed to process_scene); a direct
    # unstaged process_scene must score the same simi values
    from deepmerge_tpu.geodata.ingest import load_scene
    from deepmerge_tpu.infer.driver import load_params, process_scene
    from deepmerge_tpu.infer.extract import FeatureExtractor

    scene1 = load_scene(str(images / "tile1.tif"), str(shps / "tile1.shp"),
                        str(shps / "tile1" / "PointsGCS.shp"),
                        str(shps / "tile1" / "lines.shp"), name="tile1")
    model, params, bs = load_params(cfg)
    _, simi_direct, _ = process_scene(cfg, scene1, model, params, bs,
                                      log_fn=lambda *_: None)
    walked = ShapefileTable.read(str(shps / "tile1" / "lines.shp"))
    np.testing.assert_allclose(
        np.asarray(walked.get_field("simi"), np.float64),
        np.round(simi_direct.astype(np.float64), 6), atol=5e-7)

    # caller-supplied warm extractor (serving daemons / BENCH_SERVE):
    # a second walk reusing one extractor is idempotent and complete
    ex = FeatureExtractor(model, params, bs,
                          batch_size=cfg.data.eval_batch_size)
    done2 = process_folder(cfg, str(images), str(shps),
                           log_fn=lambda *_: None, extractor=ex)
    assert done2 == ["tile1", "tile2"]
    rewalked = ShapefileTable.read(str(shps / "tile1" / "lines.shp"))
    np.testing.assert_allclose(
        np.asarray(rewalked.get_field("simi"), np.float64),
        np.asarray(walked.get_field("simi"), np.float64))


def test_edge_pair_dataset_across_scenes(tmp_path):
    """Reference PolygonPointPairDataset semantics (MyUtils2.py:18-126):
    one flat (edge_fid, scene, left, right) dataset over many scenes."""
    from deepmerge_tpu.geodata.ingest import EdgePairDataset

    scenes = [
        generate_scene(h=64, w=64, n_regions=8, n_objects=3, seed=s,
                       name=f"tile{s}")
        for s in (1, 2)
    ]
    for s in scenes:
        export_scene(s, str(tmp_path))

    ds = EdgePairDataset(str(tmp_path), str(tmp_path), str(tmp_path))
    assert ds.scene_names == ["tile1", "tile2"]
    assert len(ds) == sum(len(s.rag.edges) for s in scenes)

    # samples are (edge_fid, scene_name, left_id, right_id)
    fid, name, a, b = ds[0]
    assert name == "tile1" and a >= 0 and b >= 0

    grouped = ds.by_scene()
    for s in scenes:
        g = grouped[s.name]
        assert g.shape == (len(s.rag.edges), 3)
        np.testing.assert_array_equal(
            np.sort(g[:, 1:], axis=1), np.sort(s.rag.edges, axis=1)
        )

    # scene_limit mirrors the reference's single-scene debug pin (i=17/break)
    ds1 = EdgePairDataset(str(tmp_path), str(tmp_path), str(tmp_path),
                          scene_limit=1)
    assert ds1.scene_names == ["tile1"]

    # a scene loads back through the dataset's own path helpers
    loaded = ds.load_scene("tile2")
    assert loaded.regions.num_regions == scenes[1].regions.num_regions


def test_edge_pair_dataset_single_scene(tmp_path):
    """Explicit-path single-scene constructor (PolygonConnectPointDataset,
    MyUtils2.py:128-209)."""
    from deepmerge_tpu.geodata.ingest import EdgePairDataset

    scene = generate_scene(h=64, w=64, n_regions=8, n_objects=3, seed=5,
                           name="solo")
    export_scene(scene, str(tmp_path))
    ds = EdgePairDataset.single_scene(
        str(tmp_path / "solo.tif"), str(tmp_path / "solo.shp"),
        str(tmp_path / "solo" / "lines.shp"),
        str(tmp_path / "solo" / "PointsGCS.shp"),
    )
    assert len(ds) == len(scene.rag.edges)
    fid, name, a, b = ds[0]
    assert name == "solo"
    loaded = ds.load_scene("solo")
    assert loaded.regions.num_regions == 8


def test_deep_pixels_uint16(tmp_path):
    """uint16 rasters refuse by default (no silent mod-256 wrap) and map to
    the high byte under deep_pixels='shift'."""
    import pytest
    import struct

    scene = generate_scene(h=64, w=64, n_regions=8, n_objects=3, seed=5)
    paths = export_scene(scene, str(tmp_path))

    # rewrite the raster as uint16 = pixel * 256 + noise-in-low-byte
    img16 = scene.image.astype(np.uint16) * 256 + 7
    h, w, c = img16.shape
    payload = img16.astype("<u2").tobytes()
    n = 9
    data_off = 8 + 2 + n * 12 + 4

    def e(tag, typ, count, val):
        if typ == 3:
            return struct.pack("<HHIHH", tag, typ, count, val, 0)
        return struct.pack("<HHII", tag, typ, count, val)

    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 16),
        e(259, 3, 1, 1), e(262, 3, 1, 2), e(273, 4, 1, data_off),
        e(277, 3, 1, c), e(278, 4, 1, h), e(279, 4, 1, len(payload)),
    ]
    p16 = tmp_path / "scene16.tif"
    p16.write_bytes(
        b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n)
        + b"".join(entries) + struct.pack("<I", 0) + payload
    )

    with pytest.raises(ValueError, match="uint8"):
        load_scene(str(p16), paths["polygons"], paths["points"],
                   paths["lines"])
    loaded = load_scene(str(p16), paths["polygons"], paths["points"],
                        paths["lines"], deep_pixels="shift")
    np.testing.assert_array_equal(loaded.image, scene.image)


def test_process_folder_prefetch_fault_isolation(tmp_path):
    """A corrupt scene mid-walk fails alone: the prefetched load error lands
    in that scene's own try block, the neighbours still complete, and no
    truncated .h5 survives for the failed scene."""
    import os

    from deepmerge_tpu.config import Config, DataConfig, MergeConfig, ModelConfig
    from deepmerge_tpu.infer.driver import process_folder

    images = tmp_path / "images"
    shps = tmp_path / "shps"
    for seed in (1, 2, 3):
        scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3,
                               seed=seed, name=f"tile{seed}")
        paths = export_scene(scene, str(tmp_path / "stage"))
        os.makedirs(images, exist_ok=True)
        os.makedirs(shps / scene.name, exist_ok=True)
        os.rename(paths["image"], images / f"{scene.name}.tif")
        for ext in (".shp", ".shx", ".dbf"):
            os.rename(str(tmp_path / "stage" / f"{scene.name}{ext}"),
                      shps / f"{scene.name}{ext}")
            for base in ("PointsGCS", "lines"):
                src = tmp_path / "stage" / scene.name / f"{base}{ext}"
                if src.exists():
                    os.rename(str(src), shps / scene.name / f"{base}{ext}")
    with open(images / "tile2.tif", "wb") as f:
        f.write(b"not a tiff at all")

    cfg = Config(
        model=ModelConfig(variant="v3", input_image_scales=(16, 32, 64),
                          cube=8, embed_dim=32, depth=(1, 1, 1), num_heads=4,
                          out_dim=8, dtype="float32"),
        data=DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                        eval_batch_size=16),
        merge=MergeConfig(engine="host"),
    )
    logs = []
    done = process_folder(cfg, str(images), str(shps), log_fn=logs.append)
    assert done == ["tile1", "tile3"]
    assert any("FAILED tile2" in ln for ln in logs)
    assert not (shps / "tile2" / f"{cfg.model.name}_features.h5").exists()
    for name in done:
        assert (shps / name / f"{cfg.model.name}_features.h5").exists()


def test_deep_pixels_int16_and_float(tmp_path):
    """deep_pixels='shift' on SIGNED rasters clamps negatives (nodata fills)
    to 0 — not wrap-to-white — and uses the positive payload bits; float
    rasters rescale [0, max] linearly instead of collapsing to 0/1."""
    import struct

    scene = generate_scene(h=64, w=64, n_regions=8, n_objects=3, seed=5)
    paths = export_scene(scene, str(tmp_path))

    def craft(path, arr, bps, fmt_tag):
        h, w, c = arr.shape
        payload = arr.tobytes()
        n = 10
        data_off = 8 + 2 + n * 12 + 4

        def e(tag, typ, count, val):
            if typ == 3:
                return struct.pack("<HHIHH", tag, typ, count, val, 0)
            return struct.pack("<HHII", tag, typ, count, val)

        entries = [
            e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, bps),
            e(259, 3, 1, 1), e(262, 3, 1, 2), e(273, 4, 1, data_off),
            e(277, 3, 1, c), e(278, 4, 1, h), e(279, 4, 1, len(payload)),
            e(339, 3, 1, fmt_tag),
        ]
        path.write_bytes(
            b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n)
            + b"".join(entries) + struct.pack("<I", 0) + payload
        )

    # int16: value = pixel * 128 (fills the 0..32767 positive range);
    # sprinkle -32768 nodata pixels which must land at 0, not 255
    img16 = scene.image.astype(np.int16) * 128
    img16[:4, :4] = -32768
    p = tmp_path / "int16.tif"
    craft(p, img16.astype("<i2"), 16, 2)
    loaded = load_scene(str(p), paths["polygons"], paths["points"],
                        paths["lines"], deep_pixels="shift")
    expect = scene.image.copy()
    expect[:4, :4] = 0
    np.testing.assert_array_equal(loaded.image, expect)

    # float32 reflectance in [0, 1] (+ a negative nodata) rescales linearly
    imgf = scene.image.astype(np.float32) / 255.0
    imgf[:4, :4] = -9999.0
    pf = tmp_path / "float.tif"
    craft(pf, imgf.astype("<f4"), 32, 3)
    loaded = load_scene(str(pf), paths["polygons"], paths["points"],
                        paths["lines"], deep_pixels="shift")
    assert loaded.image[:4, :4].max() == 0
    # linear rescale by the scene max: pixel' = round-ish of pixel * 255/max
    peak = scene.image.max()
    expect = np.clip(
        (scene.image.astype(np.float64) / peak) * 255.0, 0, 255
    ).astype(np.uint8)
    expect[:4, :4] = 0
    assert np.abs(loaded.image.astype(int) - expect.astype(int)).max() <= 1


def test_process_folder_mesh(tmp_path):
    """The multi-scene walk with a device mesh: shard_map extraction +
    collective merge per scene, same outputs as the reference layout walk."""
    import dataclasses
    import os

    import jax

    from deepmerge_tpu.config import Config, DataConfig, MergeConfig, ModelConfig
    from deepmerge_tpu.geodata.shapefile import ShapefileTable
    from deepmerge_tpu.infer.driver import process_folder
    from deepmerge_tpu.parallel.mesh import make_mesh

    images = tmp_path / "images"
    shps = tmp_path / "shps"
    scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3,
                           seed=1, name="tile1")
    paths = export_scene(scene, str(tmp_path / "stage"))
    os.makedirs(images, exist_ok=True)
    os.makedirs(shps / scene.name, exist_ok=True)
    os.rename(paths["image"], images / f"{scene.name}.tif")
    for ext in (".shp", ".shx", ".dbf"):
        os.rename(str(tmp_path / "stage" / f"{scene.name}{ext}"),
                  shps / f"{scene.name}{ext}")
        for base in ("PointsGCS", "lines"):
            src = tmp_path / "stage" / scene.name / f"{base}{ext}"
            if src.exists():
                os.rename(str(src), shps / scene.name / f"{base}{ext}")

    cfg = Config(
        model=ModelConfig(variant="v3", input_image_scales=(16, 32, 64),
                          cube=8, embed_dim=32, depth=(1, 1, 1), num_heads=4,
                          out_dim=8, dtype="float32"),
        data=DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                        eval_batch_size=16),
        merge=MergeConfig(engine="device"),
    )
    # superpixel sidecar so --write-labelmaps has a map to expand
    np.save(str(shps / "tile1_labels.npy"), scene.labels)

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    done = process_folder(cfg, str(images), str(shps),
                          log_fn=lambda *_: None, mesh=mesh,
                          write_labelmaps=True)
    assert done == ["tile1"]
    h5 = shps / "tile1" / f"{cfg.model.name}_features.h5"
    assert h5.exists()
    lines = ShapefileTable.read(str(shps / "tile1" / "lines.shp"))
    assert "simi" in lines.field_names()

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    merged = read_geotiff(str(shps / "tile1" / f"{cfg.model.name}_merged.tif"))
    arr = merged.array.astype(np.uint32)
    decoded = arr[..., 0] | (arr[..., 1] << 8) | (arr[..., 2] << 16)
    assert decoded.shape == scene.labels.shape
    assert decoded.max() < scene.regions.num_regions


def test_load_scene_blank_inner_field_clear_error(tmp_path):
    """A blank numeric cell (dBase NULL) in the points layer produces a
    clear per-record error instead of int(None) TypeError."""
    import os

    import pytest

    from deepmerge_tpu.geodata.ingest import load_scene

    scene = generate_scene(h=64, w=64, n_regions=6, n_objects=2, seed=3,
                           name="s")
    paths = export_scene(scene, str(tmp_path))
    dbf_path = os.path.join(tmp_path, "s", "PointsGCS.dbf")
    dbf = bytearray(open(dbf_path, "rb").read())
    header_size = int.from_bytes(dbf[8:10], "little")
    # first record: 1 deletion byte then inner N(10) — blank it
    dbf[header_size + 1 : header_size + 11] = b" " * 10
    open(dbf_path, "wb").write(bytes(dbf))
    with pytest.raises(ValueError, match="blank 'inner'"):
        load_scene(paths["image"], paths["polygons"], paths["points"],
                   paths["lines"])


def test_process_folder_watch_picks_up_new_scenes(tmp_path):
    """Serving loop: a scene dropped into the folder between scans is
    processed on the next scan, and already-done scenes are not redone."""
    import os

    from deepmerge_tpu.config import Config, DataConfig, MergeConfig, ModelConfig
    from deepmerge_tpu.infer.driver import process_folder

    images = tmp_path / "images"
    shps = tmp_path / "shps"

    def stage(seed, name):
        scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3,
                               seed=seed, name=name)
        paths = export_scene(scene, str(tmp_path / f"stage{seed}"))
        os.makedirs(images, exist_ok=True)
        os.makedirs(shps / name, exist_ok=True)
        os.rename(paths["image"], images / f"{name}.tif")
        for ext in (".shp", ".shx", ".dbf"):
            os.rename(str(tmp_path / f"stage{seed}" / f"{name}{ext}"),
                      shps / f"{name}{ext}")
            for base in ("PointsGCS", "lines"):
                src = tmp_path / f"stage{seed}" / name / f"{base}{ext}"
                if src.exists():
                    os.rename(str(src), shps / name / f"{base}{ext}")

    stage(1, "tile1")
    cfg = Config(
        model=ModelConfig(variant="v3", input_image_scales=(16, 32, 64),
                          cube=8, embed_dim=32, depth=(1, 1, 1), num_heads=4,
                          out_dim=8, dtype="float32"),
        data=DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                        eval_batch_size=16),
        merge=MergeConfig(engine="host"),
    )

    dropped = []

    def log_fn(msg):
        # drop tile2 into the watched folder while tile1 is processing —
        # the FIRST scan must not see it, the second must
        if not dropped and str(msg).startswith("processing tile1"):
            stage(2, "tile2")
            dropped.append(True)

    done = process_folder(cfg, str(images), str(shps), log_fn=log_fn,
                          watch_seconds=0.01, watch_iterations=3)
    assert done == ["tile1", "tile2"]  # tile1 exactly once, tile2 picked up
    assert (shps / "tile2" / f"{cfg.model.name}_features.h5").exists()


def test_process_folder_device_engine_async_finalize(tmp_path):
    """The serving fast path (device merge engine): process_scene returns a
    Future when given a finalize executor, its results match the sync call
    exactly, and the pipelined walk (scene k's host finalize overlapping
    scene k+1) still isolates a corrupt scene and completes the rest."""
    import os
    from concurrent.futures import Future, ThreadPoolExecutor

    from deepmerge_tpu.config import Config, DataConfig, MergeConfig, ModelConfig
    from deepmerge_tpu.infer.driver import load_params, process_folder, process_scene

    images = tmp_path / "images"
    shps = tmp_path / "shps"
    for seed in (1, 2, 3):
        scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3,
                               seed=seed, name=f"tile{seed}")
        paths = export_scene(scene, str(tmp_path / "stage"))
        os.makedirs(images, exist_ok=True)
        os.makedirs(shps / scene.name, exist_ok=True)
        os.rename(paths["image"], images / f"{scene.name}.tif")
        for ext in (".shp", ".shx", ".dbf"):
            os.rename(str(tmp_path / "stage" / f"{scene.name}{ext}"),
                      shps / f"{scene.name}{ext}")
            for base in ("PointsGCS", "lines"):
                src = tmp_path / "stage" / scene.name / f"{base}{ext}"
                if src.exists():
                    os.rename(str(src), shps / scene.name / f"{base}{ext}")
    with open(images / "tile2.tif", "wb") as f:
        f.write(b"not a tiff at all")

    cfg = Config(
        model=ModelConfig(variant="v3", input_image_scales=(16, 32, 64),
                          cube=8, embed_dim=32, depth=(1, 1, 1), num_heads=4,
                          out_dim=8, dtype="float32"),
        data=DataConfig(patch_sizes=(16, 32, 64), max_window=128,
                        eval_batch_size=16),
        merge=MergeConfig(engine="device"),
    )
    logs = []
    done = process_folder(cfg, str(images), str(shps), log_fn=logs.append)
    assert done == ["tile1", "tile3"]
    assert any("FAILED tile2" in ln for ln in logs)
    assert not (shps / "tile2" / f"{cfg.model.name}_features.h5").exists()
    for name in done:
        assert (shps / name / f"{cfg.model.name}_features.h5").exists()

    # async process_scene == sync process_scene, bit for bit
    scene1 = load_scene(str(images / "tile1.tif"), str(shps / "tile1.shp"),
                        str(shps / "tile1" / "PointsGCS.shp"),
                        str(shps / "tile1" / "lines.shp"), name="tile1")
    model, params, bs = load_params(cfg)
    emb_s, simi_s, res_s = process_scene(cfg, scene1, model, params, bs,
                                         log_fn=lambda *_: None)
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = process_scene(cfg, scene1, model, params, bs,
                            log_fn=lambda *_: None, finalize_executor=pool)
        assert isinstance(fut, Future)
        emb_a, simi_a, res_a = fut.result()
    np.testing.assert_array_equal(emb_s, emb_a)
    np.testing.assert_array_equal(simi_s, simi_a)
    np.testing.assert_array_equal(res_s.region_to_cluster,
                                  res_a.region_to_cluster)

    # walked simi (async finalize thread wrote lines.dbf) matches the sync
    # process_scene scores at dbf precision
    walked = ShapefileTable.read(str(shps / "tile1" / "lines.shp"))
    np.testing.assert_allclose(
        np.asarray(walked.get_field("simi"), np.float64),
        np.round(simi_s.astype(np.float64), 6), atol=5e-7)


def test_uint16_scene_extract_and_merge_parity(tmp_path, tiny_model_cfg,
                                               tiny_data_cfg):
    """A uint16 scene through the FULL pipeline == its mod-256 uint8 twin.

    The reference truncates deep rasters into its uint8 window buffer
    (``MyUtils1.py:189-191``, pinned verbatim in
    ``tests/test_verbatim_data_oracle.py::test_uint16_wrap_verbatim_parity``);
    here ``deep_pixels="wrap"`` rides load_scene → stage → extract → score →
    merge and must match the uint8 scene bit-for-bit at every stage.
    """
    import jax

    from deepmerge_tpu.geodata.geotiff import write_geotiff
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene
    from deepmerge_tpu.infer.scoring import score_scene_edges
    from deepmerge_tpu.models.s2former import build_model, init_params

    scene = generate_scene(h=96, w=96, n_regions=12, n_objects=4, seed=9,
                           name="deep")
    paths = export_scene(scene, str(tmp_path))

    # uint16 twin: low byte = the uint8 image, high byte varies per pixel
    # (so shift/clip would give DIFFERENT pixels — only wrap passes)
    rng = np.random.RandomState(3)
    hi = rng.randint(0, 256, scene.image.shape).astype(np.uint16)
    img16 = scene.image.astype(np.uint16) + 256 * hi
    p16 = str(tmp_path / "deep16.tif")
    write_geotiff(p16, img16,
                  scene.meta.get("geotransform",
                                 (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))

    s8 = load_scene(paths["image"], paths["polygons"], paths["points"],
                    paths["lines"], labels=scene.labels)
    s16 = load_scene(p16, paths["polygons"], paths["points"],
                     paths["lines"], labels=scene.labels,
                     deep_pixels="wrap")
    np.testing.assert_array_equal(s16.image, s8.image)

    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    ex = FeatureExtractor(model, variables["params"], batch_size=16)
    e8 = ex.extract_scene(s8, tiny_data_cfg)
    e16 = ex.extract_scene(s16, tiny_data_cfg)
    np.testing.assert_array_equal(np.asarray(e16), np.asarray(e8))

    simi = score_scene_edges(s16, np.asarray(e16))
    r = merge_scene(s16, np.asarray(e16),
                    threshold=float(np.median(simi)), max_rounds=4)
    r8 = merge_scene(s8, np.asarray(e8),
                     threshold=float(np.median(simi)), max_rounds=4)
    np.testing.assert_array_equal(r.region_to_cluster, r8.region_to_cluster)
