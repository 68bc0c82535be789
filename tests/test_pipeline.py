"""End-to-end slice: synthetic scene → train steps → extract → score → merge.

The SURVEY.md §7 "minimum end-to-end slice" exercised as one test: every
layer runs with zero geodata dependencies and produces a merged label map.
"""

import jax
import numpy as np
import pytest

from deepmerge_tpu.config import Config
from deepmerge_tpu.geodata.synthetic import generate_scene, make_training_pairs
from deepmerge_tpu.infer.extract import FeatureExtractor, FeatureStore
from deepmerge_tpu.infer.merge import merge_scene
from deepmerge_tpu.infer.scoring import score_scene_edges
from deepmerge_tpu.models.s2former import build_model
from deepmerge_tpu.train.loop import create_train_state, make_train_step
from deepmerge_tpu.train.sampler import PairSampler, stage_scene

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_end_to_end_slice(tiny_model_cfg, tiny_data_cfg):
    scene = generate_scene(h=160, w=160, n_regions=30, n_objects=5, seed=11)
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)

    # --- train a few steps --------------------------------------------------
    state = create_train_state(model, cfg, jax.random.key(0), steps_per_epoch=2)
    step = make_train_step(model, cfg)
    pos, neg = make_training_pairs(scene)
    sampler = PairSampler(scene, pos, neg, tiny_data_cfg)
    rng = jax.random.key(1)
    n_steps = 0
    for batch in sampler.epoch_batches(epoch_seed=0, batch_size=8):
        state, metrics = step(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        n_steps += 1
        if n_steps >= 3:
            break
    assert n_steps > 0

    # --- extract embeddings for every sample point --------------------------
    extractor = FeatureExtractor(model, state.params, batch_size=16)
    store = FeatureStore()  # in-memory
    ds = stage_scene(scene, tiny_data_cfg)
    emb = extractor.extract_scene(scene, tiny_data_cfg, store, device_scene=ds)
    assert emb.shape == (scene.regions.num_points, tiny_model_cfg.out_dim)
    assert np.isfinite(emb).all()
    np.testing.assert_array_equal(store.read_all(), emb)

    # --- score RAG edges -----------------------------------------------------
    simi = score_scene_edges(scene, emb, edge_batch=64)
    assert simi.shape == (scene.rag.num_edges,)
    assert (simi >= 0).all() and np.isfinite(simi).all()
    assert scene.rag.simi is simi

    # --- merge rounds → label map -------------------------------------------
    result = merge_scene(scene, emb, threshold=float(np.median(simi)), max_rounds=4)
    assert result.num_clusters <= scene.regions.num_regions
    assert result.edges_scored >= scene.rag.num_edges
    label_map = result.label_map(scene)
    assert label_map.shape == scene.labels.shape
    assert label_map.max() == result.num_clusters - 1


def test_in_memory_store_random_access():
    """get_by_id on a multi-chunk in-memory store indexes the right chunk
    (chunk-offset bisect, no per-lookup concatenate) incl. negative ids."""
    store = FeatureStore()
    r = np.random.RandomState(0)
    chunks = [r.rand(n, 4).astype(np.float32) for n in (3, 1, 5, 2)]
    for c in chunks:
        store.append(c)
    ref = np.concatenate(chunks, axis=0)
    for i in range(len(ref)):
        np.testing.assert_array_equal(store.get_by_id(i), ref[i])
    np.testing.assert_array_equal(store.get_by_id(-1), ref[-1])
    with pytest.raises(IndexError):
        store.get_by_id(len(ref))
    np.testing.assert_array_equal(store.read_all(), ref)


def test_extract_batch_padding(tiny_model_cfg, tiny_data_cfg):
    """Point count not divisible by the batch gives exact-length output."""
    scene = generate_scene(h=96, w=96, n_regions=9, n_objects=3, seed=5,
                           points_per_region=3)
    model = build_model(tiny_model_cfg)
    import deepmerge_tpu.models.s2former as s2

    variables = s2.init_params(model, jax.random.key(0))
    extractor = FeatureExtractor(model, variables["params"], batch_size=10)
    emb = extractor.extract_scene(scene, tiny_data_cfg)
    assert emb.shape[0] == scene.regions.num_points
    # padded forward must not change real rows: re-run with other batch size
    emb2 = FeatureExtractor(model, variables["params"], batch_size=7).extract_scene(
        scene, tiny_data_cfg
    )
    np.testing.assert_allclose(emb, emb2, atol=1e-5)


def test_four_band_scene_end_to_end():
    """4-band multispectral scenes (BASELINE config #4) work end-to-end."""
    from deepmerge_tpu.config import DataConfig, ModelConfig
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.scoring import score_scene_edges
    from deepmerge_tpu.models.s2former import init_params

    scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3, seed=4,
                           channels=4)
    assert scene.image.shape[-1] == 4
    mcfg = ModelConfig(
        variant="v3", input_image_scales=(16, 32, 64), cube=8, embed_dim=32,
        depth=(1, 1, 1), num_heads=4, out_dim=8, in_channels=4,
        dtype="float32",
    )
    dcfg = DataConfig(patch_sizes=(16, 32, 64), max_window=128, channels=4,
                      eval_batch_size=8)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0))
    emb = FeatureExtractor(model, variables["params"], batch_size=8).extract_scene(
        scene, dcfg
    )
    assert emb.shape == (scene.regions.num_points, 8)
    simi = score_scene_edges(scene, emb)
    assert np.isfinite(simi).all()


def test_segment_scene_device_matches_two_step(tiny_model_cfg, tiny_data_cfg):
    """The one-dispatch extract+score+merge program == the two-step path."""
    import jax.numpy as jnp

    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.ops.labelprop import device_score_and_merge

    scene = generate_scene(h=128, w=128, n_regions=24, n_objects=5, seed=6)
    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    extractor = FeatureExtractor(model, variables["params"], batch_size=16)

    edges = np.asarray(scene.rag.edges, np.int32)
    pad = (-len(edges)) % 32
    valid = np.ones(len(edges), bool)
    if pad:
        edges = np.concatenate([edges, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])

    emb = extractor.extract_scene_device(scene, tiny_data_cfg)
    want_simi, want_labels, want_rounds = device_score_and_merge(
        emb, jnp.asarray(scene.regions.point_region, jnp.int32),
        jnp.asarray(edges), jnp.asarray(valid),
        num_regions=scene.regions.num_regions, max_rounds=8,
    )
    R = scene.regions.num_regions
    got_simi, got_labels, got_rounds = extractor.segment_scene_device(
        scene, tiny_data_cfg, edges, valid,
        num_regions=R, max_rounds=8,
    )
    # the fused program runs a BUCKETED region axis (no per-scene
    # recompiles): real labels are the first R entries, phantom regions
    # stay singletons labeled with their own (post-R) ids
    got_labels = np.asarray(got_labels)
    np.testing.assert_array_equal(got_labels[:R], np.asarray(want_labels))
    from deepmerge_tpu.infer.extract import region_bucket

    assert got_labels.shape[0] == region_bucket(R)
    np.testing.assert_array_equal(got_labels[R:], np.arange(R, len(got_labels)))
    np.testing.assert_allclose(np.asarray(got_simi)[valid],
                               np.asarray(want_simi)[valid], rtol=1e-5)
    assert int(got_rounds) == int(want_rounds)

    # with region_map: same program + the dense (H, W) merged label map,
    # still one dispatch — must equal the two-step merged_label_map tail
    from deepmerge_tpu.ops.labelprop import merged_label_map

    want_map, want_k = merged_label_map(
        want_labels, jnp.asarray(scene.labels, jnp.int32)
    )
    m_simi, m_labels, m_rounds, got_map, got_k = (
        extractor.segment_scene_device(
            scene, tiny_data_cfg, edges, valid,
            num_regions=scene.regions.num_regions, max_rounds=8,
            region_map=scene.labels,
        )
    )
    np.testing.assert_array_equal(np.asarray(m_labels)[:R],
                                  np.asarray(want_labels))
    np.testing.assert_array_equal(np.asarray(got_map), np.asarray(want_map))
    assert int(got_k) == int(want_k)
    assert int(m_rounds) == int(want_rounds)


def test_chunk_cache_is_per_scene_not_per_address(tiny_model_cfg,
                                                  tiny_data_cfg):
    """Two staged scenes with the SAME point count must each get their own
    chunked metadata (regression: an id(ds)-keyed extractor cache outlived
    the DeviceScene and CPython's address reuse served scene B scene A's
    centers/scales/features — wrong embeddings ~80% of the time)."""
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.train.sampler import stage_scene

    a = generate_scene(h=128, w=128, n_regions=20, n_objects=4, seed=21)
    b = generate_scene(h=128, w=128, n_regions=20, n_objects=4, seed=22)
    assert a.regions.num_points == b.regions.num_points
    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    ex = FeatureExtractor(model, variables["params"], batch_size=16)

    # ground truth with explicit staging (cache keyed on these objects)
    dsa, dsb = stage_scene(a, tiny_data_cfg), stage_scene(b, tiny_data_cfg)
    want_a = np.asarray(ex.extract_scene_device(a, tiny_data_cfg, dsa))
    want_b = np.asarray(ex.extract_scene_device(b, tiny_data_cfg, dsb))
    assert not np.allclose(want_a, want_b)
    # cache must live on the DeviceScene, not in the extractor
    assert hasattr(dsa, "_chunked_inputs_cache")

    # internal staging (device_scene=None): ds is transient, addresses can
    # recycle — results must still be per-scene
    got_a = np.asarray(ex.extract_scene_device(a, tiny_data_cfg))
    got_b = np.asarray(ex.extract_scene_device(b, tiny_data_cfg))
    np.testing.assert_allclose(got_a, want_a, atol=1e-5)
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)


def test_extract_empty_scene_raises(tiny_model_cfg, tiny_data_cfg):
    """A scene with zero sample points raises a clear error, not
    ZeroDivisionError from the chunk-size arithmetic."""
    import dataclasses

    import pytest

    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.train.sampler import stage_scene

    scene = generate_scene(h=96, w=96, n_regions=9, n_objects=3, seed=5)
    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    ex = FeatureExtractor(model, variables["params"], batch_size=8)
    ds = stage_scene(scene, tiny_data_cfg)
    empty = dataclasses.replace(
        ds,
        points_yx=ds.points_yx[:0],
        point_features=ds.point_features[:0],
        point_inner=ds.point_inner[:0],
        point_object=ds.point_object[:0],
        point_region=ds.point_region[:0],
    )
    with pytest.raises(ValueError, match="no sample points"):
        ex._chunked_inputs_uncached(empty, tiny_data_cfg)


def test_extraction_chunks_are_balanced(tiny_model_cfg, tiny_data_cfg):
    """Odd point counts must not pad up to batch_size (2097 points at batch
    2048 once computed 4096 rows — a 2x waste measured on the bench)."""
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.train.sampler import stage_scene

    scene = generate_scene(h=160, w=160, n_regions=25, n_objects=4, seed=8,
                           points_per_region=3)  # 75 points
    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    ex = FeatureExtractor(model, variables["params"], batch_size=16)
    ds = stage_scene(scene, tiny_data_cfg)
    n, nb, args = ex._chunked_inputs(ds, tiny_data_cfg)
    total = args[0].shape[0] * args[0].shape[1]
    assert n == scene.regions.num_points
    assert nb == -(-n // 16)          # minimum chunk count for batch 16
    assert total - n < nb * 8, (total, n)   # ≤ alignment slack per chunk
    # and the embeddings still come out right
    emb = ex.extract_scene_device(scene, tiny_data_cfg, device_scene=ds)
    assert emb.shape == (n, tiny_model_cfg.out_dim)


def test_process_scene_mesh_matches_single_device(tiny_model_cfg,
                                                  tiny_data_cfg):
    """Driver-level mesh path (shard_map extraction + collective merge)
    produces the same embeddings, simi and partition as single-device."""
    from deepmerge_tpu.infer.driver import process_scene
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.parallel.mesh import make_mesh

    scene = generate_scene(h=128, w=128, n_regions=24, n_objects=5, seed=13)
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    params = init_params(model, jax.random.key(0))["params"]

    emb1, simi1, res1 = process_scene(cfg, scene, model, params, None,
                                      log_fn=lambda *_: None)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    emb2, simi2, res2 = process_scene(cfg, scene, model, params, None,
                                      log_fn=lambda *_: None, mesh=mesh)
    np.testing.assert_allclose(emb2, emb1, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(simi2, simi1, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(res2.region_to_cluster,
                                  res1.region_to_cluster)
    assert res2.num_clusters == res1.num_clusters


def test_streamed_extraction_matches_whole_scene(tiny_model_cfg,
                                                 tiny_data_cfg):
    """Column-strip streamed extraction (device never stages the whole
    mosaic) == whole-scene staging, bit-for-bit: the strip halo covers the
    window gather's exact reach, so every patch byte is identical."""
    from deepmerge_tpu.models.s2former import init_params

    scene = generate_scene(h=144, w=320, n_regions=48, n_objects=6, seed=21)
    model = build_model(tiny_model_cfg)
    params = init_params(model, jax.random.key(0))["params"]
    extractor = FeatureExtractor(model, params, batch_size=16)

    whole = extractor.extract_scene(scene, tiny_data_cfg)
    store = FeatureStore()
    streamed = extractor.extract_scene_streamed(
        scene, tiny_data_cfg, n_strips=4, store=store
    )
    np.testing.assert_array_equal(streamed, whole)
    np.testing.assert_array_equal(store.read_all(), whole)

    # budget route: a budget sized to an 8-strip plan forces >1 strips
    # (the halo makes tiny-scene strips proportionally wide, so absolute
    # fractions of the whole-scene bytes are not feasible here)
    from deepmerge_tpu.infer.extract import _plan_strips, _strips_for_budget
    from deepmerge_tpu.ops.patches import scene_pad, staged_channels, staging_caps

    feats, inner, obj = scene.regions.point_meta()
    caps = staging_caps(inner, obj, tiny_data_cfg.patch_sizes,
                        tiny_data_cfg.max_window)
    p = scene_pad(caps, scene.image.shape[-1])
    cs = staged_channels(scene.image.shape[-1])
    xs = scene.regions.points_yx[:, 1].astype(np.int64)
    order = np.argsort(xs, kind="stable")
    _, _, wmax8 = _plan_strips(scene, caps, xs, order, 8)
    budget_bytes = (scene.image.shape[0] + 2 * p) * (wmax8 + 2 * p) * cs
    ns = _strips_for_budget(scene, caps, xs, order, budget_bytes)
    assert 1 < ns <= 8
    budget = extractor.extract_scene_streamed(
        scene, tiny_data_cfg, hbm_budget_bytes=budget_bytes
    )
    np.testing.assert_array_equal(budget, whole)


def test_process_scene_streamed_matches_default(tiny_model_cfg,
                                                tiny_data_cfg):
    """Driver-level stream_tiles path: same embeddings, simi and partition
    as the default whole-scene staging."""
    from deepmerge_tpu.infer.driver import process_scene
    from deepmerge_tpu.models.s2former import init_params

    scene = generate_scene(h=128, w=256, n_regions=32, n_objects=5, seed=22)
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    params = init_params(model, jax.random.key(0))["params"]

    emb1, simi1, res1 = process_scene(cfg, scene, model, params, None,
                                      log_fn=lambda *_: None)
    emb2, simi2, res2 = process_scene(cfg, scene, model, params, None,
                                      log_fn=lambda *_: None, stream_tiles=3)
    np.testing.assert_array_equal(emb2, emb1)
    np.testing.assert_array_equal(simi2, simi1)
    np.testing.assert_array_equal(res2.region_to_cluster,
                                  res1.region_to_cluster)


def test_streamed_extraction_mesh_exclusive(tiny_model_cfg, tiny_data_cfg,
                                            small_scene):
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.parallel.mesh import make_mesh

    import pytest

    model = build_model(tiny_model_cfg)
    params = init_params(model, jax.random.key(0))["params"]
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    ex = FeatureExtractor(model, params, batch_size=16, mesh=mesh)
    with pytest.raises(ValueError, match="single-device"):
        ex.extract_scene_streamed(small_scene, tiny_data_cfg, n_strips=2)


def test_process_scene_fused_matches_split_path(tiny_model_cfg,
                                                tiny_data_cfg, tmp_path):
    """The single-dispatch serving path (process_scene fused=True:
    segment_scene_device with embeddings) must reproduce the split
    extract→score→merge path exactly — embeddings, simi, partition and the
    h5 store — for both the absolute and the quantile threshold configs."""
    import dataclasses

    from deepmerge_tpu.config import MergeConfig
    from deepmerge_tpu.infer.driver import process_scene
    from deepmerge_tpu.models.s2former import init_params

    scene = generate_scene(h=128, w=192, n_regions=28, n_objects=5, seed=33)
    model = build_model(tiny_model_cfg)
    params = init_params(model, jax.random.key(0))["params"]

    for mc in (MergeConfig(engine="device", threshold=1.0),
               MergeConfig(engine="device", threshold_quantile=0.4)):
        cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg, merge=mc)
        h5a = str(tmp_path / f"a_{mc.threshold_quantile}.h5")
        h5b = str(tmp_path / f"b_{mc.threshold_quantile}.h5")
        emb1, simi1, res1 = process_scene(
            cfg, scene, model, params, None, h5_path=h5a,
            log_fn=lambda *_: None, fused=False)
        emb2, simi2, res2 = process_scene(
            cfg, scene, model, params, None, h5_path=h5b,
            log_fn=lambda *_: None, fused=True)
        np.testing.assert_array_equal(emb2, emb1)
        np.testing.assert_allclose(simi2, simi1, atol=1e-6)
        np.testing.assert_array_equal(res2.region_to_cluster,
                                      res1.region_to_cluster)
        assert res2.rounds == res1.rounds
        np.testing.assert_array_equal(FeatureStore.open(h5b),
                                      FeatureStore.open(h5a))
