"""Multi-chip sharding on the 8-device virtual CPU mesh.

DP (batch over 'data') and TP (heads/FFN over 'model') must compile and run
with XLA-inserted collectives — the reference has no distributed path at all
(SURVEY.md §2.4), so these are green-field guarantees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.config import Config
from deepmerge_tpu.geodata.synthetic import generate_scene, make_training_pairs
from deepmerge_tpu.models.s2former import build_model
from deepmerge_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params
from deepmerge_tpu.train.loop import create_train_state, make_train_step
from deepmerge_tpu.train.sampler import PairSampler

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_train_step(tiny_model_cfg, tiny_data_cfg, small_scene):
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, cfg)

    mesh = make_mesh(n_data=8, n_model=1)
    state = state.replace(
        params=replicate(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    pos, neg = make_training_pairs(small_scene)
    sampler = PairSampler(small_scene, pos, neg, tiny_data_cfg)
    batch = next(iter(sampler.epoch_batches(epoch_seed=0, batch_size=16)))
    batch = shard_batch(batch, mesh)

    state2, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    # sharded result == single-device result on the same batch
    host_batch = jax.tree.map(lambda x: jax.device_get(x), batch)
    state_ref = create_train_state(model, cfg, jax.random.key(0))
    _, metrics_ref = step(state_ref, host_batch, jax.random.key(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-4
    )


@pytest.mark.parametrize("n_model", [2, 4])
def test_tp_forward_matches_replicated(tiny_model_cfg, n_model):
    model = build_model(tiny_model_cfg)
    import deepmerge_tpu.models.s2former as s2

    variables = s2.init_params(model, jax.random.key(0))
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(4, s, s, 3), jnp.float32)
        for s in tiny_model_cfg.input_image_scales
    )
    designed = jnp.asarray(r.rand(4, 19), jnp.float32)

    want = np.asarray(model.apply(variables, patches, designed, False))

    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    params_tp = shard_params(variables["params"], mesh)

    @jax.jit
    def fwd(p, patches, designed):
        return model.apply({"params": p}, patches, designed, False)

    got = np.asarray(fwd(params_tp, patches, designed))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tp_params_actually_sharded(tiny_model_cfg):
    model = build_model(tiny_model_cfg)
    import deepmerge_tpu.models.s2former as s2

    variables = s2.init_params(model, jax.random.key(0))
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(variables["params"], mesh)
    qkv = params["blocks0_0"]["attn"]["qkv"]["kernel"]
    # sharded on the output (model) dim: each shard holds half the columns
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(qkv.shape[0], qkv.shape[1] // 2)}


def test_sharded_extraction_matches_single_device(tiny_model_cfg, tiny_data_cfg,
                                                  small_scene):
    """Mesh-sharded (shard_map) extraction == single-device extraction."""
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.models.s2former import init_params

    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))
    single = FeatureExtractor(model, variables["params"], batch_size=16)
    emb1 = single.extract_scene(small_scene, tiny_data_cfg)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = FeatureExtractor(model, variables["params"], batch_size=16,
                               mesh=mesh)
    emb2 = sharded.extract_scene(small_scene, tiny_data_cfg)
    np.testing.assert_allclose(emb1, emb2, atol=1e-5)


def test_sharded_mosaic_merge_matches_global(small_scene):
    """Column-sharded mosaic merge (local merges + boundary resolution)
    reproduces the single-device partition."""
    from deepmerge_tpu.infer.merge import merge_scene
    from deepmerge_tpu.parallel.distributed import merge_sharded_approx

    r = np.random.RandomState(1)
    scene = small_scene
    obj = scene.object_of_region[scene.regions.point_region]
    emb = (np.eye(8, dtype=np.float32)[obj % 8] * 4
           + 0.05 * r.randn(scene.regions.num_points, 8).astype(np.float32))

    want = merge_scene(scene, emb, threshold=1.0, max_rounds=8)
    for n_shards in (2, 4):
        got = merge_sharded_approx(scene, emb, n_shards, threshold=1.0, max_rounds=8)
        assert got.num_clusters == want.num_clusters, n_shards
        np.testing.assert_array_equal(
            got.region_to_cluster, want.region_to_cluster
        )


def test_distributed_merge_exact_vs_device_merge_nonmonotone():
    """Collective (psum/pmin) merge == single-device device_merge on an
    ADVERSARIAL non-monotone chain.

    Embeddings [1.8, 0.9, 0.0]: both chain edges pass in round 1
    simultaneously, yet after merging {1,2} the {0}-side distance to the
    merged mean (1.35) would NOT pass — the fixpoint depends on the exact
    simultaneous-round semantics, which local-first merging can break. The
    collective path must reproduce the global rounds bit-for-bit."""
    import jax.numpy as jnp

    from deepmerge_tpu.ops.labelprop import device_merge
    from deepmerge_tpu.parallel.distributed import distributed_merge

    emb = np.array([[1.8, 0.0], [0.9, 0.0], [0.0, 0.0]], np.float32)
    pr = np.array([0, 1, 2], np.int32)
    edges = np.array([[0, 1], [1, 2]], np.int32)

    want, want_rounds = device_merge(
        jnp.asarray(emb), jnp.asarray(pr), jnp.asarray(edges),
        jnp.ones(2, bool), 1.0, num_regions=3, max_rounds=8,
    )
    want = np.asarray(want)
    assert len(np.unique(want)) == 1  # the whole chain merges in round 1

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    got, rounds = distributed_merge(
        emb, pr, 3, edges, mesh, threshold=1.0, max_rounds=8
    )
    np.testing.assert_array_equal(got, want)
    assert rounds == int(want_rounds)

    # and a case where the merged mean ENABLES a later merge (2 rounds)
    emb2 = np.array([[0.0, 0.0], [0.9, 0.0], [2.2, 0.0]], np.float32)
    want2, r2 = device_merge(
        jnp.asarray(emb2), jnp.asarray(pr), jnp.asarray(edges),
        jnp.ones(2, bool), 1.4, num_regions=3, max_rounds=8,
    )
    got2, rounds2 = distributed_merge(
        emb2, pr, 3, edges, mesh, threshold=1.4, max_rounds=8
    )
    np.testing.assert_array_equal(got2, np.asarray(want2))
    assert rounds2 == int(r2)


def test_distributed_merge_matches_device_merge_random():
    """Collective merge == device_merge across random scenes and shard
    counts (points and edges physically sharded, padded unevenly)."""
    import jax.numpy as jnp

    from deepmerge_tpu.ops.labelprop import device_merge
    from deepmerge_tpu.parallel.distributed import distributed_merge

    rng = np.random.RandomState(3)
    R, P, E = 37, 61, 53
    emb = rng.randn(P, 5).astype(np.float32)
    pr = rng.randint(0, R, P).astype(np.int32)
    edges = rng.randint(0, R, (E, 2)).astype(np.int32)
    thr = 2.0

    want, _ = device_merge(
        jnp.asarray(emb), jnp.asarray(pr), jnp.asarray(edges),
        jnp.ones(E, bool), thr, num_regions=R, max_rounds=12,
    )
    for n_shards in (2, 8):
        mesh = make_mesh(n_data=n_shards, n_model=1,
                         devices=jax.devices()[:n_shards])
        got, _ = distributed_merge(
            emb, pr, R, edges, mesh, threshold=thr, max_rounds=12
        )
        np.testing.assert_array_equal(got, np.asarray(want))


def test_extract_and_merge_sharded_disjoint_tiles(tiny_model_cfg):
    """Memory-distributed extract+merge: per-shard tiles are PHYSICALLY
    disjoint column strips (+halo), each device embeds only its own points,
    and the partition equals the global single-device engine's."""
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.parallel.distributed import (
        extract_and_merge_sharded,
        stage_scene_shards,
    )

    from deepmerge_tpu.config import DataConfig

    scene = generate_scene(h=128, w=1536, n_regions=48, n_objects=8,
                           points_per_region=1, seed=11)
    # UNCLAMPED windows: max_window >= the scene's full adaptive-scale
    # ladder so the sharded parity runs on reference-faithful patches
    # (no clamp warning, VERDICT r3 weak #5)
    from tests.helpers import unclamped_max_window

    dcfg = DataConfig(patch_sizes=(16, 32, 64),
                      max_window=unclamped_max_window(scene),
                      eval_batch_size=16)
    n_shards = 4

    staged = stage_scene_shards(scene, dcfg, n_shards)
    # the shard tiles are strict sub-ranges of the mosaic, not copies of it
    from deepmerge_tpu.ops.patches import scene_pad

    pad = scene_pad(staged.caps, 3)
    tile_w = staged.tiles.shape[2] - 2 * pad
    assert tile_w < scene.image.shape[1] * 0.75, (
        f"tiles {tile_w}px wide are not meaningfully smaller than the "
        f"{scene.image.shape[1]}px mosaic"
    )

    model = build_model(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))

    # global reference: single-device extraction + device merge
    extractor = FeatureExtractor(model, variables["params"], batch_size=16)
    emb = extractor.extract_scene(scene, dcfg)
    # a threshold that actually merges: median of scored RAG edge distances
    from deepmerge_tpu.ops.segment import edge_distances, segment_mean

    remb = segment_mean(jnp.asarray(emb), jnp.asarray(scene.regions.point_region),
                        scene.regions.num_regions)
    d = np.asarray(edge_distances(remb, jnp.asarray(scene.rag.edges, np.int32)))
    # threshold strictly BETWEEN two distinct edge distances: the median can
    # land exactly on an edge's d, making the decision depend on f32
    # reduction order (the knife-edge warning this test used to trip)
    ds = np.unique(d)
    k = len(ds) // 2
    thr = float(0.5 * (ds[k - 1] + ds[k])) if len(ds) > 1 else float(ds[0]) * 1.5
    want = merge_scene_device(scene, emb, threshold=thr, max_rounds=8)

    mesh = make_mesh(n_data=n_shards, n_model=1,
                     devices=jax.devices()[:n_shards])
    got = extract_and_merge_sharded(
        model, variables["params"], scene, dcfg, mesh,
        threshold=thr, max_rounds=8,
    )
    assert got.num_clusters == want.num_clusters
    np.testing.assert_array_equal(got.region_to_cluster, want.region_to_cluster)


def test_extract_and_merge_sharded_v4_batch_stats():
    """v4/v5 carry a batch_stats collection (AuxBlock BatchNorm) — the
    sharded path must thread it through (replicated, like params) and
    match the single-device result."""
    from deepmerge_tpu.config import DataConfig, ModelConfig
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.parallel.distributed import extract_and_merge_sharded

    mcfg = ModelConfig(variant="v4", input_image_scales=(16, 32, 64), cube=8,
                       embed_dim=32, depth=(1, 1, 1), num_heads=4, out_dim=16,
                       dtype="float32")
    from tests.helpers import unclamped_max_window

    scene = generate_scene(h=96, w=768, n_regions=24, n_objects=6,
                           points_per_region=1, seed=13)
    dcfg = DataConfig(patch_sizes=(16, 32, 64),
                      max_window=unclamped_max_window(scene),
                      eval_batch_size=8)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0))
    bs = variables.get("batch_stats")
    assert bs, "v4 must carry batch_stats for this test to mean anything"

    extractor = FeatureExtractor(model, variables["params"], batch_stats=bs,
                                 batch_size=8)
    emb = extractor.extract_scene(scene, dcfg)
    want = merge_scene_device(scene, emb, threshold=1.0, max_rounds=8)

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    got = extract_and_merge_sharded(
        model, variables["params"], scene, dcfg, mesh,
        threshold=1.0, max_rounds=8, batch_stats=bs,
    )
    assert got.num_clusters == want.num_clusters
    np.testing.assert_array_equal(got.region_to_cluster,
                                  want.region_to_cluster)


def test_distributed_merge_warns_on_knife_edge():
    """A merge decision within f32 rounding of threshold**2 triggers the
    knife-edge warning (the bit-identical claim is runtime-checked now)."""
    import warnings

    from deepmerge_tpu.parallel.distributed import distributed_merge

    emb = np.array([[0.0, 0.0], [1.0, 0.0]], np.float32)  # d^2 == thr^2
    pr = np.array([0, 1], np.int32)
    edges = np.array([[0, 1]], np.int32)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        distributed_merge(emb, pr, 2, edges, mesh, threshold=1.0,
                          max_rounds=4)
    assert any("knife edge" in str(x.message) for x in w)

    # and a comfortably-margined case stays silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        distributed_merge(emb, pr, 2, edges, mesh, threshold=2.0,
                          max_rounds=4)
    assert not any("knife edge" in str(x.message) for x in w)


def test_distributed_merge_program_cache_reuse():
    """Same (mesh, shapes) signature with a DIFFERENT threshold must hit the
    compiled-program cache: threshold is a traced argument, and recompiles
    cost minutes each through the remote-compile relay."""
    from deepmerge_tpu.parallel import distributed
    from deepmerge_tpu.parallel.distributed import distributed_merge

    rng = np.random.RandomState(11)
    R, P, E = 19, 29, 23
    emb = rng.randn(P, 4).astype(np.float32)
    pr = rng.randint(0, R, P).astype(np.int32)
    edges = rng.randint(0, R, (E, 2)).astype(np.int32)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])

    before = dict(distributed._MERGE_FN_CACHE)
    try:
        distributed._MERGE_FN_CACHE.clear()
        distributed_merge(emb, pr, R, edges, mesh, threshold=0.5)
        assert len(distributed._MERGE_FN_CACHE) == 1
        fn = next(iter(distributed._MERGE_FN_CACHE.values()))
        # threshold sweep + identical-shape rerun: same ONE cached program
        distributed_merge(emb, pr, R, edges, mesh, threshold=2.5)
        distributed_merge(emb, pr, R, edges, mesh, threshold=0.5)
        assert len(distributed._MERGE_FN_CACHE) == 1
        assert next(iter(distributed._MERGE_FN_CACHE.values())) is fn
        # a different static signature (num_regions) gets its own entry;
        # plain shape changes are handled by jax.jit's own per-shape cache
        distributed_merge(emb, pr % (R - 1), R - 1, edges % (R - 1), mesh,
                          threshold=0.5)
        assert len(distributed._MERGE_FN_CACHE) == 2
    finally:
        distributed._MERGE_FN_CACHE.clear()
        distributed._MERGE_FN_CACHE.update(before)


def test_merge_cache_lru_eviction(monkeypatch):
    """The compiled-program cache is a bounded LRU: oldest-unused entries
    are evicted, hits refresh recency."""
    from deepmerge_tpu.parallel import distributed as d

    monkeypatch.setattr(d, "_MERGE_FN_CACHE", type(d._MERGE_FN_CACHE)())
    monkeypatch.setattr(d, "_MERGE_FN_CACHE_MAX", 2)
    d._merge_cache_put("a", 1)
    d._merge_cache_put("b", 2)
    assert d._merge_cache_get("a") == 1   # refreshes 'a'
    d._merge_cache_put("c", 3)            # evicts 'b' (least recent)
    assert d._merge_cache_get("b") is None
    assert d._merge_cache_get("a") == 1
    assert d._merge_cache_get("c") == 3
    assert len(d._MERGE_FN_CACHE) == 2
