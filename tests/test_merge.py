"""Segment pooling, edge scoring, union-find, and the merge engine."""

import numpy as np
import jax.numpy as jnp

from deepmerge_tpu.infer.merge import MergeEngine, UnionFind, connected_labels
from deepmerge_tpu.infer.scoring import region_embeddings, score_edges
from deepmerge_tpu.ops.segment import edge_distances, pairwise_sqdist, segment_mean


def test_segment_mean_basic():
    emb = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    ids = jnp.asarray(np.array([0, 0, 2], np.int32))
    out = np.asarray(segment_mean(emb, ids, 3))
    np.testing.assert_allclose(out[0], [2.0, 3.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # empty region -> zeros
    np.testing.assert_allclose(out[2], [5.0, 6.0])


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.randn(7, 5).astype(np.float32)
    y = rng.randn(9, 5).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_edge_distances(rng):
    remb = rng.randn(10, 4).astype(np.float32)
    edges = np.array([[0, 1], [2, 5], [9, 9]], np.int32)
    got = np.asarray(edge_distances(jnp.asarray(remb), jnp.asarray(edges)))
    want = np.sqrt(((remb[edges[:, 0]] - remb[edges[:, 1]]) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got[2] == 0.0


def test_score_edges_padded_batching(rng):
    remb = jnp.asarray(rng.randn(20, 4).astype(np.float32))
    edges = np.stack([rng.randint(0, 20, 100), rng.randint(0, 20, 100)], 1)
    full = score_edges(remb, edges, edge_batch=1000)
    chunked = score_edges(remb, edges, edge_batch=7)
    np.testing.assert_allclose(full, chunked, rtol=1e-6)


def test_union_find_deterministic():
    uf = UnionFind(6)
    uf.union_edges(np.array([[4, 5], [1, 0], [2, 1]]))
    labels, k = uf.labels()
    assert k == 3
    # components {0,1,2}, {3}, {4,5} labeled by smallest member order
    np.testing.assert_array_equal(labels, [0, 0, 0, 1, 2, 2])


def test_connected_labels_matches_unionfind(rng):
    n = 50
    edges = np.stack([rng.randint(0, n, 40), rng.randint(0, n, 40)], 1)
    l1, k1 = connected_labels(n, edges)
    uf = UnionFind(n)
    uf.union_edges(edges)
    l2, k2 = uf.labels()
    assert k1 == k2
    np.testing.assert_array_equal(l1, l2)


def test_merge_engine_recovers_ground_truth():
    """Points embedded exactly by object id must merge into the objects."""
    r = np.random.RandomState(3)
    n_regions, n_objects, d = 30, 5, 8
    obj_of_region = r.randint(0, n_objects, n_regions)
    centers = r.randn(n_objects, d).astype(np.float32) * 10
    # 3 points per region, tight around the object center
    point_region = np.repeat(np.arange(n_regions), 3)
    pts = centers[obj_of_region[point_region]] + 0.01 * r.randn(len(point_region), d).astype(np.float32)

    # RAG: connect some same-object and different-object pairs
    edges = []
    for _ in range(120):
        a, b = r.randint(0, n_regions, 2)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    edges = np.unique(np.array(edges), axis=0)

    result = MergeEngine(threshold=1.0, max_rounds=8).run(
        pts, point_region, n_regions, edges
    )
    # merged clusters must never mix ground-truth objects
    for cl in range(result.num_clusters):
        members = np.where(result.region_to_cluster == cl)[0]
        assert len(np.unique(obj_of_region[members])) == 1
    # and regions of the same object that are RAG-connected must merge
    lab = result.region_to_cluster
    same_obj_edges = edges[obj_of_region[edges[:, 0]] == obj_of_region[edges[:, 1]]]
    assert (lab[same_obj_edges[:, 0]] == lab[same_obj_edges[:, 1]]).all()


def test_merge_engine_no_merges_when_threshold_zero(rng):
    pts = rng.randn(12, 4).astype(np.float32)
    point_region = np.arange(12) // 2
    edges = np.array([[0, 1], [1, 2], [3, 4]], np.int64)
    result = MergeEngine(threshold=0.0, max_rounds=4).run(pts, point_region, 6, edges)
    assert result.num_clusters == 6
    np.testing.assert_array_equal(result.region_to_cluster, np.arange(6))


def test_device_merge_matches_host_engine():
    """The one-dispatch device merge yields the same partition as the host
    union-find engine."""
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.infer.merge import merge_scene, merge_scene_device

    scene = generate_scene(h=128, w=128, n_regions=40, n_objects=6, seed=9)
    r = np.random.RandomState(0)
    emb = r.randn(scene.regions.num_points, 8).astype(np.float32)
    # make same-object points close so merges actually happen
    obj = scene.object_of_region[scene.regions.point_region]
    emb = emb * 0.05 + np.eye(8, dtype=np.float32)[obj % 8] * 3

    for thr in (0.5, 1.0, 3.0):
        host = merge_scene(scene, emb, threshold=thr, max_rounds=8)
        dev = merge_scene_device(scene, emb, threshold=thr, max_rounds=8)
        assert host.num_clusters == dev.num_clusters, thr
        # identical partitions (both engines use min-id canonical labels)
        np.testing.assert_array_equal(
            host.region_to_cluster, dev.region_to_cluster
        )


def test_device_score_and_merge_single_dispatch():
    """The one-dispatch pool+score+threshold+merge agrees with its parts."""
    import jax.numpy as jnp

    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.infer.scoring import score_scene_edges
    from deepmerge_tpu.ops.labelprop import device_score_and_merge

    scene = generate_scene(h=96, w=96, n_regions=20, n_objects=4, seed=2)
    r = np.random.RandomState(0)
    emb = r.randn(scene.regions.num_points, 8).astype(np.float32)

    e = scene.rag.edges.astype(np.int32)
    pad = (-len(e)) % 64
    valid = np.ones(len(e), bool)
    if pad:
        e = np.concatenate([e, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    simi, labels, rounds = device_score_and_merge(
        jnp.asarray(emb), jnp.asarray(scene.regions.point_region, jnp.int32),
        jnp.asarray(e), jnp.asarray(valid),
        num_regions=scene.regions.num_regions, max_rounds=8,
    )
    simi = np.asarray(simi)[: scene.rag.num_edges]
    want_simi = score_scene_edges(scene, emb)
    np.testing.assert_allclose(simi, want_simi, rtol=1e-5, atol=1e-6)

    thr = float(np.sort(want_simi)[(len(want_simi) - 1) // 2])
    want = merge_scene_device(scene, emb, threshold=thr, max_rounds=8)
    got = np.asarray(labels)
    _, dense = np.unique(got, return_inverse=True)
    np.testing.assert_array_equal(dense, want.region_to_cluster)


def test_calibrate_threshold_recovers_object_partition(small_scene):
    """With embeddings clustered by ground-truth object, calibration finds a
    threshold whose merge reproduces the object partition (0 disagreement) —
    no hand-tuned threshold (the round-2 EVAL gap)."""
    from deepmerge_tpu.infer.calibrate import calibrate_threshold

    scene = small_scene
    r = np.random.RandomState(5)
    obj = scene.object_of_region[scene.regions.point_region]
    emb = (np.eye(8, dtype=np.float32)[obj % 8] * 3.0
           + 0.05 * r.randn(scene.regions.num_points, 8).astype(np.float32))

    cal = calibrate_threshold(scene, emb, max_rounds=8)
    assert cal.disagreement == 0.0
    assert cal.clusters == len(np.unique(scene.object_of_region))
    assert len(cal.table) >= 5
    # the chosen threshold separates the two distance modes
    assert 0.0 < cal.threshold < 3.0


def test_merged_label_map_matches_host_relabel(rng):
    """Device dense-relabel + (H, W) expansion == np.unique(return_inverse)
    then host gather (the infer/merge.py relabel semantics)."""
    from deepmerge_tpu.ops.labelprop import merged_label_map

    r = 37
    # min-member-id style labels: each label points at some smaller-or-equal id
    labels = np.minimum(np.arange(r), rng.randint(0, r, r)).astype(np.int32)
    region_map = rng.randint(0, r, (23, 31)).astype(np.int32)

    map_dev, n_dev = merged_label_map(jnp.asarray(labels), jnp.asarray(region_map))

    uniq, dense = np.unique(labels, return_inverse=True)
    expect = dense.astype(np.int32)[region_map]
    assert int(n_dev) == len(uniq)
    np.testing.assert_array_equal(np.asarray(map_dev), expect)


def test_merged_label_map_single_cluster(rng):
    from deepmerge_tpu.ops.labelprop import merged_label_map

    labels = np.zeros(9, np.int32)
    region_map = rng.randint(0, 9, (4, 5)).astype(np.int32)
    map_dev, n_dev = merged_label_map(jnp.asarray(labels), jnp.asarray(region_map))
    assert int(n_dev) == 1 and np.asarray(map_dev).max() == 0


def test_three_engines_agree_fuzz():
    """Fuzz: host union-find, one-dispatch device merge, and the collective
    distributed merge produce the SAME partition on random embeddings/edges
    across seeds and thresholds (shapes fixed so compiled programs are
    reused; thresholds drawn from the distance distribution so merges
    actually trigger at every depth)."""
    import jax

    from deepmerge_tpu.infer.merge import MergeEngine
    from deepmerge_tpu.ops.labelprop import device_merge
    from deepmerge_tpu.parallel.distributed import distributed_merge
    from deepmerge_tpu.parallel.mesh import make_mesh

    R, P, E = 41, 67, 59
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    for seed in range(8):
        r = np.random.RandomState(100 + seed)
        emb = r.randn(P, 6).astype(np.float32)
        pr = r.randint(0, R, P).astype(np.int32)
        edges = r.randint(0, R, (E, 2)).astype(np.int32)
        # thresholds at the 20th/60th percentile of initial edge distances
        from deepmerge_tpu.ops.segment import segment_mean, edge_distances
        remb = segment_mean(jnp.asarray(emb), jnp.asarray(pr), R)
        d = np.asarray(edge_distances(remb, jnp.asarray(edges),
                                      jnp.ones(E, bool)))
        for q in (0.2, 0.6):
            thr = float(np.quantile(d, q)) + 1e-3
            host = MergeEngine(thr, max_rounds=12).run(emb, pr, R, edges)
            dev_labels, _ = device_merge(
                jnp.asarray(emb), jnp.asarray(pr), jnp.asarray(edges),
                jnp.ones(E, bool), thr, num_regions=R, max_rounds=12,
            )
            dist_labels, _ = distributed_merge(
                emb, pr, R, edges, mesh, threshold=thr, max_rounds=12,
            )
            _, dev_dense = np.unique(np.asarray(dev_labels),
                                     return_inverse=True)
            np.testing.assert_array_equal(
                host.region_to_cluster, dev_dense, f"seed={seed} q={q}")
            np.testing.assert_array_equal(
                np.asarray(dev_labels), dist_labels, f"seed={seed} q={q}")
