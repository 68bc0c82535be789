"""Pair files, triplet generation, tile export, triplet sampler, triplet loss."""

import numpy as np
import jax.numpy as jnp

from deepmerge_tpu.geodata.pairgen import (
    compute_mean_std,
    export_training_pairs,
    generate_triplets,
    read_pair_file,
    read_triplets,
    scan_pair_folder,
    write_pair_file,
    write_triplets,
)
from deepmerge_tpu.geodata.synthetic import generate_scene
from deepmerge_tpu.geodata.tiles import (
    export_class_patches,
    load_patch_shard,
    split_indices,
)
from deepmerge_tpu.train.losses import triplet_loss
from deepmerge_tpu.train.sampler import TripletSampler


def test_pair_file_roundtrip(tmp_path):
    pairs = np.array([[3, 7], [1, 2], [9, 4]], np.int32)
    p = str(tmp_path / "pairs.txt")
    write_pair_file(p, pairs)
    np.testing.assert_array_equal(read_pair_file(p), pairs)


def test_scan_pair_folder(tmp_path):
    scene = generate_scene(h=96, w=96, n_regions=12, n_objects=4, seed=3)
    pp, np_ = export_training_pairs(scene, str(tmp_path))
    files, total = scan_pair_folder(str(tmp_path / "PositiveData"))
    assert files == 1
    assert total == len(read_pair_file(pp))
    assert total + len(read_pair_file(np_)) == scene.rag.num_edges


def test_read_pair_source(tmp_path):
    """File, per-scene folder pick, and whole-folder concat semantics."""
    from deepmerge_tpu.geodata.pairgen import read_pair_source

    a = np.array([[1, 2], [3, 4]], np.int32)
    b = np.array([[5, 6]], np.int32)
    folder = tmp_path / "PositiveData"
    folder.mkdir()
    write_pair_file(str(folder / "sceneA.txt"), a)
    write_pair_file(str(folder / "sceneB.txt"), b)
    # plain file
    np.testing.assert_array_equal(
        read_pair_source(str(folder / "sceneA.txt")), a
    )
    # folder + scene_name -> only that scene's txt
    np.testing.assert_array_equal(
        read_pair_source(str(folder), scene_name="sceneB"), b
    )
    # folder without a matching name -> concat all (sorted by filename)
    np.testing.assert_array_equal(
        read_pair_source(str(folder)), np.concatenate([a, b])
    )


def test_triplet_generation_and_roundtrip(tmp_path):
    labels = np.array([0, 0, 1, 1, 2, 2, 2])
    ids = np.arange(7) * 10
    t = generate_triplets(labels, ids, n=50, seed=1)
    assert t.shape == (50, 6)
    # anchor and positive share class, negative differs
    assert (t[:, 0] == t[:, 2]).all()
    assert (t[:, 0] != t[:, 4]).all()
    path = str(tmp_path / "triplets.txt")
    write_triplets(path, t)
    np.testing.assert_array_equal(read_triplets(path), t)


def test_split_indices_deterministic():
    t1, v1 = split_indices(100, 0.8, seed=42)
    t2, v2 = split_indices(100, 0.8, seed=42)
    np.testing.assert_array_equal(t1, t2)
    assert len(t1) == 80 and len(v1) == 20
    assert len(np.intersect1d(t1, v1)) == 0


def test_export_class_patches(tmp_path, rng):
    image = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    centers = np.stack([rng.randint(0, 128, 20), rng.randint(0, 128, 20)], 1)
    classes = rng.randint(0, 5, 20)
    out = export_class_patches(
        str(tmp_path), image, centers, classes, window=32, out_size=16,
        train_frac=0.75,
    )
    assert out["train"] and out["val"]
    patches, labels = load_patch_shard(out["train"][0])
    assert patches.shape[1:] == (16, 16, 3)
    assert patches.min() >= 0 and patches.max() <= 1.0
    assert len(patches) == len(labels) == 15


def test_triplet_sampler(tiny_data_cfg):
    scene = generate_scene(h=128, w=128, n_regions=16, n_objects=4, seed=5)
    sampler = TripletSampler(scene, tiny_data_cfg, crop_size=32)
    batch = next(iter(sampler.epoch_batches(epoch_seed=0, batch_size=4)))
    for key in ("anchor", "positive", "negative"):
        assert len(batch[key]) == 3  # 3 context crops
        assert batch[key][0].shape == (4, 32, 32, 3)


def test_triplet_test_mode_object_stacks(tiny_data_cfg):
    """Reference GenerateTestDataset semantics (MyUtils.py:110-196):
    per-object and per-neighbor (P, 3, s, s, C) point stacks keyed by the
    RAG ('join' field) adjacency."""
    scene = generate_scene(h=128, w=128, n_regions=16, n_objects=4, seed=5,
                           points_per_region=2)
    sampler = TripletSampler(scene, tiny_data_cfg, crop_size=32)
    region = int(scene.rag.edges[0, 0])
    obj_stack, nbr_stacks, obj_idx, nbr_idx = sampler.test_object(region)

    pr = scene.regions.point_region
    n_pts = int(np.sum(pr == region))
    assert obj_idx == region
    assert obj_stack.shape == (n_pts, 3, 32, 32, 3)

    # neighbors == RAG adjacency of the region (the reference 'join' field)
    edges = scene.rag.edges
    expected = sorted(
        set(edges[edges[:, 0] == region, 1].tolist())
        | set(edges[edges[:, 1] == region, 0].tolist())
    )
    with_points = [k for k in expected if np.sum(pr == k) > 0]
    assert nbr_idx == expected
    assert len(nbr_stacks) == len(with_points)
    for k, s in zip(with_points, nbr_stacks):
        assert s.shape == (int(np.sum(pr == k)), 3, 32, 32, 3)

    # object stack row 0 == the 3-context crops of that point, one-by-one
    single, _ = sampler._stacked_contexts(np.where(pr == region)[0][:1], None)
    np.testing.assert_allclose(obj_stack[0], single[0])

    # fixed-shape mode pads every stack to pad_to and reports true counts
    obj_p, nbrs_p, _, _, counts = sampler.test_object(region, pad_to=4)
    assert obj_p.shape == (4, 3, 32, 32, 3)
    assert counts[0] == n_pts
    for s in nbrs_p:
        assert s.shape == (4, 3, 32, 32, 3)
    np.testing.assert_allclose(obj_p[:n_pts], obj_stack)


def test_triplet_loss_values():
    a = jnp.array([[0.0, 0.0]])
    p = jnp.array([[0.0, 0.0]])   # d_ap = 0
    n = jnp.array([[2.0, 0.0]])   # d_an = 4
    # l1 = relu(0-4+1)=0, l2 = relu(0-4+1)=0, l3 = 0.1*relu(0-0)=0
    assert float(triplet_loss(a, p, n, margin=1.0)) == 0.0
    # degenerate: negative == positive -> margin violated
    loss = float(triplet_loss(a, p, p, margin=1.0))
    assert loss == 2.0  # l1 = l2 = relu(0-0+1) = 1 each


def test_compute_mean_std():
    p0 = np.full((4, 2, 2, 3), 0.5, np.float32)
    p1 = np.full((4, 4, 4, 3), 0.25, np.float32)
    mean, std = compute_mean_std([p0, p1])
    expected = (0.5 * 16 + 0.25 * 64) / 80
    np.testing.assert_allclose(mean, [expected] * 3, rtol=1e-5)


def test_legacy_harness_mlp(tmp_path):
    from deepmerge_tpu.train.legacy_harness import synthetic_digits, train_mlp

    x, y = synthetic_digits(n=512, seed=0)
    h5 = str(tmp_path / "features.h5")
    params, acc = train_mlp(x, y, epochs=3, batch_size=64, feature_h5=h5,
                            log_fn=lambda *_: None)
    assert acc > 0.5  # separable synthetic digits learn fast
    from deepmerge_tpu.infer.extract import FeatureStore

    feats = FeatureStore.open(h5)
    assert feats.shape == (512, 250)


def test_legacy_harness_gru():
    from deepmerge_tpu.train.legacy_harness import synthetic_digits, train_gru

    x, y = synthetic_digits(n=256, seed=1)
    params, acc = train_gru(x, y, epochs=2, batch_size=64,
                            log_fn=lambda *_: None)
    assert acc > 0.3


def test_config_overrides_and_json_roundtrip():
    from deepmerge_tpu.config import Config, apply_overrides

    cfg = apply_overrides(
        Config(),
        ["model.variant=v5", "merge.threshold_quantile=0.6",
         "data.patch_sizes=16,32,64", "model.fused_attention=false"],
    )
    assert cfg.merge.threshold_quantile == 0.6          # typed, not a string
    assert cfg.model.fused_attention is False
    assert Config.from_json(cfg.to_json()) == cfg       # JSON roundtrip
    assert apply_overrides(cfg, ["merge.threshold_quantile=none"]
                           ).merge.threshold_quantile is None
    import pytest

    with pytest.raises(ValueError):
        apply_overrides(Config(), ["merge.threshold_quantile=2.0"])
    with pytest.raises(ValueError):
        apply_overrides(Config(), ["model.bogus=1"])
