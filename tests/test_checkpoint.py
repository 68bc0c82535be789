"""Checkpoint manager: cadence, save/restore round-trip, guard rails."""

import dataclasses

import jax
import numpy as np
import pytest

from deepmerge_tpu.config import Config, TrainConfig
from deepmerge_tpu.models.s2former import build_model
from deepmerge_tpu.train.checkpoint import CheckpointManager, should_checkpoint
from deepmerge_tpu.train.loop import create_train_state

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_reference_cadence():
    cfg = Config(train=TrainConfig(checkpoint_every=5, checkpoint_tail_from=90,
                                   num_epochs=100))
    # (epoch+1) % 5 == 0 or epoch+1 >= 90  (Train_SMT.py:317)
    saves = [e for e in range(100) if should_checkpoint(e, cfg)]
    assert 4 in saves and 9 in saves
    assert 5 not in saves
    assert all(e in saves for e in range(89, 100))
    assert len(saves) == len(set(saves))


def test_save_restore_roundtrip(tmp_path, tiny_model_cfg):
    cfg = Config(
        model=tiny_model_cfg,
        train=TrainConfig(num_epochs=10, checkpoint_dir=str(tmp_path)),
    )
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path), cfg)
    path = mgr.save(state, epoch=4, elapsed=12.5)
    assert cfg.model.name in path

    state2 = create_train_state(model, cfg, jax.random.key(1))  # different init
    state2, start_epoch, elapsed = mgr.restore(state2)
    assert start_epoch == 5
    assert elapsed == 12.5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_past_final_epoch_raises(tmp_path, tiny_model_cfg):
    """RESUMING at/past num_epochs errors like the reference
    (Train_SMT.py:174-175) — but a plain restore of a completed run's final
    checkpoint (the inference/extract path) must succeed."""
    cfg = Config(
        model=tiny_model_cfg,
        train=TrainConfig(num_epochs=5, checkpoint_dir=str(tmp_path)),
    )
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path), cfg)
    mgr.save(state, epoch=4)
    with pytest.raises(ValueError):
        mgr.restore(state, for_resume=True)
    # inference load of the final checkpoint works
    _, start_epoch, _ = mgr.restore(state)
    assert start_epoch == 5


def test_restore_missing_raises(tmp_path, tiny_model_cfg):
    cfg = Config(model=tiny_model_cfg,
                 train=TrainConfig(checkpoint_dir=str(tmp_path)))
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path), cfg)
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)


def test_aux_training_step(tiny_data_cfg, small_scene):
    """v4 deep-supervision training (aux contrastive terms + batch stats)."""
    from deepmerge_tpu.config import ModelConfig
    from deepmerge_tpu.geodata.synthetic import make_training_pairs
    from deepmerge_tpu.train.loop import make_train_step
    from deepmerge_tpu.train.sampler import PairSampler

    mcfg = ModelConfig(variant="v4", input_image_scales=(16, 32, 64), cube=8,
                       embed_dim=32, depth=(1, 1, 1), num_heads=4, out_dim=8,
                       dtype="float32")
    cfg = Config(model=mcfg, data=tiny_data_cfg)
    model = build_model(mcfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    assert state.batch_stats  # v4 aux heads carry BatchNorm stats
    step = make_train_step(model, cfg, aux_weights=(0.1, 0.2))
    pos, neg = make_training_pairs(small_scene)
    sampler = PairSampler(small_scene, pos, neg, tiny_data_cfg)
    batch = next(iter(sampler.epoch_batches(0, 8)))
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))
