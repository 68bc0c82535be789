"""Loss semantics + train-step behavior on synthetic pairs."""

import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.config import Config, TrainConfig
from deepmerge_tpu.geodata.synthetic import make_training_pairs
from deepmerge_tpu.models.s2former import build_model
from deepmerge_tpu.train.loop import (
    create_train_state,
    lr_schedule,
    make_train_step,
)
from deepmerge_tpu.train.losses import contrastive_pair_loss
from deepmerge_tpu.train.sampler import PairSampler

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_contrastive_loss_values():
    e1 = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    e2 = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    # pair 0: d2 = 1; pair 1: d2 = 0
    # flags [1, 0]: loss = (1*1 + relu(1-0)) / 2 = 1.0
    flag = jnp.array([1.0, 0.0])
    assert float(contrastive_pair_loss(e1, e2, flag, margin=1.0)) == 1.0
    # flags [0, 1]: loss = (relu(1-1) + 0) / 2 = 0
    flag = jnp.array([0.0, 1.0])
    assert float(contrastive_pair_loss(e1, e2, flag, margin=1.0)) == 0.0


def test_contrastive_loss_matches_torch():
    import torch
    import torch.nn.functional as F

    r = np.random.RandomState(0)
    a = r.randn(16, 10).astype(np.float32)
    b = r.randn(16, 10).astype(np.float32)
    flag = (r.rand(16) > 0.5).astype(np.float32)
    margin = 1.0
    d = ((torch.tensor(a) - torch.tensor(b)) ** 2).sum(1)
    want = (
        torch.tensor(flag) * d
        + (1 - torch.tensor(flag)) * F.relu(-d + margin)
    ).mean()
    got = contrastive_pair_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(flag))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_lr_schedule_multistep():
    cfg = Config(train=TrainConfig(lr=1e-4, lr_milestones=(40, 80), lr_gamma=0.2))
    sched = lr_schedule(cfg, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(399)), 1e-4)
    assert np.isclose(float(sched(400)), 2e-5)
    assert np.isclose(float(sched(800)), 4e-6)


def test_train_step_reduces_loss(tiny_model_cfg, tiny_data_cfg, small_scene):
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0), steps_per_epoch=4)
    step = make_train_step(model, cfg)

    pos, neg = make_training_pairs(small_scene)
    sampler = PairSampler(small_scene, pos, neg, tiny_data_cfg)
    batches = list(sampler.epoch_batches(epoch_seed=0, batch_size=8))
    assert batches, "sampler yielded no batches"

    rng = jax.random.key(42)
    first_losses, last_losses = [], []
    for it in range(8):
        batch = batches[it % len(batches)]
        state, metrics = step(state, batch, rng)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        (first_losses if it < 2 else last_losses).append(loss)
    assert np.mean(last_losses) < np.mean(first_losses) * 1.5  # not diverging
    assert int(state.step) == 8


def test_epoch_resampling_changes_points(small_scene, tiny_data_cfg):
    pos, neg = make_training_pairs(small_scene)
    sampler = PairSampler(small_scene, pos, neg, tiny_data_cfg)
    b0 = next(iter(sampler.epoch_batches(epoch_seed=0, batch_size=8)))
    b1 = next(iter(sampler.epoch_batches(epoch_seed=1, batch_size=8)))
    # different epoch seeds draw different sample points / order
    assert not np.array_equal(
        np.asarray(b0["left_designed"]), np.asarray(b1["left_designed"])
    )
    # same seed is reproducible
    b0b = next(iter(sampler.epoch_batches(epoch_seed=0, batch_size=8)))
    np.testing.assert_array_equal(
        np.asarray(b0["left_designed"]), np.asarray(b0b["left_designed"])
    )


def test_training_learns_pair_separation(tiny_model_cfg, tiny_data_cfg):
    """After a short training run, positive pairs must be measurably closer
    than negative pairs (the learned merge criterion actually learns)."""
    scene = __import__(
        "deepmerge_tpu.geodata.synthetic", fromlist=["generate_scene"]
    ).generate_scene(h=160, w=160, n_regions=36, n_objects=4, seed=21,
                     noise=4.0)
    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    state = create_train_state(model, cfg, jax.random.key(0), steps_per_epoch=4)
    step = make_train_step(model, cfg)
    pos, neg = make_training_pairs(scene)
    sampler = PairSampler(scene, pos, neg, tiny_data_cfg)
    rng = jax.random.key(3)

    def separation(params):
        from deepmerge_tpu.infer.extract import FeatureExtractor
        from deepmerge_tpu.infer.scoring import score_scene_edges

        emb = FeatureExtractor(model, params, batch_size=32).extract_scene(
            scene, tiny_data_cfg
        )
        simi = score_scene_edges(scene, emb)
        obj = scene.object_of_region
        e = scene.rag.edges
        same = obj[e[:, 0]] == obj[e[:, 1]]
        # AUC-like: P(neg distance > pos distance)
        d_pos, d_neg = simi[same], simi[~same]
        return float((d_neg[None, :] > d_pos[:, None]).mean())

    auc_before = separation(state.params)
    for epoch in range(6):
        for batch in sampler.epoch_batches(epoch, batch_size=16):
            state, _ = step(state, batch, rng)
    auc_after = separation(state.params)
    assert auc_after > max(auc_before, 0.65), (auc_before, auc_after)


def test_multi_scene_training(tiny_model_cfg, tiny_data_cfg):
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.train.driver import train

    scenes = [
        generate_scene(h=128, w=128, n_regions=16, n_objects=4, seed=s)
        for s in (1, 2)
    ]
    import dataclasses

    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, num_epochs=1, checkpoint_every=100,
        checkpoint_dir="/tmp/ms_ckpt", log_dir="/tmp/ms_logs"))
    state, history = train(cfg, scene=scenes, max_steps_per_epoch=2,
                           log_fn=lambda *_: None)
    assert len(history.train_losses) == 1
    assert np.isfinite(history.train_losses[0])


def test_fused_train_step_matches_standard(tiny_model_cfg, tiny_data_cfg,
                                           small_scene):
    """The data-fused train step computes the same loss/updates as the
    standard step on the same pair draw."""
    from deepmerge_tpu.train.loop import make_fused_train_step
    from deepmerge_tpu.train.sampler import FusedPairSampler

    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    pos, neg = make_training_pairs(small_scene)

    std_sampler = PairSampler(small_scene, pos, neg, tiny_data_cfg)
    fused_sampler = FusedPairSampler(small_scene, pos, neg, tiny_data_cfg)

    state_a = create_train_state(model, cfg, jax.random.key(0))
    state_b = create_train_state(model, cfg, jax.random.key(0))
    step_a = make_train_step(model, cfg)
    step_b = make_fused_train_step(model, cfg, fused_sampler.device_scene)

    rng = jax.random.key(9)
    ba = next(iter(std_sampler.epoch_batches(3, 8)))
    bb = next(iter(fused_sampler.epoch_batches(3, 8)))
    state_a, ma = step_a(state_a, ba, rng)
    state_b, mb = step_b(state_b, bb, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)


def test_scanned_epoch_matches_stepwise(tiny_model_cfg, tiny_data_cfg,
                                        small_scene):
    """One-dispatch scanned epoch == the same steps run one by one."""
    from deepmerge_tpu.train.loop import make_fused_train_step, make_scanned_epoch
    from deepmerge_tpu.train.sampler import FusedPairSampler

    cfg = Config(model=tiny_model_cfg, data=tiny_data_cfg)
    model = build_model(tiny_model_cfg)
    pos, neg = make_training_pairs(small_scene)
    sampler = FusedPairSampler(small_scene, pos, neg, tiny_data_cfg)
    rng = jax.random.key(11)

    state_a = create_train_state(model, cfg, jax.random.key(0))
    step = make_fused_train_step(model, cfg, sampler.device_scene)
    losses_a = []
    for batch in sampler.epoch_batches(5, 8):
        state_a, m = step(state_a, batch, rng)
        losses_a.append(float(m["loss"]))

    state_b = create_train_state(model, cfg, jax.random.key(0))
    epoch_fn = make_scanned_epoch(model, cfg, sampler.device_scene)
    arrays = sampler.epoch_arrays(5, 8)
    state_b, losses_b = epoch_fn(state_b, *arrays, rng)

    np.testing.assert_allclose(np.asarray(losses_b), losses_a, rtol=1e-4,
                               atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)
