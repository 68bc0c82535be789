"""Top-level training driver (reference ``Train_SMT.train``/``main``,
``Train_SMT.py:143-394``) wired TPU-first: device-resident scene, fresh
per-epoch sampling keys instead of dataset rebuilds, GSPMD data parallelism,
orbax checkpoints at the reference cadence, loss-history logging.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from deepmerge_tpu.config import Config
from deepmerge_tpu.geodata.synthetic import generate_scene, make_training_pairs
from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.models.s2former import build_model
from deepmerge_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from deepmerge_tpu.train.callbacks import LossHistory
from deepmerge_tpu.train.checkpoint import CheckpointManager, should_checkpoint
from deepmerge_tpu.train.loop import create_train_state, make_train_step, train_epoch
from deepmerge_tpu.train.sampler import PairSampler


def train(
    cfg: Config,
    scene: Optional[Scene | list[Scene]] = None,
    pos_pairs: Optional[np.ndarray] = None,
    neg_pairs: Optional[np.ndarray] = None,
    use_mesh: bool = False,
    max_steps_per_epoch: Optional[int] = None,
    log_fn=print,
):
    """Train the configured model; returns (state, history).

    ``scene`` may be a list of Scenes (the reference trains over many tiles,
    ``MyUtils1.py:236-295``) — pairs are then sampled per scene and batches
    interleaved.
    """
    if scene is None:
        scene = generate_scene(seed=cfg.train.seed)

    model = build_model(cfg.model)
    fused_data = False
    if isinstance(scene, list):
        if pos_pairs is not None or neg_pairs is not None:
            raise ValueError(
                "pos_pairs/neg_pairs are only supported with a single scene; "
                "multi-scene training samples pairs per scene"
            )
        from deepmerge_tpu.train.sampler import MultiScenePairSampler

        subs = []
        for s in scene:
            p, n = make_training_pairs(s)
            subs.append(PairSampler(s, p, n, cfg.data))
        sampler = MultiScenePairSampler(subs)
    else:
        if pos_pairs is None or neg_pairs is None:
            pos_pairs, neg_pairs = make_training_pairs(scene)
        if not use_mesh:
            # single-scene, single-program: fuse the patch pipeline into the
            # train step (epochs were data-dispatch-bound otherwise)
            from deepmerge_tpu.train.sampler import FusedPairSampler

            sampler = FusedPairSampler(scene, pos_pairs, neg_pairs, cfg.data)
            fused_data = True
        else:
            sampler = PairSampler(scene, pos_pairs, neg_pairs, cfg.data)
    steps_per_epoch = max(len(sampler) // cfg.data.batch_size, 1)
    state = create_train_state(
        model, cfg, jax.random.key(cfg.train.seed), steps_per_epoch
    )
    epoch_fn = None
    if fused_data:
        from deepmerge_tpu.train.loop import make_scanned_epoch

        # whole epoch as ONE device program (scan over steps)
        epoch_fn = make_scanned_epoch(model, cfg, sampler.device_scene)
        step_fn = None
    else:
        step_fn = make_train_step(model, cfg)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh(n_model=cfg.mesh.model_parallel)
        state = state.replace(
            params=replicate(state.params, mesh),
            opt_state=replicate(state.opt_state, mesh),
            # v4/v5 carry AuxBlock BatchNorm batch_stats — they must ride
            # the mesh like params or the jitted step sees inputs committed
            # to incompatible device sets
            batch_stats=replicate(state.batch_stats, mesh),
        )

    ckpt = CheckpointManager(cfg.train.checkpoint_dir, cfg)
    start_epoch, elapsed0 = 0, 0.0
    if cfg.train.resume:
        try:
            state, start_epoch, elapsed0 = ckpt.restore(state, for_resume=True)
            log_fn(f"resumed from epoch {start_epoch}")
        except FileNotFoundError:
            log_fn("no checkpoint found; training from scratch")

    history = LossHistory(cfg.train.log_dir, cfg.model.name)
    rng = jax.random.key(cfg.train.seed + 1)
    t_start = time.time() - elapsed0

    # one-epoch-deep pipelining for the scanned path: the loss pull is the
    # only true sync, so deferring it until AFTER the next epoch's arrays
    # are built and its program dispatched overlaps the ~0.3 s host-side
    # epoch_arrays (plus the ~1.2 MB upload) with device compute. The
    # device step itself is 149.8 ms (rep-slope, BENCH.md r5); the sync
    # order below is what turns that into wall-clock. Checkpoint epochs
    # resolve BEFORE the next dispatch — the donated state buffers are
    # consumed by the next program, so a deferred save would race.
    pending = None  # (epoch, device losses) awaiting the sync

    def resolve(ep, losses, ckpt_state=None):
        mean_loss = (float(np.mean(np.asarray(losses)))
                     if losses is not None else 0.0)
        elapsed = time.time() - t_start
        log_fn(
            f"epoch {ep + 1}/{cfg.train.num_epochs}: "
            f"loss={mean_loss:.5f} elapsed={elapsed:.1f}s"
        )
        history.append_loss(mean_loss, mean_loss, elapsed)
        if ckpt_state is not None and should_checkpoint(ep, cfg):
            path = ckpt.save(ckpt_state, ep, elapsed)
            log_fn(f"  checkpoint -> {path}")

    for epoch in range(start_epoch, cfg.train.num_epochs):
        # numpy seeds are 32-bit; fold the (seed, epoch) pair into range
        # (large cfg.train.seed values crashed the sampler otherwise)
        epoch_seed = (cfg.train.seed * 100003 + epoch) % (2**32)
        if epoch_fn is not None:
            arrays = sampler.epoch_arrays(epoch_seed, cfg.data.batch_size)
            if pending is not None and should_checkpoint(pending[0], cfg):
                resolve(*pending, ckpt_state=state)
                pending = None
            if arrays is None:
                losses = None
            else:
                if max_steps_per_epoch is not None:
                    arrays = tuple(a[:max_steps_per_epoch] for a in arrays)
                state, losses = epoch_fn(state, *arrays, rng)
            if pending is not None:
                resolve(*pending)
            pending = (epoch, losses)
            continue
        else:
            batches = sampler.epoch_batches(
                epoch_seed=epoch_seed,
                batch_size=cfg.data.batch_size,
            )
            if max_steps_per_epoch is not None:
                import itertools

                batches = itertools.islice(batches, max_steps_per_epoch)
            if mesh is not None:
                batches = (shard_batch(b, mesh) for b in batches)
            state, mean_loss = train_epoch(state, step_fn, batches, rng)
        elapsed = time.time() - t_start
        log_fn(
            f"epoch {epoch + 1}/{cfg.train.num_epochs}: "
            f"loss={mean_loss:.5f} elapsed={elapsed:.1f}s"
        )
        history.append_loss(mean_loss, mean_loss, elapsed)
        if should_checkpoint(epoch, cfg):
            path = ckpt.save(state, epoch, elapsed)
            log_fn(f"  checkpoint -> {path}")

    if pending is not None:
        resolve(*pending, ckpt_state=state)

    return state, history
