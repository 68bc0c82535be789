"""Training loop: jitted Siamese train step + epoch driver.

TPU-native redesign of ``Train_SMT.py:143-394``:
  * The Siamese forward is ONE batched forward over the stacked
    [left; right] pairs (2B on the batch axis feeding the MXU), split
    afterwards — not two sequential branch calls.
  * Adam(1e-4) + piecewise-constant decay ×0.2 at epochs [40, 80]
    (``Train_SMT.py:192-194``) via optax.
  * Per-epoch pair resampling (the reference rebuilds its dataset every epoch
    with fresh random point draws, ``Train_SMT.py:217-221``) is a fresh PRNG
    key fed to the sampler — no dataset rebuild.
  * Data parallelism is GSPMD: batches arrive sharded over the mesh's data
    axis and XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from deepmerge_tpu.config import Config
from deepmerge_tpu.models.s2former import S2Former
from deepmerge_tpu.train.losses import contrastive_pair_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """MultiStepLR(milestones=[40, 80], gamma=0.2) equivalent."""
    t = cfg.train
    boundaries = {m * steps_per_epoch: t.lr_gamma for m in t.lr_milestones}
    return optax.piecewise_constant_schedule(t.lr, boundaries)


def create_train_state(
    model: S2Former, cfg: Config, rng, steps_per_epoch: int = 1
) -> TrainState:
    from deepmerge_tpu.models.s2former import init_params

    variables = init_params(model, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = optax.adam(lr_schedule(cfg, steps_per_epoch))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
        apply_fn=model.apply,
    )




def _training_model(model: S2Former, use_fused: bool = True) -> S2Former:
    """Adjust the model config for TRAINING.

    With ``use_fused`` (``cfg.train.fused_block``) the blocks run as the
    Pallas megakernel with the round-4 SAVED-ACTIVATION VJP — the forward
    kernel additionally emits qkv/probs/pre-GELU/residual and the backward
    consumes them with zero forward recompute
    (``ops/pallas/fused_block._fused_block_bwd``). Measured on chip it
    LOSES to XLA autodiff at the reference batch (208.2 vs 162.8 ms/step
    at batch 120, BENCH.md round 4 — the residual-emitting forward and the
    hand-scheduled backward cost more than the skipped recompute returns),
    so the default is the XLA block path and the kernel VJP stays as a
    grad-parity-tested experiment (``BENCH_TRAIN_FUSED=1``). Stage-CHAINED
    kernels carry a recompute VJP, so chaining is disabled for training
    either way; quantize is inference-only (non-differentiable) and always
    cleared.
    """
    import dataclasses

    from deepmerge_tpu.models.s2former import build_model

    cfg = model.cfg
    want = dataclasses.replace(
        cfg, fused_block=cfg.fused_block and use_fused, quantize="",
        fused_stage_chain=False, chain_stage0=False,
    )
    return model if want == cfg else build_model(want)


def _siamese_forward_loss(model, params, batch_stats, patches, designed,
                          flag, dropout_rng, margin, aux_weights):
    """Shared Siamese train forward + contrastive (+aux) loss.

    ``patches``/``designed`` carry the stacked [left; right] batch (2B on
    the batch axis feeding the MXU); the three train-step builders below
    differ only in how they MATERIALIZE the patches (host batch vs in-step
    extraction), so the loss body lives once here.
    """
    has_aux_heads = model.cfg.variant in ("v4", "v5")
    variables = {"params": params}
    mutable = False
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
    out = model.apply(
        variables, patches, designed, True,
        rngs={"dropout": dropout_rng}, mutable=mutable,
    )
    new_state = {}
    if mutable:
        out, new_state = out
    if has_aux_heads:
        emb, aux0, aux1 = out
    else:
        emb, aux0, aux1 = out, None, None
    el, er = jnp.split(emb, 2, axis=0)
    loss = contrastive_pair_loss(el, er, flag, margin)
    for aux, w in ((aux0, aux_weights[0]), (aux1, aux_weights[1])):
        if aux is not None and w > 0.0:
            al, ar = jnp.split(aux, 2, axis=0)
            loss += w * contrastive_pair_loss(al, ar, flag, margin)
    return loss, new_state.get("batch_stats", batch_stats)


def make_train_step(
    model: S2Former,
    cfg: Config,
    aux_weights: "tuple[float, float] | None" = None,
):
    """Build the jitted Siamese train step.

    Batch pytree:
      left_patches / right_patches: tuple of (B, s, s, C) per input scale
      left_designed / right_designed: (B, 19)
      flag: (B,) float — 1 same-object, 0 different (``MyUtils1.py:35-36``)

    ``aux_weights`` enables v4/v5 deep supervision (the reference keeps the
    weighted aux sum commented out at ``Train_SMT.py:285-288`` with weights
    0.1/0.2; default None reads ``cfg.train.aux_weights``, itself off by
    default to match what the reference actually runs).
    """
    if aux_weights is None:
        aux_weights = tuple(cfg.train.aux_weights)
    model = _training_model(model, cfg.train.fused_block)
    margin = cfg.train.margin

    def loss_fn(params, batch_stats, batch, dropout_rng):
        stacked = tuple(
            jnp.concatenate([l, r], axis=0)
            for l, r in zip(batch["left_patches"], batch["right_patches"])
        )
        designed = jnp.concatenate(
            [batch["left_designed"], batch["right_designed"]], axis=0
        )
        return _siamese_forward_loss(
            model, params, batch_stats, stacked, designed, batch["flag"],
            dropout_rng, margin, aux_weights,
        )

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, dropout_rng
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, {"loss": loss}

    return train_step


def make_eval_step(model: S2Former):
    """Jitted single-branch embedding forward (inference path)."""

    @jax.jit
    def eval_step(params, batch_stats, patches, designed):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, patches, designed, False)

    return eval_step


def train_epoch(
    state: TrainState,
    train_step,
    batches,
    rng,
    log_every: int = 0,
    log_fn=print,
) -> tuple[TrainState, float]:
    """Run one epoch over an iterable of batches; returns mean loss.

    Losses stay on device until the epoch ends (a per-step host sync would
    stall the dispatch pipeline).
    """
    losses = []
    t0 = time.time()
    for i, batch in enumerate(batches):
        state, metrics = train_step(state, batch, rng)
        losses.append(metrics["loss"])
        if log_every and (i + 1) % log_every == 0:
            log_fn(
                f"  step {i + 1}: loss={float(metrics['loss']):.5f} "
                f"({(time.time() - t0) / (i + 1):.3f}s/step)"
            )
    if not losses:
        return state, 0.0
    import numpy as np

    return state, float(np.mean([np.asarray(l) for l in losses]))


def _make_extracting_loss_fn(model, cfg, device_scene, aux_weights):
    """Loss fn whose patches are extracted IN-STEP from the HBM-resident
    scene (shared by the fused step and the scanned epoch — model must
    already be ``_training_model``-adjusted)."""
    from deepmerge_tpu.ops.patches import extract_multiscale_patches

    margin = cfg.train.margin
    patch_sizes = tuple(cfg.data.patch_sizes)
    caps = device_scene.caps
    quantize = cfg.data.quantize_uint8
    channels = device_scene.channels
    out_dtype = jnp.dtype(model.cfg.dtype)

    def loss_fn(params, batch_stats, padded, centers, scales, designed, flag,
                dropout_rng):
        patches = extract_multiscale_patches(
            padded, centers, scales, patch_sizes=patch_sizes, caps=caps,
            quantize_uint8=quantize, out_channels=channels,
            out_dtype=out_dtype,
        )
        return _siamese_forward_loss(
            model, params, batch_stats, patches, designed, flag,
            dropout_rng, margin, aux_weights,
        )

    return loss_fn


def make_fused_train_step(model: S2Former, cfg: Config, device_scene,
                          aux_weights: "tuple[float, float] | None" = None):
    """Siamese train step with the patch pipeline fused INTO the jitted step.

    The batch is just per-pair point metadata (centers/scales/factors/
    features for the stacked [left; right] points) — window gather, crop +
    INTER_AREA resize, the forward, loss and the optimizer update are ONE
    program. On dispatch-heavy platforms this removes the per-step data
    round-trips that otherwise dominate the epoch (measured ~6x).
    """
    if aux_weights is None:
        aux_weights = tuple(cfg.train.aux_weights)
    model = _training_model(model, cfg.train.fused_block)
    loss_fn = _make_extracting_loss_fn(model, cfg, device_scene, aux_weights)

    @jax.jit
    def step(state: TrainState, padded, centers, scales, designed, flag, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, padded, centers, scales,
            designed, flag, dropout_rng,
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, {"loss": loss}

    def train_step(state, batch, rng):
        return step(
            state, device_scene.padded, batch["centers"], batch["scales"],
            batch["designed"], batch["flag"], rng,
        )

    return train_step


def make_scanned_epoch(model: S2Former, cfg: Config, device_scene,
                       aux_weights: "tuple[float, float] | None" = None):
    """Run an ENTIRE epoch as one jitted program (lax.scan over steps).

    The per-step inputs are tiny (point metadata, ~KBs/step), so a whole
    epoch's batches ship in one upload and the optimizer loop never returns
    to the host — on dispatch-heavy platforms this removes the last
    per-step overheads. Returns ``epoch_fn(state, arrays, rng) ->
    (state, losses)`` with ``arrays`` from
    ``FusedPairSampler.epoch_arrays``.
    """
    if aux_weights is None:
        aux_weights = tuple(cfg.train.aux_weights)
    model = _training_model(model, cfg.train.fused_block)
    loss_fn = _make_extracting_loss_fn(model, cfg, device_scene, aux_weights)

    # donate the carried state: params + Adam moments (~600 MB flagship)
    # alias input→output instead of allocating a fresh copy per epoch.
    # Every caller reassigns ``state = epoch_fn(state, ...)`` so the old
    # buffers are never read again.
    @partial(jax.jit, donate_argnums=(0,))
    def _epoch(state: TrainState, padded, centers, scales, designed, flags,
               rng):
        def body(state, xs):
            c, s, d, f = xs
            dropout_rng = jax.random.fold_in(rng, state.step)
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, padded, c, s, d, f,
                dropout_rng,
            )
            state = state.apply_gradients(grads)
            state = state.replace(batch_stats=new_bs)
            return state, loss

        return jax.lax.scan(body, state, (centers, scales, designed, flags))

    def epoch_fn(state: TrainState, centers, scales, designed, flags, rng):
        # the scene tile rides as a jit ARGUMENT (remote compile rejects
        # HLO >~100MB, so it must never bake in as a program constant)
        return _epoch(state, device_scene.padded, centers, scales, designed,
                      flags, rng)

    return epoch_fn
