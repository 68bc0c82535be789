"""Legacy classification harness (reference ``MLP.py:21-304``).

The reference's MNIST-style playground: train the MLP (or the bi-GRU
attention net) on flat digit-like vectors, save penultimate features to a
resizable HDF5 dataset and reload them (``MLP.py`` h5py save/load — here the
shared ``FeatureStore``). Kept for capability parity; the synthetic-digits
default removes the torchvision download dependency.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepmerge_tpu.infer.extract import FeatureStore
from deepmerge_tpu.models.legacy import MLP, GRUAttention


def synthetic_digits(n: int = 2048, side: int = 28, n_classes: int = 10,
                     seed: int = 0):
    """Digit-like (x, y): one bright square per class position + noise."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, n_classes, n)
    x = rng.rand(n, side, side).astype(np.float32) * 0.2
    for i in range(n):
        c = y[i]
        r0, c0 = 2 + (c // 5) * 10, 2 + (c % 5) * 5
        x[i, r0 : r0 + 6, c0 : c0 + 4] += 0.8
    return x, y.astype(np.int32)


def train_mlp(
    x: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    epochs: int = 3,
    batch_size: int = 128,
    lr: float = 1e-3,
    feature_h5: Optional[str] = None,
    seed: int = 0,
    log_fn: Callable = print,
):
    """Train the MLP; optionally dump penultimate features to HDF5.

    Returns (params, final_accuracy).
    """
    if x is None:
        x, y = synthetic_digits(seed=seed)
    x = x.reshape(len(x), -1).astype(np.float32)
    model = MLP(num_classes=int(y.max()) + 1)
    params = model.init(jax.random.key(seed), jnp.zeros((1, x.shape[1])))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, xb)
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    n = len(x)
    for epoch in range(epochs):
        perm = rng.permutation(n)
        total = 0.0
        steps = 0
        for i in range(0, n - batch_size + 1, batch_size):
            take = perm[i : i + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[take]), jnp.asarray(y[take])
            )
            total += float(loss)
            steps += 1
        log_fn(f"mlp epoch {epoch + 1}/{epochs}: loss={total / steps:.4f}")

    logits, feats = model.apply({"params": params}, jnp.asarray(x))
    acc = float((np.asarray(logits).argmax(1) == y).mean())
    log_fn(f"train accuracy: {acc:.3f}")
    if feature_h5:
        store = FeatureStore(feature_h5)
        store.append(np.asarray(feats, np.float32))
        store.close()
    return params, acc


def train_gru(
    x: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    epochs: int = 2,
    batch_size: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    log_fn: Callable = print,
):
    """Train the bi-GRU attention classifier on (B, T, F) rows."""
    if x is None:
        x, y = synthetic_digits(n=1024, seed=seed)
    model = GRUAttention(num_classes=int(y.max()) + 1)
    params = model.init(
        jax.random.key(seed), jnp.zeros((1,) + x.shape[1:])
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, dropout_rng):
        def loss_fn(p):
            # train=True: the reference RNN applies Dropout(0.5) to the
            # attention query during training (Nets.py:48-111)
            logits = model.apply({"params": p}, xb, True,
                                 rngs={"dropout": dropout_rng})
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    drop_key = jax.random.key(seed + 1)
    step_i = 0
    for epoch in range(epochs):
        perm = rng.permutation(len(x))
        total, steps = 0.0, 0
        for i in range(0, len(x) - batch_size + 1, batch_size):
            take = perm[i : i + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[take]), jnp.asarray(y[take]),
                jax.random.fold_in(drop_key, step_i),
            )
            step_i += 1
            total += float(loss)
            steps += 1
        log_fn(f"gru epoch {epoch + 1}/{epochs}: loss={total / steps:.4f}")
    logits = model.apply({"params": params}, jnp.asarray(x))
    acc = float((np.asarray(logits).argmax(1) == y).mean())
    log_fn(f"train accuracy: {acc:.3f}")
    return params, acc
