"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.4); scale-out here is
green-field GSPMD: a (data, model) mesh where

  * ``data`` shards every batch axis (pairs, points, edges) — the primary
    axis for this embarrassingly batch-parallel workload; XLA inserts the
    gradient all-reduce over ICI.
  * ``model`` optionally shards attention heads / FFN hidden (tensor
    parallelism) for scaled-up embed dims. qkv/fc1 kernels split on the
    output feature dim, proj/fc2 on the input dim, so each block needs one
    all-reduce — the Megatron layout expressed as NamedSharding.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a batch pytree with its leading axis sharded over 'data'."""

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


# path-regex -> PartitionSpec for tensor parallelism over attention/FFN
_TP_RULES = (
    (re.compile(r".*attn/qkv/kernel$"), P(None, "model")),
    (re.compile(r".*attn/qkv/bias$"), P("model")),
    (re.compile(r".*attn/proj/kernel$"), P("model", None)),
    (re.compile(r".*mlp/Dense_0/kernel$"), P(None, "model")),
    (re.compile(r".*mlp/Dense_0/bias$"), P("model")),
    (re.compile(r".*mlp/Dense_1/kernel$"), P("model", None)),
)


def _spec_for(path: str, ndim: int) -> P:
    for pat, spec in _TP_RULES:
        if pat.match(path):
            if len(spec) <= ndim:
                return spec
    return P()  # replicated


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply TP rules (no-op placement when the model axis has size 1)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))).__str__() for k in kp
        )

    out = []
    for kp, leaf in leaves:
        spec = _spec_for(path_str(kp), np.ndim(leaf))
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
