"""Import reference torch checkpoints (`.pth`) into this framework.

The reference ecosystem's artifacts are torch ``state_dict`` checkpoints
saved as ``{"net": state_dict, "epoch": ..., ...}`` (``Train_SMT.py:317-343``,
loaded at ``ExtractFeatures.py:35-36``). This module maps those tensors onto
our flax parameter tree so a reference-trained S2Former keeps working on TPU.

Layout translation (torch module path -> flax path, with per-layer-type
array transforms):

  * ``nn.Linear``     weight (out, in)        -> ``kernel`` (in, out)
  * ``nn.LayerNorm``  weight/bias             -> ``scale``/``bias``
  * patch-embed ``nn.Conv2d(k=p, s=p)``       -> dense kernel
    (kh, kw, in, out) flattened to (p*p*in, out) — our PatchEmbed is
    reshape+matmul with (row, col, channel) pixel order
  * ``nn.Conv1d(k=1)`` (FeatureEmbed)         -> dense kernel (in, out)
  * aux-head ``nn.Conv2d``                    -> flax HWIO kernel
  * ``nn.BatchNorm2d`` weight/bias            -> ``scale``/``bias``;
    running_mean/var -> ``batch_stats`` ``mean``/``var``
  * buffers (``relative_position_index``, ``num_batches_tracked``) skipped
  * v5 aux ``norm`` params skipped — the reference creates them but its
    ``AuxBolck_v5.forward`` never applies them (``nets/ShfitScaleFormer.py:415``)

Variant name schemes handled (``nets/ShfitScaleFormer.py``):
  v1  ``patch_embed_scale{i}``, single ``blocks``        (:417-607)
  v2  ``patch_embed_blocks.{i}``, single ``blocks``      (:610-769)
  v3+ ``patch_embed_blocks.{i}``, ``blocks0/1/2``        (:772-1503)
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

# torch keys that are buffers / dead params with no flax home
_SKIP = (
    re.compile(r"\.relative_position_index$"),
    re.compile(r"\.num_batches_tracked$"),
)


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _linear(w_or_b: np.ndarray, leaf: str) -> tuple[str, np.ndarray]:
    if leaf == "weight":
        return "kernel", w_or_b.T
    return "bias", w_or_b


def _layernorm(v: np.ndarray, leaf: str) -> tuple[str, np.ndarray]:
    return ("scale" if leaf == "weight" else "bias"), v


def _patch_conv(v: np.ndarray, leaf: str) -> tuple[str, np.ndarray]:
    if leaf == "weight":  # (out, in, p, p) -> (p*p*in, out)
        out_c = v.shape[0]
        return "kernel", v.transpose(2, 3, 1, 0).reshape(-1, out_c)
    return "bias", v


def _conv1d(v: np.ndarray, leaf: str) -> tuple[str, np.ndarray]:
    if leaf == "weight":  # (out, in, 1) -> (in, out)
        return "kernel", v[:, :, 0].T
    return "bias", v


def _conv2d(v: np.ndarray, leaf: str) -> tuple[str, np.ndarray]:
    if leaf == "weight":  # (out, in, kh, kw) -> (kh, kw, in, out)
        return "kernel", v.transpose(2, 3, 1, 0)
    return "bias", v


_BLOCK_LINEARS = ("attn.qkv", "attn.proj")
_TOP_LINEARS = (
    "final_features",
    "final_features_with_design",
    "last_block_features",
    "head",
)


def _map_key(key: str, value: np.ndarray):
    """One torch state_dict entry -> (flax_path_tuple, array, collection).

    collection is "params" or "batch_stats". Returns None for skipped keys.
    Raises KeyError for keys it does not understand.
    """
    for pat in _SKIP:
        if pat.search(key):
            return None

    parts = key.split(".")
    leaf = parts[-1]

    # ---- patch embeds ------------------------------------------------------
    m = re.match(r"patch_embed_blocks\.(\d+)\.proj\.(weight|bias)$", key)
    if not m:
        m = re.match(r"patch_embed_scale(\d+)\.proj\.(weight|bias)$", key)
    if m:
        name, arr = _patch_conv(value, m.group(2))
        return ("patch_embed" + m.group(1), "proj", name), arr, "params"

    # ---- designed-feature embed -------------------------------------------
    m = re.match(r"feature_embed\.proj([012])\.(weight|bias)$", key)
    if m:
        name, arr = _conv1d(value, m.group(2))
        return ("feature_embed", "proj" + m.group(1), name), arr, "params"

    # ---- transformer blocks -------------------------------------------------
    m = re.match(r"blocks([012]?)\.(\d+)\.(.+)$", key)
    if m:
        stage = m.group(1) or "0"  # v1/v2 single `blocks` -> blocks0
        block = f"blocks{stage}_{m.group(2)}"
        rest = m.group(3)
        if rest in ("norm1.weight", "norm1.bias", "norm2.weight", "norm2.bias"):
            norm, leaf = rest.split(".")
            name, arr = _layernorm(value, leaf)
            return (block, norm, name), arr, "params"
        if rest == "attn.relative_position_bias_table":
            return (block, "attn", "rel_pos_bias_table"), value, "params"
        for lin in _BLOCK_LINEARS:
            if rest.startswith(lin + "."):
                name, arr = _linear(value, rest.rsplit(".", 1)[1])
                outer, inner = lin.split(".")
                return (block, outer, inner, name), arr, "params"
        m2 = re.match(r"mlp\.fc([12])\.(weight|bias)$", rest)
        if m2:
            dense = f"Dense_{int(m2.group(1)) - 1}"
            name, arr = _linear(value, m2.group(2))
            return (block, "mlp", dense, name), arr, "params"
        raise KeyError(key)

    # ---- shared norm / heads ------------------------------------------------
    if key in ("norm.weight", "norm.bias"):
        name, arr = _layernorm(value, leaf)
        return ("norm", name), arr, "params"
    for lin in _TOP_LINEARS:
        if key in (lin + ".weight", lin + ".bias"):
            name, arr = _linear(value, leaf)
            return (lin, name), arr, "params"

    # ---- aux heads (v4/v5) ---------------------------------------------------
    m = re.match(r"aux([01])\.(.+)$", key)
    if m:
        aux = "aux" + m.group(1)
        rest = m.group(2)
        if rest.startswith("aux.0."):  # Conv2d(k=2, bias=False)
            name, arr = _conv2d(value, leaf)
            return (aux, "conv1", name), arr, "params"
        if rest.startswith("aux.1."):  # BatchNorm2d
            if leaf in ("weight", "bias"):
                return (aux, "bn", "scale" if leaf == "weight" else "bias"), value, "params"
            if leaf == "running_mean":
                return (aux, "bn", "mean"), value, "batch_stats"
            if leaf == "running_var":
                return (aux, "bn", "var"), value, "batch_stats"
        if rest.startswith("aux.4."):  # Conv2d(k=1)
            name, arr = _conv2d(value, leaf)
            return (aux, "conv2", name), arr, "params"
        if rest.startswith("norm."):  # v4 AuxBolck applies its norm
            name, arr = _layernorm(value, leaf)
            return (aux, "norm", name), arr, "params"
        if rest.startswith("out_features."):
            name, arr = _linear(value, leaf)
            return (aux, "out", name), arr, "params"
        raise KeyError(key)

    raise KeyError(key)


def _set(tree: dict, path: tuple[str, ...], arr: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = arr


def _flatten(tree: Mapping, prefix=()) -> dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _prune_empty(tree: dict) -> None:
    """Remove empty sub-dicts at any depth (in place, bottom-up)."""
    for k in list(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            _prune_empty(v)
            if not v:
                del tree[k]


def torch_state_dict_to_flax(
    state_dict: Mapping[str, Any],
    template: Mapping[str, Any],
) -> dict:
    """Map a reference ``state_dict`` onto our variable collections.

    ``template`` is the ``model.init(...)`` variables dict (used for shape
    validation and to catch unfilled leaves). Returns a plain-dict variables
    pytree ``{"params": ..., ("batch_stats": ...)}``.
    """
    out: dict = {"params": {}}
    if "batch_stats" in template and template["batch_stats"]:
        out["batch_stats"] = {}

    unmapped = []
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        try:
            mapped = _map_key(key, arr)
        except KeyError:
            unmapped.append(key)
            continue
        if mapped is None:
            continue
        path, arr, collection = mapped
        _set(out.setdefault(collection, {}), path, arr.astype(np.float32))
    if unmapped:
        raise KeyError(
            f"{len(unmapped)} torch keys have no flax mapping: "
            f"{unmapped[:8]}{'...' if len(unmapped) > 8 else ''}"
        )

    # validate against the template: every leaf present, every shape equal.
    # The reference constructs some heads it never calls for a given config
    # (e.g. `final_features` + `head` when designed features are on,
    # nets/ShfitScaleFormer.py:866-871) — flax materializes no params for
    # uncalled modules, so those torch leaves are dead weight to drop.
    _DEAD_OK = {"final_features", "final_features_with_design", "head"}

    def _dead(p):
        # v5's AuxBolck_v5 creates a norm it never applies
        # (nets/ShfitScaleFormer.py:415) — flax has no home for it there;
        # v4's AuxBolck DOES apply it and maps normally.
        return p[0] in _DEAD_OK or p[:2] in (("aux0", "norm"), ("aux1", "norm"))

    for coll in out:
        want = _flatten(template.get(coll, {}))
        got = _flatten(out[coll])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        bad_extra = [p for p in extra if not _dead(p)]
        if missing or bad_extra:
            raise ValueError(
                f"{coll}: missing leaves {missing[:6]}, extra {bad_extra[:6]}"
            )
        for p in extra:
            node = out[coll]
            for k in p[:-1]:
                node = node[k]
            del node[p[-1]]
        _prune_empty(out[coll])  # drop now-empty dicts at ANY depth (e.g.
        # v5's aux0/norm — the reference creates-but-never-applies that
        # norm, so the flax template has no such subtree; a leftover {}
        # breaks pytree-structure equality with init_params)
        got = {k: v for k, v in got.items() if k not in set(extra)}
        for path, arr in got.items():
            wshape = np.shape(want[path])
            if tuple(arr.shape) != tuple(wshape):
                raise ValueError(
                    f"{coll} {'/'.join(path)}: torch {arr.shape} != "
                    f"flax {wshape}"
                )
    return out


def load_torch_checkpoint(path: str, cfg) -> dict:
    """Load a reference ``.pth`` (either the ``{"net": state_dict, ...}``
    training dict or a bare state_dict) into flax variables for ``cfg.model``."""
    import torch

    import jax

    from deepmerge_tpu.models.s2former import build_model, init_params

    if cfg.model.variant == "vit":
        raise ValueError(
            "variant='vit' checkpoints interop via compat.vit_import "
            "(timm-style partial load) — the S2Former .pth mapper does "
            "not cover the ScaleEmbedTransformer layout"
        )
    raw = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = raw.get("net", raw) if isinstance(raw, dict) else raw
    if hasattr(state_dict, "state_dict"):  # a full nn.Module was pickled
        state_dict = state_dict.state_dict()

    model = build_model(cfg.model)
    template = jax.device_get(init_params(model, jax.random.key(0)))
    return torch_state_dict_to_flax(state_dict, template)


def save_flax_variables(variables: Mapping, path: str) -> None:
    """Serialize mapped variables to msgpack (flax.serialization)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_plain(variables)))


def load_flax_variables(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _plain(tree):
    if isinstance(tree, Mapping):
        return {k: _plain(v) for k, v in tree.items()}
    return np.asarray(tree)
