"""timm-style pretrained ViT checkpoint import (partial load).

The reference loads google-research ViT ``.pth`` weights into its torch
models with ``load_state_dict(strict=False)`` after deleting the head keys
(``vit_model.py:664-707``): head-only when ``has_logits``, plus
``patch_embed``/``pre_logits`` otherwise. This module reproduces that
partial-load contract for the flax ``VisionTransformer`` /
``ScaleEmbedTransformer`` (``models/vit.py``): mapped keys overwrite, keys
with no flax home are reported as skipped (torch's "unexpected"), flax
params the checkpoint doesn't cover keep their init (torch's "missing").
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from deepmerge_tpu.compat.torch_import import (
    _linear,
    _layernorm,
    _patch_conv,
    _to_numpy,
)

# reference del_keys (vit_model.py:696-699)
DEL_KEYS_LOGITS = ("head.weight", "head.bias")
DEL_KEYS_NO_LOGITS = (
    "patch_embed.proj.weight", "patch_embed.proj.bias",
    "pre_logits.fc.weight", "pre_logits.fc.bias",
    "head.weight", "head.bias",
)

_FC = {"fc1": "Dense_0", "fc2": "Dense_1"}


def map_vit_key(key: str, value: Any):
    """torch state_dict key -> (flax path tuple, transformed array) or None."""
    v = _to_numpy(value)
    if key in ("cls_token", "dist_token", "label_token") or re.match(
        r"^pos_embed\d?$", key
    ):
        return (key,), v
    m = re.match(r"^(patch_embed\d?)\.proj\.(weight|bias)$", key)
    if m:
        leaf, arr = _patch_conv(v, m.group(2))
        return (m.group(1), "proj", leaf), arr
    m = re.match(r"^blocks\.(\d+)\.(norm[12])\.(weight|bias)$", key)
    if m:
        leaf, arr = _layernorm(v, m.group(3))
        return (f"block{m.group(1)}", m.group(2), leaf), arr
    m = re.match(r"^blocks\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)$", key)
    if m:
        leaf, arr = _linear(v, m.group(3))
        return (f"block{m.group(1)}", "attn", m.group(2), leaf), arr
    m = re.match(r"^blocks\.(\d+)\.mlp\.(fc[12])\.(weight|bias)$", key)
    if m:
        leaf, arr = _linear(v, m.group(3))
        return (f"block{m.group(1)}", "mlp", _FC[m.group(2)], leaf), arr
    m = re.match(r"^norm\.(weight|bias)$", key)
    if m:
        leaf, arr = _layernorm(v, m.group(1))
        return ("norm", leaf), arr
    m = re.match(r"^pre_logits\.fc\.(weight|bias)$", key)
    if m:
        leaf, arr = _linear(v, m.group(1))
        return ("pre_logits", leaf), arr
    m = re.match(r"^(head|my_head|class_fc[12]|class_logits)\.(weight|bias)$",
                 key)
    if m:
        leaf, arr = _linear(v, m.group(2))
        return (m.group(1), leaf), arr
    m = re.match(r"^feature_embed\.(proj[012])\.(weight|bias)$", key)
    if m:
        # Conv1d(k=1) weight (out, in, 1) -> dense kernel (in, out)
        if m.group(2) == "weight":
            return (("feature_embed", m.group(1), "kernel"), v[..., 0].T)
        return ("feature_embed", m.group(1), "bias"), v
    return None


def load_torch_vit(
    params: Mapping,
    state_dict: Mapping[str, Any],
    has_logits: bool = True,
    drop_head: bool = True,
):
    """Partial-load a torch ViT state_dict into flax ViT params.

    Returns (new_params, report) where report lists ``loaded``, ``missing``
    (flax leaves the checkpoint didn't cover — keep their init) and
    ``skipped`` (checkpoint keys with no flax home or mismatched shape),
    mirroring torch's strict=False IncompatibleKeys printout the reference
    relies on (``vit_model.py:701``).
    """
    del_keys = (
        (DEL_KEYS_LOGITS if has_logits else DEL_KEYS_NO_LOGITS)
        if drop_head else ()
    )
    flat = {}
    skipped = []
    for k, v in state_dict.items():
        if k in del_keys:
            continue
        mapped = map_vit_key(k, v)
        if mapped is None:
            skipped.append(k)
            continue
        flat[mapped[0]] = mapped[1]

    def copy_tree(tree):
        return {
            name: copy_tree(sub) if isinstance(sub, Mapping) else sub
            for name, sub in tree.items()
        }

    new = copy_tree(params)
    loaded, missing = [], []

    def assign(tree, prefix):
        for name in list(tree.keys()):
            path = prefix + (name,)
            sub = tree[name]
            if isinstance(sub, dict):
                assign(sub, path)
            else:
                if path in flat:
                    arr = flat.pop(path)
                    if tuple(arr.shape) != tuple(np.shape(sub)):
                        skipped.append(
                            ".".join(path)
                            + f" (shape {arr.shape} != {np.shape(sub)})"
                        )
                    else:
                        tree[name] = arr.astype(np.asarray(sub).dtype)
                        loaded.append(".".join(path))
                else:
                    missing.append(".".join(path))

    assign(new, ())
    skipped.extend(".".join(p) for p in flat)  # mapped but no flax home
    return new, {"loaded": loaded, "missing": missing, "skipped": skipped}
