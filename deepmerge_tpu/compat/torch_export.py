"""Export flax variables as a reference-loadable torch ``.pth`` checkpoint.

Inverse of ``compat/torch_import.py``: a TPU-trained S2Former becomes a
``{"net": state_dict, "epoch", "scales", "depth", "name"}`` dict that the
reference consumes directly (``Train_SMT.py:163-175`` resume layout,
``ExtractFeatures.py:35-36`` inference load via ``checkpoint["net"]`` +
strict ``load_state_dict``) — so the reference can independently verify
TPU training.

Strict loading needs every torch key, including ones that have no flax
params because the reference constructs-but-never-calls them for the
shipped config (``final_features`` + ``head`` when designed features are
on, ``nets/ShfitScaleFormer.py:859-863``; the v5 aux ``norm`` created but
never applied, ``:415``) and registered buffers
(``relative_position_index``, recomputed here from the cube geometry
exactly as ``initial_relative_position_index``, ``:139-156,218-267``;
``num_batches_tracked`` zeros). Dead weights export as zeros — the
reference forward never reads them in the matching config.

The ``optimizer`` slot is ``None``: torch Adam state is not reconstructed
(inference + embedding verification are the supported surfaces, not a
reference-side training resume).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from deepmerge_tpu.models.s2former import (
    rel_pos_index,
    rel_pos_index_extra_token,
)


def _t(node, leaf="kernel"):
    return np.asarray(node[leaf], np.float32)


def _linear(sd, tkey, node):
    sd[tkey + ".weight"] = _t(node).T
    sd[tkey + ".bias"] = _t(node, "bias")


def _ln(sd, tkey, node):
    sd[tkey + ".weight"] = _t(node, "scale")
    sd[tkey + ".bias"] = _t(node, "bias")


def _zeros_linear(sd, tkey, out_dim, in_dim):
    sd[tkey + ".weight"] = np.zeros((out_dim, in_dim), np.float32)
    sd[tkey + ".bias"] = np.zeros((out_dim,), np.float32)


def _feature_embed(sd: dict, params) -> None:
    """Conv1d(19->D)x3 designed-feature embed (shared by v1-v5 and v6)."""
    for i in range(3):
        node = params["feature_embed"][f"proj{i}"]
        sd[f"feature_embed.proj{i}.weight"] = _t(node).T[:, :, None]
        sd[f"feature_embed.proj{i}.bias"] = _t(node, "bias")


def flax_to_torch_state_dict(variables: Mapping, mcfg) -> dict[str, np.ndarray]:
    """Map flax variables to a reference ``state_dict`` (numpy values).

    Args:
      variables: ``{"params": ..., ("batch_stats": ...)}`` for ``mcfg``.
      mcfg: the ModelConfig the variables belong to.

    Returns {torch_key: np.ndarray} covering every key of the matching
    reference class (v1–v6).
    """
    if mcfg.variant == "vit":
        raise ValueError(
            "variant='vit' checkpoints interop via compat.vit_import "
            "(timm-style partial load) — the S2Former .pth mapper does "
            "not cover the ScaleEmbedTransformer layout"
        )
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    D = mcfg.embed_dim
    n = mcfg.n_scales
    sd: dict[str, np.ndarray] = {}

    if mcfg.variant == "v6":
        _feature_embed(sd, p)
        _ln(sd, "norm", p["norm"])
        _linear(sd, "final_features_with_design",
                p["final_features_with_design"])
        if mcfg.num_classes > 0:  # ref: head = Identity() when 0
            _zeros_linear(sd, "head", mcfg.num_classes, mcfg.out_dim)
        return sd

    # ---- patch embeds (conv stride==kernel <-> flattened dense) ----------
    grid = mcfg.cube
    for i, s in enumerate(mcfg.input_image_scales):
        pp = s // grid
        node = p[f"patch_embed{i}"]["proj"]
        k = _t(node).reshape(pp, pp, mcfg.in_channels, D).transpose(3, 2, 0, 1)
        prefix = (f"patch_embed_scale{i}" if mcfg.variant == "v1"
                  else f"patch_embed_blocks.{i}")
        sd[prefix + ".proj.weight"] = np.ascontiguousarray(k)
        sd[prefix + ".proj.bias"] = _t(node, "bias")

    # ---- transformer blocks ---------------------------------------------
    extra = mcfg.variant == "v5"
    single_stage = mcfg.variant in ("v1", "v2")
    stages = (
        [(0, mcfg.depth[0], grid)]
        if single_stage
        else [(0, mcfg.depth[0], grid), (1, mcfg.depth[1], grid // 2),
              (2, mcfg.depth[2], grid // 4)]
    )
    for stage, depth, g in stages:
        cube = (n, g, g)
        if extra:
            idx, _ = rel_pos_index_extra_token(cube)
        else:
            idx = rel_pos_index(cube)
        for k in range(depth):
            f = p[f"blocks{stage}_{k}"]
            t = "blocks" if single_stage else f"blocks{stage}"
            t = f"{t}.{k}"
            _ln(sd, t + ".norm1", f["norm1"])
            _ln(sd, t + ".norm2", f["norm2"])
            _linear(sd, t + ".attn.qkv", f["attn"]["qkv"])
            _linear(sd, t + ".attn.proj", f["attn"]["proj"])
            sd[t + ".attn.relative_position_bias_table"] = _t(
                f["attn"], "rel_pos_bias_table"
            )
            sd[t + ".attn.relative_position_index"] = idx.astype(np.int64)
            _linear(sd, t + ".mlp.fc1", f["mlp"]["Dense_0"])
            _linear(sd, t + ".mlp.fc2", f["mlp"]["Dense_1"])

    # ---- shared norm / designed-feature embed ---------------------------
    _ln(sd, "norm", p["norm"])
    if "feature_embed" in p:
        _feature_embed(sd, p)

    # ---- heads (incl. constructed-but-uncalled ones as zeros) -----------
    def linear_or_zeros(tkey, fkey, out_dim, in_dim):
        if fkey in p:
            _linear(sd, tkey, p[fkey])
        else:
            _zeros_linear(sd, tkey, out_dim, in_dim)

    linear_or_zeros("final_features", "final_features", 100, n * D)
    if mcfg.variant == "v5":
        linear_or_zeros("last_block_features", "last_block_features",
                        D, (n + 1) * D)
        linear_or_zeros("final_features_with_design",
                        "final_features_with_design", 100, 2 * D)
    else:
        linear_or_zeros("final_features_with_design",
                        "final_features_with_design", 100, (n + 1) * D)
    if mcfg.num_classes > 0:
        linear_or_zeros("head", "head", mcfg.num_classes, mcfg.out_dim)

    # ---- aux heads (v4/v5) ----------------------------------------------
    if mcfg.variant in ("v4", "v5"):
        for name in ("aux0", "aux1"):
            f = p[name]
            t = name
            # aux.0: Conv2d(k=2, bias=False) — flax HWIO -> torch OIHW
            sd[t + ".aux.0.weight"] = np.ascontiguousarray(
                _t(f["conv1"]).transpose(3, 2, 0, 1)
            )
            sd[t + ".aux.1.weight"] = _t(f["bn"], "scale")
            sd[t + ".aux.1.bias"] = _t(f["bn"], "bias")
            sd[t + ".aux.1.running_mean"] = np.asarray(
                bs[name]["bn"]["mean"], np.float32
            )
            sd[t + ".aux.1.running_var"] = np.asarray(
                bs[name]["bn"]["var"], np.float32
            )
            sd[t + ".aux.1.num_batches_tracked"] = np.asarray(0, np.int64)
            sd[t + ".aux.4.weight"] = np.ascontiguousarray(
                _t(f["conv2"]).transpose(3, 2, 0, 1)
            )
            sd[t + ".aux.4.bias"] = _t(f["conv2"], "bias")
            if "norm" in f:  # v4 applies it; v5 creates-but-never-calls
                _ln(sd, t + ".norm", f["norm"])
            else:  # AuxBolck_v5 norm is LN(2·in_c), :385
                sd[t + ".norm.weight"] = np.ones((2 * D,), np.float32)
                sd[t + ".norm.bias"] = np.zeros((2 * D,), np.float32)
            _linear(sd, t + ".out_features", f["out"])

    return sd


def save_torch_checkpoint(
    variables: Mapping, mcfg, path: str, epoch: int = 0
) -> None:
    """Write the reference training-checkpoint dict (``Train_SMT.py:317-343``
    layout minus optimizer state) to ``path``."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch_state_dict(variables, mcfg).items()
    }
    torch.save(
        {
            "net": sd,
            "optimizer": None,
            "epoch": int(epoch),
            "time": 0.0,
            "scales": list(mcfg.input_image_scales),
            "depth": list(mcfg.depth),
            "name": mcfg.name,
        },
        path,
    )
