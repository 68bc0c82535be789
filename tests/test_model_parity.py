"""Full S2Former-v3 forward parity vs an independent torch oracle.

The oracle below is written from the documented reference math (SURVEY.md
§2.2 / nets/ShfitScaleFormer.py:772-1010 behavior): per-scale stride==kernel
patch conv, cross-scale attention blocks with the 3-D relative-position
bias, per-scale 2×2 avg-pool between the three stages, ONE shared LayerNorm
reused after each pool / after the backbone / on the designed-feature
embedding, per-scale mean-pool head, concat with the designed embedding,
linear to the output dim. Weights are mapped from the flax model so the two
implementations must agree numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from deepmerge_tpu.config import ModelConfig
from deepmerge_tpu.models.s2former import build_model, init_params, rel_pos_index

CFG = ModelConfig(
    variant="v3", input_image_scales=(8, 16, 32), cube=4, embed_dim=24,
    depth=(2, 1, 1), num_heads=2, out_dim=10, dtype="float32",
)


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _linear(x, params):
    return x @ _t(params["kernel"]) + _t(params["bias"])


def _ln(x, params, eps=1e-5):  # torch nn.LayerNorm default (ref never overrides)
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * _t(params["scale"]) + _t(params["bias"])


def _attention(x, p, cube, heads=None):
    b, n, c = x.shape
    heads = heads or CFG.num_heads
    d = c // heads
    qkv = _linear(x, p["qkv"]).reshape(b, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx = torch.tensor(rel_pos_index(cube).reshape(-1)).long()
    bias = _t(p["rel_pos_bias_table"])[idx].reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return _linear(out, p["proj"])


def _block(x, p, cube, heads=None):
    y = _ln(x, p["norm1"])
    x = x + _attention(y, p["attn"], cube, heads)
    y = _ln(x, p["norm2"])
    h = F.gelu(_linear(y, p["mlp"]["Dense_0"]), approximate="tanh")
    return x + _linear(h, p["mlp"]["Dense_1"])


def _pool2x2(x, n_scales, g):
    b, _, d = x.shape
    x = x.reshape(b, n_scales, g // 2, 2, g // 2, 2, d)
    return x.mean(dim=(3, 5)).reshape(b, n_scales * (g // 2) ** 2, d)


def torch_oracle(params, patches, designed, cfg=None):
    cfg = cfg or CFG
    n = cfg.n_scales
    g = cfg.cube
    toks = []
    for i, s in enumerate(cfg.input_image_scales):
        p = s // g
        x = _t(patches[i])  # (B, s, s, C)
        b = x.shape[0]
        x = x.reshape(b, g, p, g, p, 3).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, p * p * 3)
        toks.append(_linear(x, params[f"patch_embed{i}"]["proj"]))
    x = torch.cat(toks, dim=1)

    shared_ln = params["norm"]
    for i in range(cfg.depth[0]):
        x = _block(x, params[f"blocks0_{i}"], (n, g, g), cfg.num_heads)
    x = _ln(_pool2x2(x, n, g), shared_ln)
    for i in range(cfg.depth[1]):
        x = _block(x, params[f"blocks1_{i}"], (n, g // 2, g // 2), cfg.num_heads)
    x = _ln(_pool2x2(x, n, g // 2), shared_ln)
    for i in range(cfg.depth[2]):
        x = _block(x, params[f"blocks2_{i}"], (n, g // 4, g // 4), cfg.num_heads)
    x = _ln(x, shared_ln)

    g2 = g // 4
    b = x.shape[0]
    pooled = x.reshape(b, n, g2 * g2, -1).mean(2).reshape(b, -1)

    fe = params["feature_embed"]
    d = F.gelu(_linear(_t(designed), fe["proj0"]), approximate="tanh")
    d = _linear(_linear(d, fe["proj1"]), fe["proj2"])
    d = _ln(d, shared_ln)

    out = torch.cat([pooled, d], dim=-1)
    return _linear(out, params["final_features_with_design"])


def test_full_v3_forward_matches_torch_oracle():
    model = build_model(CFG)
    variables = init_params(model, jax.random.key(0))
    params = jax.device_get(variables["params"])

    r = np.random.RandomState(0)
    patches = tuple(
        r.rand(3, s, s, 3).astype(np.float32) for s in CFG.input_image_scales
    )
    designed = r.rand(3, 19).astype(np.float32)

    got = np.asarray(
        model.apply(variables, tuple(jnp.asarray(p) for p in patches),
                    jnp.asarray(designed), False)
    )
    want = torch_oracle(params, patches, designed).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# v5: designed-feature token carried through the backbone, extended bias
# table (nets/ShfitScaleFormer.py:1264-1503 behavior)
# ---------------------------------------------------------------------------

CFG5 = ModelConfig(
    variant="v5", input_image_scales=(8, 16, 32), cube=4, embed_dim=24,
    depth=(1, 1, 1), num_heads=2, out_dim=10, dtype="float32",
)


def _attention5(x, p, cube):
    from deepmerge_tpu.models.s2former import rel_pos_index_extra_token

    b, n, c = x.shape
    heads = CFG5.num_heads
    d = c // heads
    qkv = _linear(x, p["qkv"]).reshape(b, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx, _ = rel_pos_index_extra_token(cube)
    idx = torch.tensor(idx.reshape(-1)).long()
    bias = _t(p["rel_pos_bias_table"])[idx].reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return _linear(out, p["proj"])


def _block5(x, p, cube):
    y = _ln(x, p["norm1"])
    x = x + _attention5(y, p["attn"], cube)
    y = _ln(x, p["norm2"])
    h = F.gelu(_linear(y, p["mlp"]["Dense_0"]), approximate="tanh")
    return x + _linear(h, p["mlp"]["Dense_1"])


def test_full_v5_forward_matches_torch_oracle():
    model = build_model(CFG5)
    variables = init_params(model, jax.random.key(2))
    params = jax.device_get(variables["params"])

    r = np.random.RandomState(1)
    patches = tuple(
        r.rand(2, s, s, 3).astype(np.float32) for s in CFG5.input_image_scales
    )
    designed = r.rand(2, 19).astype(np.float32)

    got = np.asarray(
        model.apply(variables, tuple(jnp.asarray(p) for p in patches),
                    jnp.asarray(designed), False)
    )

    # --- torch oracle -------------------------------------------------------
    n, g = CFG5.n_scales, CFG5.cube
    toks = []
    for i, s in enumerate(CFG5.input_image_scales):
        pch = s // g
        x = _t(patches[i])
        b = x.shape[0]
        x = x.reshape(b, g, pch, g, pch, 3).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, pch * pch * 3)
        toks.append(_linear(x, params[f"patch_embed{i}"]["proj"]))
    x = torch.cat(toks, dim=1)

    shared_ln = params["norm"]
    fe = params["feature_embed"]
    d = F.gelu(_linear(_t(designed), fe["proj0"]), approximate="tanh")
    d = _linear(_linear(d, fe["proj1"]), fe["proj2"])
    d = _ln(d, shared_ln)                      # designed embedding (B, C)
    x = torch.cat([x, d[:, None, :]], dim=1)   # extra token appended

    x = _block5(x, params["blocks0_0"], (n, g, g))
    extra = x[:, n * g * g :]
    x = torch.cat([_pool2x2(x[:, : n * g * g], n, g), extra], 1)
    x = _ln(x, shared_ln)
    g1 = g // 2
    x = _block5(x, params["blocks1_0"], (n, g1, g1))
    extra = x[:, n * g1 * g1 :]
    x = torch.cat([_pool2x2(x[:, : n * g1 * g1], n, g1), extra], 1)
    x = _ln(x, shared_ln)
    g2 = g // 4
    x = _block5(x, params["blocks2_0"], (n, g2, g2))
    x = _ln(x, shared_ln)

    b = x.shape[0]
    pooled = x[:, : n * g2 * g2].reshape(b, n, g2 * g2, -1).mean(2).reshape(b, -1)
    extra = x[:, n * g2 * g2 :].mean(1)
    feats = _linear(torch.cat([pooled, extra], -1), params["last_block_features"])
    want = _linear(torch.cat([feats, d], -1),
                   params["final_features_with_design"]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
