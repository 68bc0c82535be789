"""S2Former family: shape/variant coverage + attention parity vs torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.config import ModelConfig
from deepmerge_tpu.models.s2former import (
    S2Former,
    build_model,
    init_params,
    rel_pos_index,
    rel_pos_index_extra_token,
)


def _inputs(cfg: ModelConfig, b=2, seed=0):
    r = np.random.RandomState(seed)
    patches = tuple(
        jnp.asarray(r.rand(b, s, s, cfg.in_channels), jnp.float32)
        for s in cfg.input_image_scales
    )
    designed = jnp.asarray(r.rand(b, cfg.designed_feature_dim), jnp.float32)
    return patches, designed


# ---------------------------------------------------------------------------
# relative position index
# ---------------------------------------------------------------------------

def test_rel_pos_index_basic():
    cube = (3, 4, 4)
    idx = rel_pos_index(cube)
    n = 3 * 4 * 4
    table = (2 * 3 - 1) * (2 * 4 - 1) * (2 * 4 - 1)
    assert idx.shape == (n, n)
    assert idx.min() >= 0 and idx.max() < table
    # zero relative offset on the diagonal -> one shared index
    assert len(np.unique(np.diag(idx))) == 1
    # index depends only on the 3-D offset: translated token pairs share it
    # token (c,h,w) flattens to c*16 + h*4 + w
    def t(c, h, w):
        return c * 16 + h * 4 + w
    assert idx[t(0, 1, 2), t(0, 0, 1)] == idx[t(1, 2, 3), t(1, 1, 2)]
    assert idx[t(2, 1, 0), t(0, 1, 0)] == idx[t(2, 2, 1), t(0, 2, 1)]


def test_rel_pos_index_extra_token():
    cube = (2, 2, 2)
    idx, table = rel_pos_index_extra_token(cube)
    n = 8
    base_table = 3 * 3 * 3
    assert idx.shape == (n + 1, n + 1)
    assert table == base_table + 2 * n
    assert idx.max() < table
    assert idx[-1, -1] == idx[0, 0]
    # the extra row/col entries are unique fresh indices
    col = idx[:-1, -1]
    row = idx[-1, :-1]
    fresh = np.concatenate([col, row])
    assert len(np.unique(fresh)) == 2 * n
    assert fresh.min() >= base_table


# ---------------------------------------------------------------------------
# variants
# ---------------------------------------------------------------------------

VARIANT_CFGS = {
    "v1": ModelConfig(variant="v1", input_image_scales=(14, 28, 56, 112),
                      cube=7, embed_dim=32, depth=(2,), num_heads=4,
                      out_dim=16, dtype="float32"),
    "v2": ModelConfig(variant="v2", input_image_scales=(16, 32), cube=8,
                      embed_dim=32, depth=(2,), num_heads=4, out_dim=16,
                      dtype="float32"),
    "v3": ModelConfig(variant="v3", input_image_scales=(16, 32, 64), cube=8,
                      embed_dim=32, depth=(2, 1, 1), num_heads=4, out_dim=16,
                      dtype="float32"),
    "v4": ModelConfig(variant="v4", input_image_scales=(16, 32, 64), cube=8,
                      embed_dim=32, depth=(1, 1, 1), num_heads=4, out_dim=16,
                      dtype="float32"),
    "v5": ModelConfig(variant="v5", input_image_scales=(16, 32, 64), cube=8,
                      embed_dim=32, depth=(1, 1, 1), num_heads=4, out_dim=16,
                      dtype="float32"),
    "v6": ModelConfig(variant="v6", embed_dim=32, out_dim=16, dtype="float32"),
}


@pytest.mark.parametrize("variant", list(VARIANT_CFGS))
def test_variant_forward_shapes(variant):
    cfg = VARIANT_CFGS[variant]
    model = build_model(cfg)
    patches, designed = _inputs(cfg)
    variables = init_params(model, jax.random.key(0))
    out = model.apply(variables, patches, designed, False)
    assert out.shape == (2, cfg.out_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("variant", ["v4", "v5"])
def test_aux_outputs_in_train_mode(variant):
    cfg = VARIANT_CFGS[variant]
    model = build_model(cfg)
    patches, designed = _inputs(cfg)
    variables = init_params(model, jax.random.key(0))
    out, aux0, aux1 = model.apply(
        variables, patches, designed, True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )[0]
    assert out.shape == aux0.shape == aux1.shape == (2, cfg.out_dim)


def test_no_designed_features_path():
    cfg = VARIANT_CFGS["v3"].__class__(
        **{**VARIANT_CFGS["v3"].__dict__, "use_designed_features": False}
    )
    model = build_model(cfg)
    patches, designed = _inputs(cfg)
    variables = init_params(model, jax.random.key(0))
    out = model.apply(variables, patches, None, False)
    assert out.shape == (2, cfg.out_dim)


def test_forward_deterministic_and_differentiable(tiny_model_cfg):
    model = build_model(tiny_model_cfg)
    patches, designed = _inputs(tiny_model_cfg)
    variables = init_params(model, jax.random.key(0))

    out1 = model.apply(variables, patches, designed, False)
    out2 = model.apply(variables, patches, designed, False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def loss(params):
        emb = model.apply({"params": params}, patches, designed, False)
        return jnp.sum(emb ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every parameter that should train receives gradient somewhere
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_model_name():
    assert VARIANT_CFGS["v3"].name == "S2Former_v3-3CH-3DP-SEF-211"


# ---------------------------------------------------------------------------
# attention parity vs an independent torch implementation
# ---------------------------------------------------------------------------

def test_attention_matches_torch_oracle():
    import torch

    dim, heads, cube = 8, 2, (2, 2, 2)
    n = 8
    b = 3
    r = np.random.RandomState(0)
    x = r.rand(b, n, dim).astype(np.float32)
    wqkv = r.randn(dim, 3 * dim).astype(np.float32) * 0.1
    bqkv = r.randn(3 * dim).astype(np.float32) * 0.1
    wproj = r.randn(dim, dim).astype(np.float32) * 0.1
    bproj = r.randn(dim).astype(np.float32) * 0.1
    table = r.randn((2 * 2 - 1) ** 3, heads).astype(np.float32) * 0.5

    # --- torch oracle (written from the math, not the reference code) ------
    idx = rel_pos_index(cube)
    xt = torch.tensor(x)
    qkv = xt @ torch.tensor(wqkv) + torch.tensor(bqkv)
    qkv = qkv.reshape(b, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (dim // heads) ** -0.5) @ k.transpose(-2, -1)
    bias = torch.tensor(table)[torch.tensor(idx.reshape(-1)).long()]
    bias = bias.reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    out_t = (attn @ v).transpose(1, 2).reshape(b, n, dim)
    out_t = out_t @ torch.tensor(wproj) + torch.tensor(bproj)

    # --- ours ---------------------------------------------------------------
    from deepmerge_tpu.models.s2former import CrossScaleAttention

    attn_mod = CrossScaleAttention(dim=dim, num_heads=heads, cube=cube)
    params = {
        "rel_pos_bias_table": jnp.asarray(table),
        "qkv": {"kernel": jnp.asarray(wqkv), "bias": jnp.asarray(bqkv)},
        "proj": {"kernel": jnp.asarray(wproj), "bias": jnp.asarray(bproj)},
    }
    out_j = attn_mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-5, atol=2e-5
    )


def test_patch_embed_matches_torch_conv():
    """PatchEmbed (reshape+dense) == stride-p conv with mapped weights."""
    import torch

    p, dim, c = 4, 8, 3
    size = 8
    r = np.random.RandomState(1)
    x = r.rand(2, size, size, c).astype(np.float32)
    w_conv = r.randn(dim, c, p, p).astype(np.float32) * 0.1
    b_conv = r.randn(dim).astype(np.float32) * 0.1

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    out_t = torch.nn.functional.conv2d(
        xt, torch.tensor(w_conv), torch.tensor(b_conv), stride=p
    )
    out_t = out_t.flatten(2).transpose(1, 2).numpy()  # (B, N, dim)

    from deepmerge_tpu.models.s2former import PatchEmbed

    # our dense flattens patch pixels as (ph, pw, c)
    w_dense = w_conv.transpose(2, 3, 1, 0).reshape(p * p * c, dim)
    pe = PatchEmbed(patch=p, dim=dim)
    out_j = pe.apply(
        {"params": {"proj": {"kernel": jnp.asarray(w_dense),
                             "bias": jnp.asarray(b_conv)}}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-5, atol=2e-5)
