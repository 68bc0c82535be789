"""Whole-block Pallas megakernel: parity, gradients, param-tree identity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.config import ModelConfig
from deepmerge_tpu.models.s2former import (
    CrossScaleBlock,
    build_model,
    init_params,
)
from deepmerge_tpu.ops.pallas.fused_block import (
    _xla_block,
    _xla_chain,
    fused_block,
    fused_block_chain,
)

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow

def _params(key, n, c, heads, hid):
    ks = jax.random.split(key, 8)
    r = lambda k, shape, s=0.05: jax.random.normal(k, shape, jnp.float32) * s
    return (
        jnp.ones((c,), jnp.float32) + r(ks[0], (c,)),   # ln1 scale
        r(ks[0], (c,)),                                  # ln1 bias
        r(ks[1], (c, 3 * c)), r(ks[2], (3 * c,)),        # qkv
        r(ks[3], (heads, n, n), 0.5),                    # attn bias
        r(ks[4], (c, c)), r(ks[4], (c,)),                # proj
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),  # ln2
        r(ks[5], (c, hid)), r(ks[6], (hid,)),            # up
        r(ks[7], (hid, c)), r(ks[7], (c,)),              # down
    )


@pytest.mark.parametrize("n", [48, 49])  # even + v5-style odd sequence
def test_fused_block_matches_xla_reference(n):
    c, heads, hid = 64, 4, 256
    params = _params(jax.random.key(0), n, c, heads, hid)
    x = jax.random.normal(jax.random.key(1), (5, n, c), jnp.float32)
    want = np.asarray(_xla_block(x, params, heads, False))
    got = np.asarray(
        fused_block(x, params, heads=heads, block_b=2, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_block_gradients_match_xla():
    n, c, heads, hid = 12, 32, 2, 64
    params = _params(jax.random.key(2), n, c, heads, hid)
    x = jax.random.normal(jax.random.key(3), (3, n, c), jnp.float32)

    def loss_f(x, p):
        return jnp.sum(
            fused_block(x, p, heads=heads, block_b=3, interpret=True) ** 2
        )

    def loss_x(x, p):
        return jnp.sum(_xla_block(x, p, heads, False) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(x, params)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n,depth", [(48, 4), (12, 2), (49, 3)])
def test_fused_block_chain_matches_xla_chain(n, depth):
    """Stage-chained kernel == sequential XLA blocks (odd n = v5 extra
    token)."""
    c, heads, hid = 64, 4, 256
    params_list = tuple(
        _params(jax.random.key(10 + i), n, c, heads, hid)
        for i in range(depth)
    )
    x = jax.random.normal(jax.random.key(1), (5, n, c), jnp.float32)
    want = np.asarray(_xla_chain(x, params_list, heads, False))
    got = np.asarray(
        fused_block_chain(x, params_list, heads=heads, block_b=2,
                          interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_fused_block_chain_gradients_match_xla():
    n, c, heads, hid, depth = 12, 32, 2, 64, 2
    params_list = tuple(
        _params(jax.random.key(20 + i), n, c, heads, hid)
        for i in range(depth)
    )
    x = jax.random.normal(jax.random.key(3), (3, n, c), jnp.float32)

    def loss_f(x, ps):
        return jnp.sum(
            fused_block_chain(x, ps, heads=heads, block_b=3,
                              interpret=True) ** 2
        )

    def loss_x(x, ps):
        return jnp.sum(_xla_chain(x, ps, heads, False) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(x, params_list)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, params_list)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def _tiny_cfg(**kw):
    base = dict(
        variant="v3", input_image_scales=(16, 32, 64), cube=8, embed_dim=64,
        depth=(2, 1, 1), num_heads=4, out_dim=32, dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_block_param_tree_identical_across_paths():
    """fused_block=True creates the EXACT param tree of the XLA path, so
    checkpoints and the torch importer work unchanged."""
    cfg_f = _tiny_cfg(fused_block=True)
    cfg_x = _tiny_cfg(fused_block=False)
    v_f = init_params(build_model(cfg_f), jax.random.key(0))
    v_x = init_params(build_model(cfg_x), jax.random.key(0))
    flat_f = jax.tree_util.tree_flatten_with_path(v_f)[0]
    flat_x = jax.tree_util.tree_flatten_with_path(v_x)[0]
    assert [(p, a.shape) for p, a in flat_f] == \
        [(p, a.shape) for p, a in flat_x]


@pytest.mark.parametrize("variant", ["v3", "v5"])
def test_model_fused_block_consistent(variant):
    """Full model: megakernel path == XLA path on the same params."""
    cfg_x = _tiny_cfg(variant=variant, fused_block=False,
                      fused_attention=False)
    cfg_f = _tiny_cfg(variant=variant, fused_block=True)
    m_x, m_f = build_model(cfg_x), build_model(cfg_f)
    variables = init_params(m_x, jax.random.key(0))
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
        for s in cfg_x.input_image_scales
    )
    designed = jnp.asarray(r.rand(2, 19), jnp.float32)
    want = np.asarray(m_x.apply(variables, patches, designed, False))
    got = np.asarray(m_f.apply(variables, patches, designed, False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["v3", "v5"])
def test_model_stage_chain_consistent(variant):
    """Full model with multi-block stages: the stage-chained kernel path ==
    the XLA path on the same params (chain_stage0 covers stage-0 too)."""
    kw = dict(variant=variant, depth=(2, 2, 2))
    cfg_x = _tiny_cfg(fused_block=False, fused_attention=False,
                      fused_stage_chain=False, **kw)
    cfg_c = _tiny_cfg(fused_block=True, fused_stage_chain=True,
                      chain_stage0=True, **kw)
    m_x, m_c = build_model(cfg_x), build_model(cfg_c)
    variables = init_params(m_x, jax.random.key(0))
    # identical param trees (checkpoint compatibility)
    v_c = init_params(m_c, jax.random.key(0))
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v_c)
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
        for s in cfg_x.input_image_scales
    )
    designed = jnp.asarray(r.rand(2, 19), jnp.float32)
    want = np.asarray(m_x.apply(variables, patches, designed, False))
    got = np.asarray(m_c.apply(variables, patches, designed, False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_model_fused_block_trains():
    """A fused_block=True config trains: the step builder swaps in the XLA
    path (``loop._training_model`` — the recompute VJP loses at train batch
    sizes) on the SAME param tree, so the flag is safe to leave on."""
    from deepmerge_tpu.config import Config, DataConfig
    from deepmerge_tpu.train.loop import create_train_state, make_train_step

    mcfg = _tiny_cfg(fused_block=True)
    cfg = Config(model=mcfg, data=DataConfig(patch_sizes=(16, 32, 64),
                                             max_window=128, batch_size=4))
    model = build_model(mcfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, cfg)
    r = np.random.RandomState(1)
    b = 4
    batch = {
        "left_patches": tuple(
            jnp.asarray(r.rand(b, s, s, 3), jnp.float32)
            for s in mcfg.input_image_scales
        ),
        "right_patches": tuple(
            jnp.asarray(r.rand(b, s, s, 3), jnp.float32)
            for s in mcfg.input_image_scales
        ),
        "left_designed": jnp.asarray(r.rand(b, 19), jnp.float32),
        "right_designed": jnp.asarray(r.rand(b, 19), jnp.float32),
        "flag": jnp.asarray((r.rand(b) > 0.5).astype(np.float32)),
    }
    state2, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    k0 = state.params["blocks0_0"]["attn"]["qkv"]["kernel"]
    k1 = state2.params["blocks0_0"]["attn"]["qkv"]["kernel"]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))


@pytest.mark.parametrize("n", [48, 49])  # even + v5-style odd sequence
def test_saved_activation_vjp_wide_lanes(n):
    """Round-4 saved-activation backward at multi-tile lane widths (the
    probs output spans heads*n lanes, the pre-GELU output hid lanes) ==
    XLA autodiff, for x AND every param."""
    c, heads, hid = 64, 4, 256
    params = _params(jax.random.key(20), n, c, heads, hid)
    x = jax.random.normal(jax.random.key(21), (5, n, c), jnp.float32)

    def loss_f(x, p):
        return jnp.sum(
            fused_block(x, p, heads=heads, block_b=2, interpret=True) ** 2
        )

    def loss_x(x, p):
        return jnp.sum(_xla_block(x, p, heads, False) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(x, params)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
