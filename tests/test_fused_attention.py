"""Fused attention kernel parity vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.ops.pallas.fused_attention import fused_attention


def _xla_attention(q, k, v, bias):
    d = q.shape[-1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * d ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn + bias[None].astype(jnp.float32), axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("n", [192, 48, 12])
def test_fused_matches_xla(n):
    r = np.random.RandomState(0)
    b, h, d = 5, 4, 16  # b deliberately not a multiple of block_b
    q = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    v = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)
    want = np.asarray(_xla_attention(q, k, v, bias))
    got = np.asarray(fused_attention(q, k, v, bias, block_b=4, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_xla():
    r = np.random.RandomState(1)
    b, n, h, d = 3, 12, 2, 8
    q = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    v = jnp.asarray(r.randn(b, n, h, d), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, block_b=2,
                                       interpret=True) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(_xla_attention(q, k, v, bias) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [193, 49, 13])
def test_fused_qkv_odd_sequence_matches_xla(n):
    """v5 sequences are N+1 (extra designed-feature token) — odd lengths."""
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    r = np.random.RandomState(2)
    b, h, d = 3, 4, 16
    c = h * d
    qkv = jnp.asarray(r.randn(b, n, 3 * c), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)
    q = qkv[:, :, :c].reshape(b, n, h, d)
    k = qkv[:, :, c : 2 * c].reshape(b, n, h, d)
    v = qkv[:, :, 2 * c :].reshape(b, n, h, d)
    want = np.asarray(_xla_attention(q, k, v, bias)).reshape(b, n, c)
    got = np.asarray(
        fused_attention_qkv(qkv, bias, heads=h, block_b=2, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_v5_model_fused_flag_is_numerically_consistent():
    """v5 (extra token) fused vs XLA attention paths of the full model agree.

    Round-1 gated ``use_fused`` on ``not extra_token``; the kernel handles
    the N+1 sequence fine (nets/ShfitScaleFormer.py:187-327 semantics).
    """
    import dataclasses

    from deepmerge_tpu.config import ModelConfig
    from deepmerge_tpu.models.s2former import build_model, init_params

    base = ModelConfig(
        variant="v5", input_image_scales=(8, 16, 32), cube=4, embed_dim=32,
        depth=(1, 1, 1), num_heads=4, out_dim=10, dtype="float32",
    )
    cfg_x = dataclasses.replace(base, fused_attention=False)
    cfg_f = dataclasses.replace(base, fused_attention=True)
    m_x, m_f = build_model(cfg_x), build_model(cfg_f)
    variables = init_params(m_x, jax.random.key(0))
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
        for s in base.input_image_scales
    )
    designed = jnp.asarray(r.rand(2, 19), jnp.float32)
    out_x = np.asarray(m_x.apply(variables, patches, designed, False))
    out_f = np.asarray(m_f.apply(variables, patches, designed, False))
    np.testing.assert_allclose(out_f, out_x, rtol=1e-4, atol=1e-4)


def test_model_fused_flag_is_numerically_consistent(tiny_model_cfg):
    """fused vs XLA attention paths of the full model agree (f32, interpret)."""
    import dataclasses

    from deepmerge_tpu.models.s2former import build_model, init_params

    cfg_x = dataclasses.replace(tiny_model_cfg, fused_attention=False)
    cfg_f = dataclasses.replace(tiny_model_cfg, fused_attention=True)
    m_x, m_f = build_model(cfg_x), build_model(cfg_f)
    variables = init_params(m_x, jax.random.key(0))
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
        for s in tiny_model_cfg.input_image_scales
    )
    designed = jnp.asarray(r.rand(2, 19), jnp.float32)
    out_x = np.asarray(m_x.apply(variables, patches, designed, False))
    out_f = np.asarray(m_f.apply(variables, patches, designed, False))
    np.testing.assert_allclose(out_f, out_x, rtol=1e-4, atol=1e-4)


def test_save_probs_forward_matches_default():
    """save_probs=True (training) forward == the default kernel forward."""
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    r = np.random.RandomState(2)
    b, n, h, d = 5, 48, 4, 16
    qkv = jnp.asarray(r.randn(b, n, 3 * h * d), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)
    want = np.asarray(fused_attention_qkv(qkv, bias, heads=h, block_b=2,
                                          interpret=True))
    got = np.asarray(fused_attention_qkv(qkv, bias, heads=h, block_b=2,
                                         interpret=True, save_probs=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_save_probs_gradients_close_to_recompute():
    """The bf16 saved-probs backward tracks the f32 recompute backward
    (looser tolerance: probs stored bf16, matmuls bf16/f32-acc)."""
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    r = np.random.RandomState(3)
    b, n, h, d = 3, 12, 2, 8
    qkv = jnp.asarray(r.randn(b, n, 3 * h * d), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)

    def loss(qkv, bias, sp):
        return jnp.sum(
            fused_attention_qkv(qkv, bias, heads=h, block_b=2,
                                interpret=True, save_probs=sp) ** 2
        )

    g_t = jax.grad(loss, argnums=(0, 1))(qkv, bias, True)
    g_r = jax.grad(loss, argnums=(0, 1))(qkv, bias, False)
    for a, b_ in zip(g_t, g_r):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = np.abs(b_).max() + 1e-6
        assert np.abs(a - b_).max() / scale < 2e-2


def test_packed_pv_matches_default():
    """Experimental head-pair packed p·v kernel == default kernel."""
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    r = np.random.RandomState(4)
    b, n, h, d = 5, 48, 4, 16
    qkv = jnp.asarray(r.randn(b, n, 3 * h * d), jnp.float32)
    bias = jnp.asarray(r.randn(h, n, n), jnp.float32)
    want = np.asarray(fused_attention_qkv(qkv, bias, heads=h, block_b=2,
                                          interpret=True))
    got = np.asarray(fused_attention_qkv(qkv, bias, heads=h, block_b=2,
                                         interpret=True, packed_pv=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
