"""ViT family + legacy models: shapes, finiteness, variant switches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.models.legacy import (
    GRUAttention,
    MLP,
    NonLocalBlock2D,
    SpatiallyMemorizedNetwork,
)
from deepmerge_tpu.models.vit import ScaleEmbedTransformer, VisionTransformer

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_vision_transformer_forward():
    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=32, depth=2,
                          num_heads=4, num_classes=5)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_block_mlp_gets_dtype_and_tanh_gelu(monkeypatch):
    """Regression: Block used to pass dtype into Mlp's ``exact_gelu``
    positional slot — every ViT block silently ran exact erf GELU
    (~15ms/block on this VPU) and ignored the configured compute dtype."""
    import flax.linen as fnn

    gelu_modes = []
    real_gelu = fnn.gelu

    def spy(x, approximate=True):
        gelu_modes.append(approximate)
        return real_gelu(x, approximate=approximate)

    monkeypatch.setattr(fnn, "gelu", spy)
    m = VisionTransformer(img_size=16, patch_size=8, embed_dim=32, depth=1,
                          num_heads=4, num_classes=0, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 3))
    v = m.init(jax.random.key(0), x)
    _, inter = m.apply(
        v, x, capture_intermediates=lambda mdl, name: name == "__call__"
    )
    assert gelu_modes and all(gelu_modes), "ViT Mlp must use tanh GELU"
    mlp_out = inter["intermediates"]["block0"]["mlp"]["__call__"][0]
    assert mlp_out.dtype == jnp.bfloat16, "Mlp must inherit the compute dtype"


def test_vision_transformer_representation():
    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=32, depth=1,
                          num_heads=4, num_classes=0, representation_size=16)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (1, 16)


@pytest.mark.parametrize("label_embed", [False, True])
def test_scale_embed_transformer(label_embed):
    m = ScaleEmbedTransformer(embed_dim=32, depth=2, num_heads=4, out_dim=10,
                              label_embed=label_embed)
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(2, s, s, 3), jnp.float32) for s in (28, 56, 112, 224)
    )
    designed = jnp.asarray(r.rand(2, 19), jnp.float32)
    factors = jnp.asarray(r.rand(2, 4), jnp.float32)
    v = m.init(jax.random.key(0), patches, designed, factors)
    out = m.apply(v, patches, designed, factors)
    if label_embed:
        emb, logits, class_feat = out
        assert emb.shape == (2, 10)
        assert logits.shape == (2, 11)
        assert class_feat.shape == (2, 10)
    else:
        assert out.shape == (2, 10)


def test_scale_factor_layernorm_invariance():
    """Documented reference quirk: the 'scale embedding' multiplies each
    pos-embedded token by a positive factor (vit_model.py:455-462), but
    pre-LN blocks are EXACTLY invariant to positive per-token scaling
    (LN(αt) == LN(t)), so the cls readout cannot see uniform factors.
    A sign flip (α<0) IS visible — confirming the factors reach the tokens."""
    m = ScaleEmbedTransformer(embed_dim=32, depth=1, num_heads=4, out_dim=8)
    r = np.random.RandomState(1)
    patches = tuple(
        jnp.asarray(r.rand(1, s, s, 3), jnp.float32) for s in (28, 56, 112, 224)
    )
    designed = jnp.asarray(r.rand(1, 19), jnp.float32)
    f1 = jnp.ones((1, 4))
    v = m.init(jax.random.key(0), patches, designed, f1)
    o1 = np.asarray(m.apply(v, patches, designed, f1))
    o2 = np.asarray(m.apply(v, patches, designed, 2.0 * f1))
    np.testing.assert_allclose(o1, o2, atol=1e-4)  # positive scaling: inert
    o3 = np.asarray(m.apply(v, patches, designed, -f1))
    assert np.abs(o1 - o3).max() > 1e-5  # sign reaches the tokens


def test_mlp_returns_logits_and_penultimate():
    m = MLP()
    x = jnp.zeros((4, 784))
    v = m.init(jax.random.key(0), x)
    logits, h2 = m.apply(v, x)
    assert logits.shape == (4, 10) and h2.shape == (4, 250)


def test_gru_attention():
    m = GRUAttention(hidden=8, num_layers=2, num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 28, 28), jnp.float32)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (3, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_nonlocal_block_residual_at_init():
    """w_z is zero-init → block is identity at init (standard non-local)."""
    m = NonLocalBlock2D(channels=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 8), jnp.float32)
    v = m.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x),
                               atol=1e-6)


def test_spatially_memorized_network():
    m = SpatiallyMemorizedNetwork()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), x)
    emb = m.apply(v, x)
    assert emb.shape == (2, 512)
    # L2-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-3)
    pooled = m.apply(v, jnp.stack([emb, emb, emb], axis=1),
                     method=m.pool_contexts)
    assert pooled.shape == (2, 512)


def test_multi_loss_training_with_label_embed():
    """MultiLoss semantics (Losses.py:41-69): 0.7·contrastive + 0.15·CE×2,
    trained end-to-end through the label-embed ScaleEmbedTransformer."""
    import optax

    from deepmerge_tpu.train.losses import class_loss, multi_loss

    m = ScaleEmbedTransformer(embed_dim=32, depth=1, num_heads=4, out_dim=8,
                              num_classes=5, label_embed=True)
    r = np.random.RandomState(0)
    b = 4
    mk = lambda s: tuple(
        jnp.asarray(r.rand(b, sz, sz, 3), jnp.float32)
        for sz in (28, 56, 112, 224)
    )
    designed = jnp.asarray(r.rand(b, 19), jnp.float32)
    factors = jnp.ones((b, 4), jnp.float32)
    flag = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    labels_l = jnp.asarray(r.randint(0, 5, b))
    labels_r = jnp.asarray(r.randint(0, 5, b))
    left, right = mk(0), mk(1)

    v = m.init(jax.random.key(0), left, designed, factors)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])

    def loss_fn(params):
        el, ll, _ = m.apply({"params": params}, left, designed, factors)
        er, lr, _ = m.apply({"params": params}, right, designed, factors)
        return multi_loss(el, er, flag, ll, labels_l, lr, labels_r, margin=1.0)

    l0 = float(loss_fn(v["params"]))
    params = v["params"]
    step = jax.jit(lambda p, o: _update(p, o, loss_fn, tx))
    for _ in range(5):
        params, opt = step(params, opt)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0  # the joint objective trains

    # class_loss variant (Losses.py:72-95) is finite too
    el, ll, _ = m.apply({"params": params}, left, designed, factors)
    er, lr, _ = m.apply({"params": params}, right, designed, factors)
    assert np.isfinite(float(class_loss(ll, labels_l, lr, labels_r)))


def _update(params, opt, loss_fn, tx):
    grads = jax.grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    import optax

    return optax.apply_updates(params, updates), opt
