"""Fused MLP half-block kernel: parity + gradients (interpret mode).

Note: measured on TPU, XLA already fuses LN+fc1+gelu+fc2+residual to within
~2ms of this kernel at extraction batch sizes, so the model keeps the XLA
path; the kernel is retained as the substrate for future quantized variants.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.ops.pallas.fused_mlp import _ln, fused_mlp_block


def _ref(x, ls, lb, w1, b1, w2, b2):
    y = _ln(x, ls, lb).astype(x.dtype)
    h = jax.nn.gelu(
        jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1,
        approximate=True,
    ).astype(x.dtype)
    return x.astype(jnp.float32) + jnp.dot(
        h, w2, preferred_element_type=jnp.float32
    ) + b2


def _make(t=70, c=32, h=64, seed=0):
    r = np.random.RandomState(seed)
    return (
        jnp.asarray(r.randn(t, c), jnp.float32),
        jnp.asarray(r.randn(c), jnp.float32),
        jnp.asarray(r.randn(c), jnp.float32),
        jnp.asarray(r.randn(c, h) * 0.1, jnp.float32),
        jnp.asarray(r.randn(h) * 0.1, jnp.float32),
        jnp.asarray(r.randn(h, c) * 0.1, jnp.float32),
        jnp.asarray(r.randn(c) * 0.1, jnp.float32),
    )


def test_fused_mlp_matches_xla():
    args = _make()
    got = fused_mlp_block(*args, block_t=32, interpret=True)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_mlp_gradients():
    args = _make(t=16)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_block(*a, block_t=16, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
