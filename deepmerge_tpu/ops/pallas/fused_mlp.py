"""Fused transformer-FFN half-block: residual + LN + fc1 + GELU + fc2.

The MLP half of a CrossScaleBlock under XLA round-trips the (tokens, 3072)
hidden activation and the LayerNorm output through HBM (~5GB per block at
extraction batch sizes). This kernel keeps the whole computation — LN in
f32, both matmuls, tanh-GELU, the residual add — in VMEM per token tile;
weights stay VMEM-resident across the grid (constant index maps are fetched
once by the Mosaic pipeline).

Differentiable via custom VJP (XLA recompute backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):  # torch nn.LayerNorm default, matches s2former.LN_EPS
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, exact_gelu: bool):
    x = x_ref[...]
    y = _ln(x, ls_ref[...], lb_ref[...]).astype(x.dtype)
    h = (
        jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    h = jax.nn.gelu(h, approximate=not exact_gelu).astype(x.dtype)
    o = (
        jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...].astype(jnp.float32)
    )
    out_ref[...] = (x.astype(jnp.float32) + o).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("exact_gelu", "block_t", "interpret")
)
def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    exact_gelu: bool = False, block_t: int = 256,
                    interpret: bool = False):
    """x + fc2(gelu(fc1(LN(x)))) over (T, C) tokens, fused in VMEM.

    Args:
      x: (T, C) tokens (callers flatten (B, N, C)).
      ln_scale, ln_bias: (C,) LayerNorm parameters.
      w1, b1: (C, H), (H,); w2, b2: (H, C), (C,).
    """
    return _fused_mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2,
                          exact_gelu, block_t, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_mlp_vjp(x, ls, lb, w1, b1, w2, b2, exact_gelu, block_t, interpret):
    return _fused_mlp_forward(x, ls, lb, w1, b1, w2, b2, exact_gelu, block_t,
                              interpret)


def _fused_mlp_fwd(x, ls, lb, w1, b1, w2, b2, exact_gelu, block_t, interpret):
    out = _fused_mlp_forward(x, ls, lb, w1, b1, w2, b2, exact_gelu, block_t,
                             interpret)
    return out, (x, ls, lb, w1, b1, w2, b2)


def _fused_mlp_bwd(exact_gelu, block_t, interpret, res, g):
    x, ls, lb, w1, b1, w2, b2 = res

    def f(x, ls, lb, w1, b1, w2, b2):
        y = _ln(x, ls, lb).astype(x.dtype)
        h = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1.astype(
            jnp.float32
        )
        h = jax.nn.gelu(h, approximate=not exact_gelu).astype(x.dtype)
        o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
            jnp.float32
        )
        return x.astype(jnp.float32) + o

    _, vjp = jax.vjp(f, x, ls, lb, w1, b1, w2, b2)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, res))


_fused_mlp_vjp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def _fused_mlp_forward(x, ls, lb, w1, b1, w2, b2, exact_gelu, block_t,
                       interpret):
    t, c = x.shape
    h = w1.shape[1]
    block_t = min(block_t, max(t, 1))
    pad = (-t) % block_t
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0)])
    rep = lambda *_: (0, 0)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, exact_gelu=exact_gelu),
        grid=((t + pad) // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t + pad, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, ls.reshape(1, -1), lb.reshape(1, -1), w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1))
    return out[:t] if pad else out
