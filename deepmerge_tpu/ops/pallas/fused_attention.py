"""Fused biased attention kernel (Pallas TPU).

The S2Former attention (``nets/ShfitScaleFormer.py:113-136`` semantics:
softmax(q·kᵀ·scale + rel-pos bias)·v) over tiny sequences (192/48/12
tokens) is HBM-bound under XLA: the (B, H, N, N) float32 logits tensor is
materialized and re-read around the softmax — measured at ~14ms per block
for B=1024 vs 3.5ms for the 9x-more-FLOPs qkv matmul. This kernel keeps the
whole per-(batch-tile, head) attention in VMEM: logits, bias add, softmax
and the value matmul never touch HBM.

Sequences are short enough that no online-softmax (flash) streaming is
needed — (N, N) fits in VMEM outright. Differentiable via a custom VJP that
recomputes the attention with XLA ops in the backward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    # loop-free: batched dot_general over the whole (bt, N, D) tile lets
    # Mosaic schedule the MXU without per-sample loop overhead
    q = q_ref[:, 0] * scale                          # (bt, N, D)
    logits = jax.lax.dot_general(
        q, k_ref[:, 0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(
        logits + bias_ref[0][None].astype(jnp.float32), axis=-1
    ).astype(v_ref.dtype)
    out_ref[:, 0] = jax.lax.dot_general(
        p, v_ref[:, 0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_attention(q, k, v, bias, block_b: int = 16, interpret: bool = False):
    """softmax(q·kᵀ/√D + bias)·v, fused in VMEM.

    Differentiable: the forward runs the Pallas kernel; the backward is a
    custom VJP that recomputes the (tiny-N) attention with XLA ops.

    Args:
      q, k, v: (B, N, H, D) — B must be positive; padded internally to a
        multiple of ``block_b``.
      bias: (H, N, N) additive attention bias (float32).
      block_b: batch tile per program.
      interpret: interpreter mode (CPU tests).

    Returns:
      (B, N, H, D) in q's dtype.
    """
    return _fused_attention_vjp(q, k, v, bias, block_b, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_vjp(q, k, v, bias, block_b, interpret):
    return _fused_forward(q, k, v, bias, block_b, interpret)


def _fused_attention_fwd(q, k, v, bias, block_b, interpret):
    return _fused_forward(q, k, v, bias, block_b, interpret), (q, k, v, bias)


def _fused_attention_bwd(block_b, interpret, res, g):
    q, k, v, bias = res
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32) * scale,
        k.astype(jnp.float32), preferred_element_type=jnp.float32,
    ) + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, g32)
    dp = jnp.einsum("bnhd,bmhd->bhnm", g32, v.astype(jnp.float32))
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", dlogits, q.astype(jnp.float32)) * scale
    dbias = jnp.sum(dlogits, axis=0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


_fused_attention_vjp.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _fused_forward(q, k, v, bias, block_b: int, interpret: bool):
    b, n, h, d = q.shape
    scale = d ** -0.5
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    # (B, N, H, D) -> (B, H, N, D): Mosaic wants the (N, D) plane as the
    # trailing block dims; the transpose is one cheap XLA pass
    q = jnp.moveaxis(q, 2, 1)
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    if pad:
        padding = [(0, pad), (0, 0), (0, 0), (0, 0)]
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)

    # grid over (batch tiles, heads): (bt, 1, N, D) blocks keep VMEM tiny so
    # Mosaic pipelines deeply; trailing (N, D) dims satisfy the tiling rule
    grid = ((b + pad) // block_b, h)
    spec = pl.BlockSpec(
        (block_b, 1, n, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # f32 inputs at block_b=16 need >16MB scoped vmem
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, bias.astype(jnp.float32))
    return jnp.moveaxis(out[:b] if pad else out, 1, 2)


# ---------------------------------------------------------------------------
# v4: qkv-fused kernel — takes the raw (B, N, 3C) qkv projection, splits and
# de-interleaves heads INSIDE VMEM. Kills the four XLA HBM transposes and the
# three q/k/v HBM slice materializations of the (B, N, H, D) path.
# ---------------------------------------------------------------------------

def _attn_qkv_kernel(qkv_ref, bias_ref, out_ref, *, heads: int, scale: float):
    bt, n, three_c = qkv_ref.shape
    c = three_c // 3
    d = c // heads
    x = qkv_ref[...]
    bias = bias_ref[...].astype(jnp.float32)  # (H, N, N)

    outs = []
    for h in range(heads):  # static unroll; lane slices are VMEM-local
        q = x[:, :, h * d : (h + 1) * d] * scale
        k = x[:, :, c + h * d : c + (h + 1) * d]
        v = x[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = logits + bias[h][None]
        # softmax with the division folded past the value matmul: e@v is
        # computed on unnormalized exps (better bf16 dynamic range than
        # p=e/sum) and scaled by 1/sum on the (n, d) output instead of the
        # (n, n) probabilities — fewer VPU divides, identical math
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            e.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(av * recip)
    out_ref[...] = jnp.concatenate(outs, axis=2).astype(out_ref.dtype)


def _attn_qkv_kernel_packed(qkv_ref, bias_ref, out_ref, *, heads: int,
                            scale: float):
    """Head-pair PACKED p·v: the value matmul of two heads runs as ONE
    (n, 2n)×(2n, 2d) block-diagonal matmul filling all 128 lanes (d=64
    leaves half the MXU lanes idle per head). The q·kᵀ matmuls stay
    per-head (contraction packing would mix heads). Experimental — see
    BENCH.md for the measurement that decides its fate."""
    bt, n, three_c = qkv_ref.shape
    c = three_c // 3
    d = c // heads
    x = qkv_ref[...]
    bias = bias_ref[...].astype(jnp.float32)

    outs = []
    for hp in range(heads // 2):
        h0, h1 = 2 * hp, 2 * hp + 1
        es, recips, vs = [], [], []
        for h in (h0, h1):
            q = x[:, :, h * d : (h + 1) * d] * scale
            k = x[:, :, c + h * d : c + (h + 1) * d]
            vs.append(x[:, :, 2 * c + h * d : 2 * c + (h + 1) * d])
            logits = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + bias[h][None]
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            recips.append(1.0 / jnp.sum(e, axis=-1, keepdims=True))
            es.append(e.astype(x.dtype))
        zeros = jnp.zeros_like(vs[0])
        vp = jnp.concatenate(
            [jnp.concatenate([vs[0], zeros], axis=2),
             jnp.concatenate([zeros, vs[1]], axis=2)],
            axis=1,
        )  # (bt, 2n, 2d) block-diagonal
        ep = jnp.concatenate(es, axis=2)  # (bt, n, 2n)
        av = jax.lax.dot_general(
            ep, vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bt, n, 2d): lanes 0..d-1 head h0, d..2d-1 head h1
        rp = jnp.concatenate(
            [jnp.broadcast_to(recips[0], (bt, n, d)),
             jnp.broadcast_to(recips[1], (bt, n, d))],
            axis=2,
        )
        outs.append(av * rp)
    out_ref[...] = jnp.concatenate(outs, axis=2).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_b", "interpret", "save_probs",
                     "packed_pv"),
)
def fused_attention_qkv(qkv, bias, heads: int, block_b: int = 8,
                        interpret: bool = False, save_probs: bool = False,
                        packed_pv: bool = False):
    """softmax(q·kᵀ/√D + bias)·v straight from the packed qkv projection.

    Differentiable. Two VJP strategies:
      * default: backward recomputes logits+softmax from the saved qkv in
        f32 XLA (cheapest forward — nothing extra leaves the kernel);
      * ``save_probs=True`` (the TRAINING path): the kernel additionally
        emits the softmax probabilities (bf16), so the backward skips the
        f32 logits recompute entirely and runs every matmul in bf16
        (measurements in BENCH.md).

    Args:
      qkv: (B, N, 3·C) — the qkv Dense output, heads interleaved as
        (H, D) within each C block.
      bias: (H, N, N) additive bias (float32).
      heads: static head count.

    Returns:
      (B, N, C) attention output in qkv's dtype.
    """
    if save_probs:
        return _fused_qkv_train_vjp(qkv, bias, heads, block_b, interpret)
    if packed_pv:
        assert heads % 2 == 0, "packed_pv needs an even head count"
        # same outputs as the default kernel (selfcheck pins them equal),
        # so the recompute backward below applies unchanged
        return _fused_qkv_packed_vjp(qkv, bias, heads, block_b, interpret)
    return _fused_qkv_vjp(qkv, bias, heads, block_b, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_qkv_vjp(qkv, bias, heads, block_b, interpret):
    return _fused_qkv_forward(qkv, bias, heads, block_b, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_qkv_packed_vjp(qkv, bias, heads, block_b, interpret):
    return _fused_qkv_forward(qkv, bias, heads, block_b, interpret,
                              kernel=_attn_qkv_kernel_packed)


def _fused_qkv_packed_fwd(qkv, bias, heads, block_b, interpret):
    return (
        _fused_qkv_forward(qkv, bias, heads, block_b, interpret,
                           kernel=_attn_qkv_kernel_packed),
        (qkv, bias),
    )


def _split_qkv(qkv, heads):
    b, n, three_c = qkv.shape
    c = three_c // 3
    d = c // heads
    q = qkv[:, :, :c].reshape(b, n, heads, d)
    k = qkv[:, :, c : 2 * c].reshape(b, n, heads, d)
    v = qkv[:, :, 2 * c :].reshape(b, n, heads, d)
    return q, k, v


def _fused_qkv_fwd(qkv, bias, heads, block_b, interpret):
    return _fused_qkv_forward(qkv, bias, heads, block_b, interpret), (qkv, bias)


def _fused_qkv_bwd(heads, block_b, interpret, res, g):
    qkv, bias = res
    b, n, three_c = qkv.shape
    c = three_c // 3
    q, k, v = _split_qkv(qkv, heads)
    g4 = g.reshape(b, n, heads, c // heads)
    dq, dk, dv, dbias = _fused_attention_bwd(block_b, interpret, (q, k, v, bias), g4)
    dqkv = jnp.concatenate(
        [dq.reshape(b, n, c), dk.reshape(b, n, c), dv.reshape(b, n, c)], axis=2
    )
    return dqkv.astype(qkv.dtype), dbias


_fused_qkv_vjp.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)
_fused_qkv_packed_vjp.defvjp(_fused_qkv_packed_fwd, _fused_qkv_bwd)


def _attn_qkv_probs_kernel(qkv_ref, bias_ref, out_ref, probs_ref, *,
                           heads: int, scale: float):
    """Same as ``_attn_qkv_kernel`` but also emits softmax probabilities
    (bf16) for the saved-activation training backward."""
    bt, n, three_c = qkv_ref.shape
    c = three_c // 3
    d = c // heads
    x = qkv_ref[...]
    bias = bias_ref[...].astype(jnp.float32)

    outs = []
    for h in range(heads):
        q = x[:, :, h * d : (h + 1) * d] * scale
        k = x[:, :, c + h * d : c + (h + 1) * d]
        v = x[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bias[h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            e.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(av * recip)
        probs_ref[:, h, :, :] = (e * recip).astype(probs_ref.dtype)
    out_ref[...] = jnp.concatenate(outs, axis=2).astype(out_ref.dtype)


def _fused_qkv_probs_forward(qkv, bias, heads, block_b, interpret):
    b, n, three_c = qkv.shape
    c = three_c // 3
    d = c // heads
    scale = d ** -0.5
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        qkv = jnp.pad(qkv, [(0, pad), (0, 0), (0, 0)])
    out, probs = pl.pallas_call(
        functools.partial(_attn_qkv_probs_kernel, heads=heads, scale=scale),
        grid=((b + pad) // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n, three_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, heads, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b + pad, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b + pad, heads, n, n), jnp.bfloat16),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, bias.astype(jnp.float32))
    if pad:
        return out[:b], probs[:b]
    return out, probs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_qkv_train_vjp(qkv, bias, heads, block_b, interpret):
    out, _ = _fused_qkv_probs_forward(qkv, bias, heads, block_b, interpret)
    return out


def _fused_qkv_train_fwd(qkv, bias, heads, block_b, interpret):
    out, probs = _fused_qkv_probs_forward(qkv, bias, heads, block_b,
                                          interpret)
    return out, (qkv, probs)


def _fused_qkv_train_bwd(heads, block_b, interpret, res, g):
    """Backward from SAVED probabilities: no logits/softmax recompute, and
    every matmul runs in bf16 with f32 accumulation (gradients tolerate the
    reduced weight precision; the f32-recompute path remains the default
    for parity-sensitive uses)."""
    qkv, probs = res
    b, n, three_c = qkv.shape
    c = three_c // 3
    d = c // heads
    scale = d ** -0.5
    q, k, v = _split_qkv(qkv, heads)
    g4 = g.reshape(b, n, heads, d).astype(jnp.bfloat16)
    p16 = probs
    v16 = v.astype(jnp.bfloat16)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p16, g4,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bnhd,bmhd->bhnm", g4, v16,
                    preferred_element_type=jnp.float32)
    p32 = p16.astype(jnp.float32)
    dlogits = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    dbias = jnp.sum(dlogits, axis=0)
    dl16 = dlogits.astype(jnp.bfloat16)
    dq = jnp.einsum("bhnm,bmhd->bnhd", dl16, k.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", dl16, q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * scale
    dqkv = jnp.concatenate(
        [dq.reshape(b, n, c), dk.reshape(b, n, c), dv.reshape(b, n, c)],
        axis=2,
    )
    return dqkv.astype(qkv.dtype), dbias.astype(jnp.float32)


_fused_qkv_train_vjp.defvjp(_fused_qkv_train_fwd, _fused_qkv_train_bwd)


def _fused_qkv_forward(qkv, bias, heads, block_b, interpret,
                       kernel=_attn_qkv_kernel):
    b, n, three_c = qkv.shape
    c = three_c // 3
    d = c // heads
    scale = d ** -0.5
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        qkv = jnp.pad(qkv, [(0, pad), (0, 0), (0, 0)])
    out = pl.pallas_call(
        functools.partial(kernel, heads=heads, scale=scale),
        grid=((b + pad) // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n, three_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, n, c), qkv.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # default 16MB scoped-vmem caps block_b at 2; raising it lets
            # bigger batch tiles amortize per-program matmul overheads
            # (~1ms/block at B=2048, measured)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, bias.astype(jnp.float32))
    return out[:b] if pad else out
