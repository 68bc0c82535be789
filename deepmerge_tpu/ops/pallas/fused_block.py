"""Fused transformer-block Pallas kernel (TPU).

One program computes a whole CrossScaleBlock (``nets/ShfitScaleFormer.py:
158-184`` semantics, dropout-free):

  LN1 → qkv GEMM → per-head biased attention (softmax in VMEM, division
  folded past the value matmul) → proj GEMM → +residual → LN2 → MLP
  up-GEMM → GELU → down-GEMM → +residual

with every weight VMEM-resident across grid steps and NO intermediate
touching HBM. Measured vs the XLA sequence (which already uses the fused
attention kernel) at B=2048, N=192, D=768 on v5e: the attention half alone
42.0 → 18.5+mlp; see BENCH.md. The win is the eliminated LayerNorms,
residual round-trips and qkv/attention-output HBM traffic — the GEMMs
themselves were already at MXU peak under XLA.

Differentiable via custom VJP: the backward re-executes the block with
plain XLA ops (the same economics as the fused-attention VJP — training
batches are small).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):
    m = x.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    v = ((m - mu) ** 2).mean(-1, keepdims=True)
    return (m - mu) * lax.rsqrt(v + eps) * scale + bias


def _attn_inner(qkv, b32, *, heads: int, dtype):
    """Per-head biased softmax attention on a VMEM-resident (bt, n, 3c)
    qkv tile. Static head unroll; lane slices are VMEM-local."""
    bt, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    scale = d ** -0.5
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d] * scale
        k = qkv[:, :, c + h * d : c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        logits = lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + b32[h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        av = lax.dot_general(
            e.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(av * recip)
    return jnp.concatenate(outs, axis=2).astype(dtype)


def _block_math(xi, l1s, l1b, wq, bq, b32, wp, bp, l2s, l2b,
                wu, bu, wd, bd, *, heads: int, exact_gelu: bool):
    """One pre-LN block on a VMEM-resident (bt, n, c) tile. All params are
    loaded values; ``b32`` is the (H, N, N) float32 attention bias."""
    bt, n, c = xi.shape
    y = _ln(xi, l1s, l1b).astype(xi.dtype).reshape(bt * n, c)
    qkv = (
        jnp.dot(y, wq, preferred_element_type=jnp.float32)
        .astype(xi.dtype) + bq
    ).reshape(bt, n, 3 * c)
    a = _attn_inner(qkv, b32, heads=heads, dtype=xi.dtype)
    p = (
        jnp.dot(a.reshape(bt * n, c), wp,
                preferred_element_type=jnp.float32).astype(xi.dtype)
        + bp
    ).reshape(bt, n, c)
    r = xi + p
    y2 = _ln(r, l2s, l2b).astype(xi.dtype).reshape(bt * n, c)
    h1 = jnp.dot(y2, wu, preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(
        h1 + bu.astype(jnp.float32), approximate=not exact_gelu
    )
    o = (
        jnp.dot(h1.astype(xi.dtype), wd,
                preferred_element_type=jnp.float32).astype(xi.dtype)
        + bd
    ).reshape(bt, n, c)
    return r + o


# ---------------------------------------------------------------------------
# w8a8 quantized path (inference). Per-output-channel symmetric int8 weights
# + dynamic per-row symmetric activation quantization, int8x8->int32 MXU
# dots (1.9x the bf16 rate on v5e — BENCH.md round-3 int8 probes). The
# attention inner loop (q@k / p@v, d=64) stays bf16: it is ~15% of block
# time and numerically the most delicate part.
# ---------------------------------------------------------------------------


def quantize_weight(w):
    """(K, N) float weight → (int8 (K, N), float32 per-column scale (N,)).

    Symmetric per-output-channel: q = round(w / s), s = colmax|w| / 127.
    """
    wf = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=0)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_block_params(params):
    """Megakernel 13-tuple → w8a8 17-tuple (int8 weights + col scales)."""
    (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = params
    qq, sq = quantize_weight(wq)
    qp, sp = quantize_weight(wp)
    qu, su = quantize_weight(wu)
    qd, sd = quantize_weight(wd)
    return (l1s.astype(jnp.float32), l1b.astype(jnp.float32), qq, sq, bq,
            bias, qp, sp, bp, l2s.astype(jnp.float32),
            l2b.astype(jnp.float32), qu, su, bu, qd, sd, bd)


def _qdot(y, wq, s_col):
    """f32 (M, K) × int8 (K, N) with dynamic per-row activation quant.

    Returns f32 (M, N) = dequantized int32 accumulator. Row scale is
    abs-max/127 of the f32 activations; the dot runs on the int8 MXU path.
    """
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sr = jnp.where(amax > 0, amax / 127.0, 1.0)
    yq = jnp.clip(jnp.round(y / sr), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sr * s_col[None, :]


def _block_math_q8(xi, l1s, l1b, wq, sq, bq, b32, wp, sp, bp, l2s, l2b,
                   wu, su, bu, wd, sd, bd, *, heads: int, exact_gelu: bool):
    """w8a8 variant of ``_block_math``: the four big GEMMs (qkv, proj,
    mlp-up, mlp-down) run int8×int8→int32; attention stays bf16."""
    bt, n, c = xi.shape
    y = _ln(xi, l1s, l1b).reshape(bt * n, c)  # f32
    qkv = (
        _qdot(y, wq, sq).astype(xi.dtype) + bq
    ).reshape(bt, n, 3 * c)
    a = _attn_inner(qkv, b32, heads=heads, dtype=xi.dtype)
    p = (
        _qdot(a.reshape(bt * n, c).astype(jnp.float32), wp, sp)
        .astype(xi.dtype) + bp
    ).reshape(bt, n, c)
    r = xi + p
    y2 = _ln(r, l2s, l2b).reshape(bt * n, c)  # f32
    h1 = jax.nn.gelu(
        _qdot(y2, wu, su) + bu.astype(jnp.float32),
        approximate=not exact_gelu,
    )
    o = (
        _qdot(h1, wd, sd).astype(xi.dtype) + bd
    ).reshape(bt, n, c)
    return r + o


def _block_kernel(x_ref, l1s, l1b, wq, bq, bias_ref, wp, bp, l2s, l2b,
                  wu, bu, wd, bd, out_ref, *, heads: int, exact_gelu: bool):
    out_ref[...] = _block_math(
        x_ref[...], l1s[...], l1b[...], wq[...], bq[...],
        bias_ref[...].astype(jnp.float32), wp[...], bp[...], l2s[...],
        l2b[...], wu[...], bu[...], wd[...], bd[...],
        heads=heads, exact_gelu=exact_gelu,
    )


def _block_kernel_q8(x_ref, l1s, l1b, wq, sq, bq, bias_ref, wp, sp, bp,
                     l2s, l2b, wu, su, bu, wd, sd, bd, out_ref, *,
                     heads: int, exact_gelu: bool):
    out_ref[...] = _block_math_q8(
        x_ref[...], l1s[...], l1b[...], wq[...], sq[...], bq[...],
        bias_ref[...].astype(jnp.float32), wp[...], sp[...], bp[...],
        l2s[...], l2b[...], wu[...], su[...], bu[...], wd[...], sd[...],
        bd[...], heads=heads, exact_gelu=exact_gelu,
    )


def _chain_kernel(x_ref, *refs, heads: int, exact_gelu: bool, depth: int,
                  quant: bool = False):
    """``depth`` blocks back-to-back on one VMEM-resident tile: the
    intermediate sequence never touches HBM between blocks (the short
    stage-1/2 sequences pay mostly memory traffic per block under the
    one-kernel-per-block scheme)."""
    out_ref = refs[-1]
    params = refs[:-1]
    width = 17 if quant else 13
    xi = x_ref[...]
    for b in range(depth):  # static unroll
        p = [r[...] for r in params[width * b : width * (b + 1)]]
        if quant:
            (l1s, l1b, wq, sq, bq, bias, wp, sp, bp, l2s, l2b,
             wu, su, bu, wd, sd, bd) = p
            xi = _block_math_q8(
                xi, l1s, l1b, wq, sq, bq, bias.astype(jnp.float32),
                wp, sp, bp, l2s, l2b, wu, su, bu, wd, sd, bd,
                heads=heads, exact_gelu=exact_gelu,
            ).astype(x_ref.dtype)
        else:
            (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = p
            xi = _block_math(
                xi, l1s, l1b, wq, bq, bias.astype(jnp.float32), wp, bp,
                l2s, l2b, wu, bu, wd, bd,
                heads=heads, exact_gelu=exact_gelu,
            ).astype(x_ref.dtype)
    out_ref[...] = xi


def _xla_block(x, params, heads: int, exact_gelu: bool):
    """Pure-XLA reference implementation (used by the backward pass)."""
    (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = params
    b, n, c = x.shape
    d = c // heads
    y = _ln(x, l1s, l1b).astype(x.dtype)
    qkv = (y.reshape(b * n, c) @ wq).astype(x.dtype).reshape(b, n, 3 * c) + bq
    q = qkv[:, :, :c].reshape(b, n, heads, d) * (d ** -0.5)
    k = qkv[:, :, c : 2 * c].reshape(b, n, heads, d)
    v = qkv[:, :, 2 * c :].reshape(b, n, heads, d)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits + bias[None].astype(jnp.float32), axis=-1)
    a = jnp.einsum("bhnm,bmhd->bnhd", p.astype(x.dtype), v,
                   preferred_element_type=jnp.float32)
    a = a.reshape(b, n, c).astype(x.dtype)
    r = x + ((a.reshape(b * n, c) @ wp).astype(x.dtype).reshape(b, n, c) + bp)
    y2 = _ln(r, l2s, l2b).astype(x.dtype)
    h1 = (y2.reshape(b * n, c) @ wu).astype(jnp.float32) + bu.astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=not exact_gelu)
    o = (h1.astype(x.dtype) @ wd).astype(x.dtype).reshape(b, n, c) + bd
    return r + o


@functools.partial(
    jax.jit,
    static_argnames=("heads", "exact_gelu", "block_b", "interpret", "quant"),
)
def fused_block(x, params, heads: int, exact_gelu: bool = False,
                block_b: int = 2, interpret: bool = False,
                quant: bool = False):
    """Whole pre-LN transformer block in one Pallas kernel.

    Args:
      x: (B, N, C).
      params: tuple (ln1_scale, ln1_bias, w_qkv, b_qkv, attn_bias(H,N,N),
        w_proj, b_proj, ln2_scale, ln2_bias, w_up, b_up, w_dn, b_dn) —
        LN params float32, weights in x's dtype. With ``quant=True``, the
        17-tuple from ``quantize_block_params`` instead.
      heads: static head count.
      exact_gelu: erf GELU (torch parity) vs tanh approximation. NOTE:
        Mosaic has no erf/erfc lowering, so exact_gelu=True only works in
        interpret mode — the model layer routes exact-GELU configs to the
        XLA path (models/s2former.py CrossScaleBlock).
      block_b: samples per program (VMEM tile).
      quant: w8a8 — int8 MXU dots for the four big GEMMs (the DEFAULT
        serving path: 26.1 vs 37.5 ms/block on v5e, parity-gated per
        EVAL.md; BENCH.md round-3 int8 section). Inference-only: not
        differentiable.

    Returns (B, N, C) in x's dtype. Differentiable (XLA recompute VJP)
    unless ``quant``.
    """
    if quant:
        return _fused_block_forward(x, params, heads, exact_gelu, block_b,
                                    interpret, quant=True)
    return _fused_block_vjp(x, params, heads, exact_gelu, block_b, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_block_vjp(x, params, heads, exact_gelu, block_b, interpret):
    return _fused_block_forward(x, params, heads, exact_gelu, block_b,
                                interpret)


def _fused_block_fwd(x, params, heads, exact_gelu, block_b, interpret):
    out = _fused_block_forward(x, params, heads, exact_gelu, block_b,
                               interpret)
    return out, (x, params)


def _fused_block_bwd(heads, exact_gelu, block_b, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _xla_block(x_, p_, heads, exact_gelu), x, params
    )
    return vjp(g)


_fused_block_vjp.defvjp(_fused_block_fwd, _fused_block_bwd)


def _xla_chain(x, params_list, heads: int, exact_gelu: bool):
    for p in params_list:
        x = _xla_block(x, p, heads, exact_gelu)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("heads", "exact_gelu", "block_b", "interpret", "quant"),
)
def fused_block_chain(x, params_list, heads: int, exact_gelu: bool = False,
                      block_b: int = 2, interpret: bool = False,
                      quant: bool = False):
    """A WHOLE stage — ``depth`` pre-LN blocks — in one Pallas kernel.

    Every block's weights are VMEM-resident for the kernel's lifetime and
    the (B, N, C) sequence never round-trips through HBM between blocks.
    Sized for the short stages of the S2Former pyramid
    (``nets/ShfitScaleFormer.py:904-916``: four N=48 blocks, two N=12
    blocks): stage-1's four blocks hold ~57 MB of bf16 weights — fits VMEM
    with room for the working set.

    Args:
      x: (B, N, C).
      params_list: tuple of per-block 13-tuples (same layout as
        ``fused_block``) — or 17-tuples from ``quantize_block_params``
        with ``quant=True``.
      heads / exact_gelu / block_b / interpret / quant: as in
        ``fused_block``.

    Returns (B, N, C) in x's dtype. Differentiable (XLA recompute VJP over
    the whole chain) unless ``quant`` (inference-only).
    """
    params_list = tuple(tuple(p) for p in params_list)
    if quant:
        if len(params_list) == 1:
            return _fused_block_forward(x, params_list[0], heads, exact_gelu,
                                        block_b, interpret, quant=True)
        return _fused_chain_forward(x, params_list, heads, exact_gelu,
                                    block_b, interpret, quant=True)
    if len(params_list) == 1:
        return _fused_block_vjp(x, params_list[0], heads, exact_gelu,
                                block_b, interpret)
    return _fused_chain_vjp(x, params_list, heads, exact_gelu, block_b,
                            interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_chain_vjp(x, params_list, heads, exact_gelu, block_b, interpret):
    return _fused_chain_forward(x, params_list, heads, exact_gelu, block_b,
                                interpret)


def _fused_chain_fwd(x, params_list, heads, exact_gelu, block_b, interpret):
    out = _fused_chain_forward(x, params_list, heads, exact_gelu, block_b,
                               interpret)
    return out, (x, params_list)


def _fused_chain_bwd(heads, exact_gelu, block_b, interpret, res, g):
    x, params_list = res
    _, vjp = jax.vjp(
        lambda x_, p_: _xla_chain(x_, p_, heads, exact_gelu), x, params_list
    )
    return vjp(g)


_fused_chain_vjp.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def _block_param_specs(p, quant):
    """(in_specs, flat_args) for one block's params (13- or 17-tuple)."""
    whole = lambda i: (0, 0)
    VM = pl.BlockSpec(memory_space=pltpu.VMEM)
    W = lambda a: pl.BlockSpec(a.shape, whole, memory_space=pltpu.VMEM)
    if quant:
        (l1s, l1b, wq, sq, bq, bias, wp, sp, bp, l2s, l2b,
         wu, su, bu, wd, sd, bd) = p
        specs = [VM, VM, W(wq), VM, VM, VM, W(wp), VM, VM, VM, VM,
                 W(wu), VM, VM, W(wd), VM, VM]
        flat = [l1s, l1b, wq, sq, bq, bias.astype(jnp.float32), wp, sp, bp,
                l2s, l2b, wu, su, bu, wd, sd, bd]
    else:
        (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = p
        specs = [VM, VM, W(wq), VM, VM, W(wp), VM, VM, VM,
                 W(wu), VM, W(wd), VM]
        flat = [l1s, l1b, wq, bq, bias.astype(jnp.float32), wp, bp,
                l2s, l2b, wu, bu, wd, bd]
    return specs, flat


def _fused_chain_forward(x, params_list, heads, exact_gelu, block_b,
                         interpret, quant=False):
    b, n, c = x.shape
    depth = len(params_list)
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    in_specs = [
        pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flat = [x]
    for p in params_list:
        specs_p, flat_p = _block_param_specs(p, quant)
        in_specs += specs_p
        flat += flat_p
    out = pl.pallas_call(
        functools.partial(_chain_kernel, heads=heads, exact_gelu=exact_gelu,
                          depth=depth, quant=quant),
        grid=((b + pad) // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, n, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(*flat)
    return out[:b] if pad else out


def _fused_block_forward(x, params, heads, exact_gelu, block_b, interpret,
                         quant=False):
    b, n, c = x.shape
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    specs_p, flat_p = _block_param_specs(params, quant)
    kern = _block_kernel_q8 if quant else _block_kernel
    out = pl.pallas_call(
        functools.partial(kern, heads=heads, exact_gelu=exact_gelu),
        grid=((b + pad) // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *specs_p,
        ],
        out_specs=pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, n, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x, *flat_p)
    return out[:b] if pad else out
