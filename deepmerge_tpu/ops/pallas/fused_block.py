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

Differentiable via custom VJP: the TRAIN forward kernel additionally emits
qkv / normalized softmax probs / pre-GELU / the post-attention residual,
and the backward (plain XLA ops) consumes them with zero forward recompute
(``_fused_block_bwd``; the stage-CHAIN variant keeps the round-2 recompute
VJP — training runs per-block kernels, ``train/loop._training_model``).
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


def _attn_inner_q8(qkv, b32, *, heads: int, dtype):
    """int8-MXU variant of ``_attn_inner``: both attention matmuls run
    int8×int8→int32.

    q@kᵀ contracts over d, so per-ROW symmetric scales on q and k are
    separable into the (n, m) logit matrix. For p@v the softmax numerator
    e = exp(logit − rowmax) lies in (0, 1] with every row max EXACTLY 1, so
    probs take a FIXED 1/127 scale (no amax pass); v contracts over m, so
    its scale must be per-COLUMN (per d lane) to stay separable. The
    softmax denominator is recomputed from the QUANTIZED probs — the output
    is then an exact convex combination under the quantized weights rather
    than carrying the quantization as an unnormalized bias.
    """
    bt, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    scale = d ** -0.5
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d].astype(jnp.float32)
        k = qkv[:, :, c + h * d : c + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d].astype(jnp.float32)
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        sq = jnp.where(qa > 0, qa / 127.0, 1.0)
        qi = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
        ka = jnp.max(jnp.abs(k), axis=-1, keepdims=True)
        sk = jnp.where(ka > 0, ka / 127.0, 1.0)
        ki = jnp.clip(jnp.round(k / sk), -127, 127).astype(jnp.int8)
        logits = lax.dot_general(
            qi, ki, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        logits = logits * (sq * scale) * jnp.swapaxes(sk, 1, 2) + b32[h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        pq = jnp.round(e * 127.0).astype(jnp.int8)  # e ∈ (0, 1]: no clip
        va = jnp.max(jnp.abs(v), axis=1, keepdims=True)
        sv = jnp.where(va > 0, va / 127.0, 1.0)
        vi = jnp.clip(jnp.round(v / sv), -127, 127).astype(jnp.int8)
        av = lax.dot_general(
            pq, vi, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        recip = 1.0 / jnp.sum(
            pq.astype(jnp.float32), axis=-1, keepdims=True
        )
        outs.append(av * recip * sv)
    return jnp.concatenate(outs, axis=2).astype(dtype)


def _attn_inner_q8s(qkv, b32, *, heads: int, dtype, s_q, s_k, s_v):
    """``_attn_inner_q8`` with CALIBRATED static operand scales.

    The r4 in-situ measurement showed dynamic int8 attention LOSES (37.6
    vs 26.9 ms/block): the per-head amax chains at d=64 cost more than the
    int8 dots return. With static scales the quantize step collapses to a
    scalar multiply + round + clip per operand — no reductions, no
    row-wise divides. Probs keep the exact fixed-1/127 scheme (softmax
    numerator rows peak at exactly 1), and the denominator is recomputed
    from the QUANTIZED probs so the output stays an exact convex
    combination under the quantized weights.
    """
    bt, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    scale = d ** -0.5
    rq, rk, rv = 1.0 / s_q, 1.0 / s_k, 1.0 / s_v
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d].astype(jnp.float32)
        k = qkv[:, :, c + h * d : c + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d].astype(jnp.float32)
        qi = jnp.clip(jnp.round(q * rq), -127, 127).astype(jnp.int8)
        ki = jnp.clip(jnp.round(k * rk), -127, 127).astype(jnp.int8)
        logits = lax.dot_general(
            qi, ki, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (s_q * s_k * scale) + b32[h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        pq = jnp.round(e * 127.0).astype(jnp.int8)  # e ∈ (0, 1]: no clip
        vi = jnp.clip(jnp.round(v * rv), -127, 127).astype(jnp.int8)
        av = lax.dot_general(
            pq, vi, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        recip = 1.0 / jnp.sum(
            pq.astype(jnp.float32), axis=-1, keepdims=True
        )
        outs.append(av * recip * s_v)
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


def quantize_block_params(params, act_amax=None):
    """Megakernel 13-tuple → w8a8 17-tuple (int8 weights + col scales).

    With ``act_amax`` — a (7,) float32 of CALIBRATED activation abs-maxes
    for the four GEMM inputs (LN1-out, attention-out, LN2-out, post-GELU)
    plus the three attention operands (q, k, v), see ``block_act_amax`` —
    an 18th entry of STATIC scales (``amax/127``) is appended and the
    kernel skips the per-row dynamic amax chain entirely (``_qdot_static``;
    ``_attn_inner_q8s`` for the attention operands under ``quant_attn``).
    Out-of-calibration activations saturate at ±127 (symmetric clip), like
    every static-scale int8 scheme.
    """
    (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = params
    qq, sq = quantize_weight(wq)
    qp, sp = quantize_weight(wp)
    qu, su = quantize_weight(wu)
    qd, sd = quantize_weight(wd)
    out = (l1s.astype(jnp.float32), l1b.astype(jnp.float32), qq, sq, bq,
           bias, qp, sp, bp, l2s.astype(jnp.float32),
           l2b.astype(jnp.float32), qu, su, bu, qd, sd, bd)
    if act_amax is None:
        return out
    amax = act_amax.astype(jnp.float32)
    s_act = jnp.where(amax > 0, amax / 127.0, 1.0)
    return out + (s_act,)


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


def _qdot_static(y, wq, s_col, sr):
    """``_qdot`` with a CALIBRATED static row scale ``sr`` (f32 scalar).

    Skips the per-row abs-max reduction and the row-wise divide — the
    quantize step collapses to one scalar-broadcast multiply and the
    dequant scale folds into the column scales. Values beyond the
    calibrated range saturate at ±127.
    """
    yq = jnp.clip(jnp.round(y * (1.0 / sr)), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sr * s_col)[None, :]


def _block_math_q8(xi, l1s, l1b, wq, sq, bq, b32, wp, sp, bp, l2s, l2b,
                   wu, su, bu, wd, sd, bd, *, heads: int, exact_gelu: bool,
                   quant_attn: bool = False, s_act=None):
    """w8a8 variant of ``_block_math``: the four big GEMMs (qkv, proj,
    mlp-up, mlp-down) run int8×int8→int32; attention stays bf16 unless
    ``quant_attn`` routes its two matmuls to the int8 MXU too.

    ``s_act``: optional 4 STATIC activation scales (scalars, one per GEMM
    input in order qkv/proj/up/down) — replaces the dynamic per-row amax
    chain with ``_qdot_static``.
    """
    bt, n, c = xi.shape
    if s_act is None:
        qd = lambda t, w, s, i: _qdot(t, w, s)
    else:
        qd = lambda t, w, s, i: _qdot_static(t, w, s, s_act[i])
    y = _ln(xi, l1s, l1b).reshape(bt * n, c)  # f32
    qkv = (
        qd(y, wq, sq, 0).astype(xi.dtype) + bq
    ).reshape(bt, n, 3 * c)
    if quant_attn and s_act is not None:
        attn = functools.partial(_attn_inner_q8s, s_q=s_act[4],
                                 s_k=s_act[5], s_v=s_act[6])
    elif quant_attn:
        attn = _attn_inner_q8
    else:
        attn = _attn_inner
    a = attn(qkv, b32, heads=heads, dtype=xi.dtype)
    p = (
        qd(a.reshape(bt * n, c).astype(jnp.float32), wp, sp, 1)
        .astype(xi.dtype) + bp
    ).reshape(bt, n, c)
    r = xi + p
    y2 = _ln(r, l2s, l2b).reshape(bt * n, c)  # f32
    h1 = jax.nn.gelu(
        qd(y2, wu, su, 2) + bu.astype(jnp.float32),
        approximate=not exact_gelu,
    )
    o = (
        qd(h1, wd, sd, 3).astype(xi.dtype) + bd
    ).reshape(bt, n, c)
    return r + o


def _block_math_train(xi, l1s, l1b, wq, bq, b32, wp, bp, l2s, l2b,
                      wu, bu, wd, bd, *, heads: int, exact_gelu: bool):
    """``_block_math`` that ALSO returns the backward's residuals.

    Saved per tile (all in x's dtype): qkv, NORMALIZED softmax probs
    (concatenated per head along lanes), the pre-GELU MLP activation
    (h1 + b_up) and the post-attention residual r. Together with x these
    let the backward run with ZERO forward recompute (the LayerNorm
    normalizations are re-derived from x / r — two cheap VPU reductions —
    instead of storing two more (bt, n, c) tensors).
    """
    bt, n, c = xi.shape
    d = c // heads
    scale = d ** -0.5
    y = _ln(xi, l1s, l1b).astype(xi.dtype).reshape(bt * n, c)
    qkv = (
        jnp.dot(y, wq, preferred_element_type=jnp.float32)
        .astype(xi.dtype) + bq
    ).reshape(bt, n, 3 * c)
    outs, ps = [], []
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
        p = (e * recip).astype(xi.dtype)
        ps.append(p)
        av = lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(av.astype(xi.dtype))
    a = jnp.concatenate(outs, axis=2)
    p_cat = jnp.concatenate(ps, axis=2)
    pr = (
        jnp.dot(a.reshape(bt * n, c), wp,
                preferred_element_type=jnp.float32).astype(xi.dtype)
        + bp
    ).reshape(bt, n, c)
    r = xi + pr
    y2 = _ln(r, l2s, l2b).astype(xi.dtype).reshape(bt * n, c)
    gin = (
        jnp.dot(y2, wu, preferred_element_type=jnp.float32)
        + bu.astype(jnp.float32)
    )
    act = jax.nn.gelu(gin, approximate=not exact_gelu)
    o = (
        jnp.dot(act.astype(xi.dtype), wd,
                preferred_element_type=jnp.float32).astype(xi.dtype)
        + bd
    ).reshape(bt, n, c)
    return (
        r + o, qkv, p_cat,
        gin.reshape(bt, n, wu.shape[1]).astype(xi.dtype), r,
    )


def _block_kernel(x_ref, l1s, l1b, wq, bq, bias_ref, wp, bp, l2s, l2b,
                  wu, bu, wd, bd, out_ref, *, heads: int, exact_gelu: bool):
    out_ref[...] = _block_math(
        x_ref[...], l1s[...], l1b[...], wq[...], bq[...],
        bias_ref[...].astype(jnp.float32), wp[...], bp[...], l2s[...],
        l2b[...], wu[...], bu[...], wd[...], bd[...],
        heads=heads, exact_gelu=exact_gelu,
    )


def _block_kernel_q8(x_ref, *refs, heads: int, exact_gelu: bool,
                     quant_attn: bool = False, static_scales: bool = False):
    out_ref = refs[-1]
    (l1s, l1b, wq, sq, bq, bias_ref, wp, sp, bp,
     l2s, l2b, wu, su, bu, wd, sd, bd) = (r[...] for r in refs[:17])
    # static activation scales ride in SMEM — seven scalar reads per program
    s_act = tuple(refs[17][i] for i in range(7)) if static_scales else None
    out_ref[...] = _block_math_q8(
        x_ref[...], l1s, l1b, wq, sq, bq,
        bias_ref.astype(jnp.float32), wp, sp, bp,
        l2s, l2b, wu, su, bu, wd, sd,
        bd, heads=heads, exact_gelu=exact_gelu, quant_attn=quant_attn,
        s_act=s_act,
    )


def _chain_kernel(x_ref, *refs, heads: int, exact_gelu: bool, depth: int,
                  quant: bool = False, quant_attn: bool = False,
                  static_scales: bool = False):
    """``depth`` blocks back-to-back on one VMEM-resident tile: the
    intermediate sequence never touches HBM between blocks (the short
    stage-1/2 sequences pay mostly memory traffic per block under the
    one-kernel-per-block scheme)."""
    out_ref = refs[-1]
    params = refs[:-1]
    width = (18 if static_scales else 17) if quant else 13
    xi = x_ref[...]
    for b in range(depth):  # static unroll
        blk = params[width * b : width * (b + 1)]
        p = [r[...] for r in blk[:17 if quant else 13]]
        if quant:
            (l1s, l1b, wq, sq, bq, bias, wp, sp, bp, l2s, l2b,
             wu, su, bu, wd, sd, bd) = p
            s_act = (
                tuple(blk[17][i] for i in range(7)) if static_scales else None
            )
            xi = _block_math_q8(
                xi, l1s, l1b, wq, sq, bq, bias.astype(jnp.float32),
                wp, sp, bp, l2s, l2b, wu, su, bu, wd, sd, bd,
                heads=heads, exact_gelu=exact_gelu, quant_attn=quant_attn,
                s_act=s_act,
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


def block_act_amax(x, params, heads: int, exact_gelu: bool):
    """Calibration forward: ``_xla_block`` + abs-max taps on the
    quantized activations.

    Returns ``(out, amax)`` where ``amax`` is a (7,) float32 of the batch
    abs-maxes of (LN1-out, attention-out, LN2-out, post-GELU, q, k, v) —
    the four GEMM inputs ``_block_math_q8`` quantizes plus the three
    attention operands ``_attn_inner_q8s`` quantizes when ``quant_attn``
    is combined with static scales (the ``w8a8-static+attn`` config combo
    was pruned as strictly dominated; the kernel capability remains for
    probes). Feed a running max of these into
    ``quantize_block_params(params, act_amax=...)`` for the STATIC-scale
    serving path (``_qdot_static``): no per-row amax chain at inference.
    """
    (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = params
    b, n, c = x.shape
    d = c // heads
    y = _ln(x, l1s, l1b)  # f32 — the kernel quantizes the f32 LN output
    yc = y.astype(x.dtype)
    qkv = (
        yc.reshape(b * n, c) @ wq
    ).astype(x.dtype).reshape(b, n, 3 * c) + bq
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
    y2 = _ln(r, l2s, l2b)  # f32
    y2c = y2.astype(x.dtype)
    h1 = (y2c.reshape(b * n, c) @ wu).astype(jnp.float32) + bu.astype(
        jnp.float32
    )
    h1 = jax.nn.gelu(h1, approximate=not exact_gelu)
    o = (h1.astype(x.dtype) @ wd).astype(x.dtype).reshape(b, n, c) + bd
    amax = jnp.stack([
        jnp.max(jnp.abs(y)),
        jnp.max(jnp.abs(a.astype(jnp.float32))),
        jnp.max(jnp.abs(y2)),
        jnp.max(jnp.abs(h1)),
        # attention operands, UNSCALED slices of the qkv activation (the
        # kernel folds the d^-0.5 into the logit dequant scale)
        jnp.max(jnp.abs(qkv[:, :, :c].astype(jnp.float32))),
        jnp.max(jnp.abs(qkv[:, :, c : 2 * c].astype(jnp.float32))),
        jnp.max(jnp.abs(qkv[:, :, 2 * c :].astype(jnp.float32))),
    ]).astype(jnp.float32)
    return r + o, amax


@functools.partial(
    jax.jit,
    static_argnames=("heads", "exact_gelu", "block_b", "interpret", "quant",
                     "quant_attn"),
)
def fused_block(x, params, heads: int, exact_gelu: bool = False,
                block_b: int = 2, interpret: bool = False,
                quant: bool = False, quant_attn: bool = False):
    """Whole pre-LN transformer block in one Pallas kernel.

    Args:
      x: (B, N, C).
      params: tuple (ln1_scale, ln1_bias, w_qkv, b_qkv, attn_bias(H,N,N),
        w_proj, b_proj, ln2_scale, ln2_bias, w_up, b_up, w_dn, b_dn) —
        LN params float32, weights in x's dtype. With ``quant=True``, the
        17-tuple from ``quantize_block_params`` instead — or the 18-tuple
        (static activation scales appended) for the calibrated
        static-scale path, which skips the per-row dynamic amax chain.
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
      quant_attn: with ``quant``, ALSO run the two attention matmuls
        (q@kᵀ, p@v) int8 (``_attn_inner_q8``). Separate knob: the
        attention is numerically the most delicate part, so its
        quantization is gated on its own parity/quality evidence.

    Returns (B, N, C) in x's dtype. Differentiable (saved-activation VJP:
    the train forward kernel emits the backward's residuals) unless
    ``quant``.
    """
    if quant:
        return _fused_block_forward(x, params, heads, exact_gelu, block_b,
                                    interpret, quant=True,
                                    quant_attn=quant_attn)
    return _fused_block_vjp(x, params, heads, exact_gelu, block_b, interpret)


def _block_kernel_train(x_ref, l1s, l1b, wq, bq, bias_ref, wp, bp, l2s, l2b,
                        wu, bu, wd, bd, out_ref, qkv_ref, p_ref, gin_ref,
                        r_ref, *, heads: int, exact_gelu: bool):
    out, qkv, p, gin, r = _block_math_train(
        x_ref[...], l1s[...], l1b[...], wq[...], bq[...],
        bias_ref[...].astype(jnp.float32), wp[...], bp[...], l2s[...],
        l2b[...], wu[...], bu[...], wd[...], bd[...],
        heads=heads, exact_gelu=exact_gelu,
    )
    out_ref[...] = out
    qkv_ref[...] = qkv
    p_ref[...] = p
    gin_ref[...] = gin
    r_ref[...] = r


def _fused_block_train_forward(x, params, heads, exact_gelu, block_b,
                               interpret):
    """Megakernel forward that ALSO emits the backward's residuals
    (qkv, probs, pre-GELU, post-attention residual) — the saved-activation
    training path (VJP below runs with zero forward recompute)."""
    b, n, c = x.shape
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    bp_ = b + pad
    specs_p, flat_p = _block_param_specs(params, False)
    hid = params[9].shape[1]  # w_up (c, hidden)
    tile = lambda width: pl.BlockSpec((block_b, n, width), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    shp = lambda width: jax.ShapeDtypeStruct((bp_, n, width), x.dtype)
    out, qkv, p, gin, r = pl.pallas_call(
        functools.partial(_block_kernel_train, heads=heads,
                          exact_gelu=exact_gelu),
        grid=(bp_ // block_b,),
        in_specs=[tile(c), *specs_p],
        out_specs=(tile(c), tile(3 * c), tile(heads * n), tile(hid),
                   tile(c)),
        out_shape=(shp(c), shp(3 * c), shp(heads * n), shp(hid), shp(c)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x, *flat_p)
    if pad:
        out, qkv, p, gin, r = (t[:b] for t in (out, qkv, p, gin, r))
    return out, (qkv, p, gin, r)


def _ln_stats(x, eps=1e-5):
    m = x.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    v = ((m - mu) ** 2).mean(-1, keepdims=True)
    rs = lax.rsqrt(v + eps)
    return (m - mu) * rs, rs


def _ln_bwd(dy, xhat, rs, scale):
    """LayerNorm backward from the normalized input (f32 throughout)."""
    dscale = (dy * xhat).sum((0, 1))
    dbias = dy.sum((0, 1))
    dxh = dy * scale
    dx = rs * (
        dxh - dxh.mean(-1, keepdims=True)
        - xhat * (dxh * xhat).mean(-1, keepdims=True)
    )
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_block_vjp(x, params, heads, exact_gelu, block_b, interpret):
    return _fused_block_forward(x, params, heads, exact_gelu, block_b,
                                interpret)


def _fused_block_fwd(x, params, heads, exact_gelu, block_b, interpret):
    out, saved = _fused_block_train_forward(x, params, heads, exact_gelu,
                                            block_b, interpret)
    return out, (x, params, saved)


def _fused_block_bwd(heads, exact_gelu, block_b, interpret, res, g):
    """Hand-derived block backward over the kernel-saved residuals.

    Replaces the round-2 recompute VJP (which re-executed the whole XLA
    block: 199.8 vs 169.0 ms/step at batch 120, ``train/loop.py``): every
    forward GEMM/softmax result the backward needs was already written by
    ``_fused_block_train_forward``; only the two LayerNorm normalizations
    and the attention output a = p·v are re-derived (cheap next to the
    GEMMs they feed).
    """
    x, params, (qkv, p_cat, gin, r) = res
    (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = params
    b, n, c = x.shape
    h = heads
    d = c // h
    scale = d ** -0.5
    dt = x.dtype
    f32 = jnp.float32
    g32 = g.astype(f32)

    # --- MLP: out = r + gelu(gin) @ wd + bd -------------------------------
    gin32 = gin.astype(f32)
    act, gelu_vjp = jax.vjp(
        lambda t: jax.nn.gelu(t, approximate=not exact_gelu), gin32
    )
    gm = act.astype(dt)
    dwd = jnp.einsum("bnf,bnc->fc", gm, g.astype(dt),
                     preferred_element_type=f32)
    dbd = g32.sum((0, 1))
    dact = jnp.einsum("bnc,fc->bnf", g.astype(dt), wd.astype(dt),
                      preferred_element_type=f32)
    dgin = gelu_vjp(dact)[0]
    dbu = dgin.sum((0, 1))
    xhat2, rs2 = _ln_stats(r)
    y2 = (xhat2 * l2s + l2b).astype(dt)
    dgin_t = dgin.astype(dt)
    dwu = jnp.einsum("bnc,bnf->cf", y2, dgin_t, preferred_element_type=f32)
    dy2 = jnp.einsum("bnf,cf->bnc", dgin_t, wu.astype(dt),
                     preferred_element_type=f32)
    dr_ln, dl2s, dl2b = _ln_bwd(dy2, xhat2, rs2, l2s)
    dr = g32 + dr_ln

    # --- proj: r = x + a @ wp + bp ---------------------------------------
    vh = qkv[:, :, 2 * c :].reshape(b, n, h, d)
    p = p_cat.reshape(b, n, h, n)
    a = jnp.einsum("bnhm,bmhd->bnhd", p, vh,
                   preferred_element_type=f32).astype(dt).reshape(b, n, c)
    drt = dr.astype(dt)
    dwp = jnp.einsum("bnc,bnk->ck", a, drt, preferred_element_type=f32)
    dbp = dr.sum((0, 1))
    da = jnp.einsum("bnk,ck->bnc", drt, wp.astype(dt),
                    preferred_element_type=f32).astype(dt).reshape(b, n, h, d)

    # --- attention backward from the SAVED normalized probs --------------
    qh = qkv[:, :, :c].reshape(b, n, h, d)
    kh = qkv[:, :, c : 2 * c].reshape(b, n, h, d)
    dv = jnp.einsum("bnhm,bnhd->bmhd", p, da, preferred_element_type=f32)
    dp = jnp.einsum("bnhd,bmhd->bnhm", da, vh, preferred_element_type=f32)
    pf = p.astype(f32)
    dlog = pf * (dp - (dp * pf).sum(-1, keepdims=True))
    dbias = dlog.sum(0).transpose(1, 0, 2)  # (n, h, m) -> (h, n, m)
    dlt = dlog.astype(dt)
    dq = jnp.einsum("bnhm,bmhd->bnhd", dlt, kh,
                    preferred_element_type=f32) * scale
    dk = jnp.einsum("bnhm,bnhd->bmhd", dlt, qh,
                    preferred_element_type=f32) * scale
    dqkv = jnp.concatenate(
        [dq.reshape(b, n, c), dk.reshape(b, n, c), dv.reshape(b, n, c)], -1
    )

    # --- qkv GEMM + LN1 ----------------------------------------------------
    xhat1, rs1 = _ln_stats(x)
    y = (xhat1 * l1s + l1b).astype(dt)
    dqkv_t = dqkv.astype(dt)
    dwq = jnp.einsum("bnc,bnk->ck", y, dqkv_t, preferred_element_type=f32)
    dbq = dqkv.sum((0, 1))
    dy = jnp.einsum("bnk,ck->bnc", dqkv_t, wq.astype(dt),
                    preferred_element_type=f32)
    dx_ln, dl1s, dl1b = _ln_bwd(dy, xhat1, rs1, l1s)
    dx = (dr + dx_ln).astype(x.dtype)

    dparams = (
        dl1s.astype(l1s.dtype), dl1b.astype(l1b.dtype),
        dwq.astype(wq.dtype), dbq.astype(bq.dtype),
        dbias.astype(bias.dtype), dwp.astype(wp.dtype),
        dbp.astype(bp.dtype), dl2s.astype(l2s.dtype),
        dl2b.astype(l2b.dtype), dwu.astype(wu.dtype),
        dbu.astype(bu.dtype), dwd.astype(wd.dtype), dbd.astype(bd.dtype),
    )
    return dx, dparams


_fused_block_vjp.defvjp(_fused_block_fwd, _fused_block_bwd)


def _xla_chain(x, params_list, heads: int, exact_gelu: bool):
    for p in params_list:
        x = _xla_block(x, p, heads, exact_gelu)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("heads", "exact_gelu", "block_b", "interpret", "quant",
                     "quant_attn"),
)
def fused_block_chain(x, params_list, heads: int, exact_gelu: bool = False,
                      block_b: int = 2, interpret: bool = False,
                      quant: bool = False, quant_attn: bool = False):
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
                                        block_b, interpret, quant=True,
                                        quant_attn=quant_attn)
        return _fused_chain_forward(x, params_list, heads, exact_gelu,
                                    block_b, interpret, quant=True,
                                    quant_attn=quant_attn)
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
    """(in_specs, flat_args) for one block's params (13-, 17- or — with
    static activation scales appended — 18-tuple)."""
    whole = lambda i: (0, 0)
    VM = pl.BlockSpec(memory_space=pltpu.VMEM)
    W = lambda a: pl.BlockSpec(a.shape, whole, memory_space=pltpu.VMEM)
    if quant:
        (l1s, l1b, wq, sq, bq, bias, wp, sp, bp, l2s, l2b,
         wu, su, bu, wd, sd, bd) = p[:17]
        specs = [VM, VM, W(wq), VM, VM, VM, W(wp), VM, VM, VM, VM,
                 W(wu), VM, VM, W(wd), VM, VM]
        flat = [l1s, l1b, wq, sq, bq, bias.astype(jnp.float32), wp, sp, bp,
                l2s, l2b, wu, su, bu, wd, sd, bd]
        if len(p) == 18:  # static activation scales → SMEM scalars
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            flat.append(p[17].astype(jnp.float32))
    else:
        (l1s, l1b, wq, bq, bias, wp, bp, l2s, l2b, wu, bu, wd, bd) = p
        specs = [VM, VM, W(wq), VM, VM, W(wp), VM, VM, VM,
                 W(wu), VM, W(wd), VM]
        flat = [l1s, l1b, wq, bq, bias.astype(jnp.float32), wp, bp,
                l2s, l2b, wu, bu, wd, bd]
    return specs, flat


def _fused_chain_forward(x, params_list, heads, exact_gelu, block_b,
                         interpret, quant=False, quant_attn=False):
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
                          depth=depth, quant=quant, quant_attn=quant_attn,
                          static_scales=quant and len(params_list[0]) == 18),
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
                         quant=False, quant_attn=False):
    b, n, c = x.shape
    block_b = min(block_b, max(b, 1))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
    specs_p, flat_p = _block_param_specs(params, quant)
    if quant:
        kern = functools.partial(_block_kernel_q8, quant_attn=quant_attn,
                                 static_scales=len(params) == 18)
    else:
        kern = _block_kernel
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
