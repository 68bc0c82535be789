"""On-chip A/B of the w8a8 activation-quant chain inside the megakernel.

ROOFLINE.md §4c prices the quant/dequant VPU work at ~25 ms/chunk — the
second-largest soft line of the int8 extraction floor. This probe swaps
``fused_block._qdot`` variants and measures the FULL stage-0 block in situ
(per the CLAUDE.md int8 lesson: isolated qdot probes mislead; only the
fused block number counts):

  base     : amax -> y / sr -> round -> clip -> int8   (shipping chain)
  noclip   : drop the clip (sr = amax/127 already bounds |y/sr| <= 127;
             f32 divide error is ~1 ulp, far below the 0.5 round margin)
  recip    : multiply by 127/amax instead of dividing by amax/127
             (VPU divide is multi-pass; multiply is one)
  recipnc  : recip + noclip

Usage: python tools/qdot_variant_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import deepmerge_tpu.ops.pallas.fused_block as fb
from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402
from tools.quant_block_probe import mkparams  # noqa: E402


def qdot_base(y, wq, s_col):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sr = jnp.where(amax > 0, amax / 127.0, 1.0)
    yq = jnp.clip(jnp.round(y / sr), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sr * s_col[None, :]


def qdot_noclip(y, wq, s_col):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sr = jnp.where(amax > 0, amax / 127.0, 1.0)
    yq = jnp.round(y / sr).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sr * s_col[None, :]


def qdot_recip(y, wq, s_col):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    rs = jnp.where(amax > 0, 127.0 / amax, 0.0)
    yq = jnp.clip(jnp.round(y * rs), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (amax * (1.0 / 127.0)) * s_col[None, :]


def qdot_recipnc(y, wq, s_col):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    rs = jnp.where(amax > 0, 127.0 / amax, 0.0)
    yq = jnp.round(y * rs).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (amax * (1.0 / 127.0)) * s_col[None, :]


def qdot_deqbf16(y, wq, s_col):
    """recipnc + dequant arithmetic in bf16 (the (M, N) output-side
    multiplies; bf16 VPU ops pack 2x). int32->bf16 cast costs ~0.4% rel
    error on the accumulator — same order as the int8 quant noise itself."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    rs = jnp.where(amax > 0, 127.0 / amax, 0.0)
    yq = jnp.round(y * rs).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    sr16 = (amax * (1.0 / 127.0)).astype(jnp.bfloat16)
    return (acc.astype(jnp.bfloat16) * sr16
            * s_col[None, :].astype(jnp.bfloat16)).astype(jnp.float32)


def qdot_arecip(y, wq, s_col):
    """recipnc with ``pl.reciprocal(approx=True)`` (Pallas fast-reciprocal;
    ~1e-4 rel error shifts quant codes by <<0.5 of a rounding step).
    Only traceable inside a Pallas kernel."""
    from jax.experimental import pallas as pl
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    rs = jnp.where(amax > 0, pl.reciprocal(amax, approx=True) * 127.0, 0.0)
    yq = jnp.round(y * rs).astype(jnp.int8)
    acc = lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (amax * (1.0 / 127.0)) * s_col[None, :]


VARIANTS = [
    ("base", qdot_base),
    ("noclip", qdot_noclip),
    ("recip", qdot_recip),
    ("recipnc", qdot_recipnc),
    ("deqbf16", qdot_deqbf16),
]

KERNEL_ONLY_VARIANTS = [("arecip", qdot_arecip)]


def main():
    print("devices:", jax.devices())
    B, N, C, H, bt = 2048, 192, 768, 12, 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    params = mkparams(rng, C, H, N, dt)
    qp = jax.jit(fb.quantize_block_params)(params)
    orig = fb._qdot

    # numeric sanity on a small tile first (CPU-cheap, still on device)
    ys = jnp.asarray(rng.standard_normal((256, 768)), jnp.float32)
    ws, ss = fb.quantize_weight(jnp.asarray(
        rng.standard_normal((768, 768)) * 0.02, dt))
    ref = np.asarray(qdot_base(ys, ws, ss))
    for name, fn in VARIANTS[1:]:
        got = np.asarray(fn(ys, ws, ss))
        d = np.abs(got - ref).max()
        print(f"  {name:8s} max|delta| vs base: {d:.3e}")

    results = {}
    try:
        for name, fn in VARIANTS + KERNEL_ONLY_VARIANTS:
            fb._qdot = fn

            def body(i, x, *p, _fn=fn):
                xx = x + i.astype(dt) * dt(1e-3)
                out = fb._fused_block_forward(xx, p, H, False, bt, False,
                                              quant=True)
                return jnp.abs(out.astype(jnp.float32)).sum() * 1e-6

            ms = rep_probe(body, x, *qp, k=4)
            results[name] = ms
            rel = results["base"] / ms if "base" in results else 1.0
            print(f"w8a8 block [{name:8s}] (bt={bt}): {ms:7.2f} ms"
                  f"  ({rel:.3f}x vs base)")
    finally:
        fb._qdot = orig


if __name__ == "__main__":
    main()
