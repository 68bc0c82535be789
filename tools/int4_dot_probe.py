"""Probe: is there any int4 MXU rate on this chip worth a w4a8 path?

PLAN.md round-4 candidate: "explore w4a8 for the MLP (VMEM halves again,
chain_stage0 may flip positive)". chain_stage0 already re-measured
negative under int8 with weights comfortably VMEM-resident, so the only
way w4 wins is if the RAW dot itself runs faster than int8 (or the int4→
int8 in-kernel cast is free enough that halving weight traffic pays).
This probe answers that at the megakernel's MLP shape (M=4096, K=768,
N=3072 — ``nets/ShfitScaleFormer.py`` mlp_ratio=4 geometry), with the
same minimal-Pallas + rep_probe discipline as tools/pallas_int8_probe.py.

Variants (each guarded — Mosaic may refuse int4 outright):
  1. int8 x int8 -> int32           (the shipping w8a8 dot, baseline)
  2. int4 x int4 -> int32           (native int4 MXU mode, if any)
  3. int8 x int4w -> int32          (mixed-operand dot, if lowerable)
  4. int8 x (int4w cast to int8)    (realistic w4a8: weights stored int4
                                     in VMEM, widened before the dot —
                                     wins only if the cast is cheaper
                                     than the halved weight footprint)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402

M, K, N = 4096, 768, 3072
BM = 512


def _mk(a_dtype, b_dtype, cast_b_to=None):
    def kern(a_ref, b_ref, o_ref):
        b = b_ref[...]
        if cast_b_to is not None:
            b = b.astype(cast_b_to)
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return pl.pallas_call(
        kern, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )


def probe(name, a_dtype, b_dtype, cast_b_to=None):
    rng = np.random.default_rng(0)
    # operands stay inside each dtype's range (int4 in [-7,7]) so the
    # counter perturbation below cannot wrap — the distributions are what
    # they claim to be, not just rate fodder
    a_lim = 6 if a_dtype == jnp.int4 else 100
    a8 = rng.integers(-a_lim, a_lim, (M, K), dtype=np.int8)
    b_lim = 7 if b_dtype == jnp.int4 else 100
    b8 = rng.integers(-b_lim, b_lim, (K, N), dtype=np.int8)
    a = jnp.asarray(a8).astype(a_dtype)
    b = jnp.asarray(b8).astype(b_dtype)
    mm = _mk(a_dtype, b_dtype, cast_b_to)

    def body(i, a, b):
        # perturb with the loop counter so XLA cannot hoist the dot;
        # the modulus keeps a + perturbation within range (int4 max is 7,
        # a reaches 5, so perturb by at most 2; int8 reaches 99 + 7)
        mod = 2 if a_dtype == jnp.int4 else 8
        aa = a + (i % mod).astype(a_dtype)
        out = mm(aa, b)
        return jnp.abs(out.astype(jnp.float32)).sum() * 1e-9

    try:
        ms = rep_probe(body, a, b, k=16)
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:200]}")
        return
    tops = 2 * M * K * N / (ms * 1e-3) / 1e12
    print(f"{name:34s} {ms:7.3f} ms  {tops:6.1f} TOP/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("int8 x int8 -> int32 (ship)", jnp.int8, jnp.int8)
    probe("int4 x int4 -> int32", jnp.int4, jnp.int4)
    probe("int8 x int4 -> int32 (mixed)", jnp.int8, jnp.int4)
    probe("int8 x int4->int8 cast-in-kernel", jnp.int8, jnp.int4,
          cast_b_to=jnp.int8)
