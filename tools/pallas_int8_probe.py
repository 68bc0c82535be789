"""Probe: does Mosaic lower an int8 dot on this chip, and at what rate?

Minimal Pallas matmul kernels at the megakernel's MLP shape, int8 vs
bfloat16, timed with the relay-safe rep_probe discipline. Informs whether a
quantized (w8a8) megakernel path is worth building.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402


def matmul_kernel(a_ref, b_ref, o_ref, *, pet):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=pet,
    )


def make_matmul(M, K, N, pet, bm=512):
    grid = (M // bm,)
    return pl.pallas_call(
        functools.partial(matmul_kernel, pet=pet),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), pet),
    )


def probe(M, K, N, dtype, pet, bm=512):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-100, 100, (M, K), dtype=np.int8))
        b = jnp.asarray(rng.integers(-100, 100, (K, N), dtype=np.int8))
    else:
        a = jnp.asarray(rng.standard_normal((M, K)), dtype)
        b = jnp.asarray(rng.standard_normal((K, N)), dtype)
    mm = make_matmul(M, K, N, pet, bm)

    def body(i, a, b):
        # perturb with the loop counter (K distinct values) so XLA cannot
        # hoist the dot out of the rep_probe loop
        if dtype == jnp.int8:
            aa = a + i.astype(dtype)
        else:
            aa = a + i.astype(dtype) * dtype(1e-3)
        out = mm(aa, b)
        return jnp.abs(out.astype(jnp.float32)).sum() * 1e-9

    ms = rep_probe(body, a, b, k=16)
    tops = 2 * M * K * N / (ms * 1e-3) / 1e12
    print(f"pallas {np.dtype(dtype).name:8s} -> {np.dtype(pet).name:7s} "
          f"M={M} K={K} N={N}: {ms:7.3f} ms  {tops:6.1f} TOP/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    M, K, N = 4096, 768, 3072
    probe(M, K, N, jnp.bfloat16, jnp.float32)
    try:
        probe(M, K, N, jnp.int8, jnp.int32)
    except Exception as e:
        print("int8 pallas FAILED:", type(e).__name__, str(e)[:500])
    # mixed: int8 weights, bf16 activations (weight-only quant)
    try:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.integers(-100, 100, (K, N), dtype=np.int8))

        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        mm = pl.pallas_call(
            kern, grid=(M // 512,),
            in_specs=[pl.BlockSpec((512, K), lambda i: (i, 0)),
                      pl.BlockSpec((K, N), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((512, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )

        def body(i, a, b):
            aa = jnp.where(i % 2 == 0, a, a + jnp.bfloat16(1e-3))
            return jnp.abs(mm(aa, b)).sum() * 1e-9

        ms = rep_probe(body, a, b, k=16)
        print(f"pallas w8-a-bf16 (cast in kernel): {ms:7.3f} ms  "
              f"{2 * M * K * N / (ms * 1e-3) / 1e12:6.1f} TOP/s")
    except Exception as e:
        print("w8 cast pallas FAILED:", type(e).__name__, str(e)[:500])
