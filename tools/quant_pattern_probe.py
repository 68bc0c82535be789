"""Probe: the full w8a8 pattern inside one Pallas kernel on this chip.

Dynamic per-row activation quantization (abs-max → round → clip → int8
cast), int8×int8→int32 dot, f32 dequantization by row×col scales — the
exact in-kernel sequence the quantized megakernel needs. Checks Mosaic
lowering + numerics vs an XLA reference, then times it.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmerge_tpu.ops.pallas.fused_block import _qdot as qdot  # noqa: E402
from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402


def kernel(y_ref, wq_ref, s_ref, o_ref):
    o_ref[...] = qdot(y_ref[...], wq_ref[...], s_ref[...])


def main():
    print("devices:", jax.devices())
    M, K, N = 4096, 768, 3072
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    s = jnp.asarray(rng.uniform(0.005, 0.02, (N,)), jnp.float32)

    mm = pl.pallas_call(
        kernel, grid=(M // 512,),
        in_specs=[pl.BlockSpec((512, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0)),
                  pl.BlockSpec((N,), lambda i: (0,))],
        out_specs=pl.BlockSpec((512, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    got = np.asarray(jax.jit(mm)(y, wq, s)[:64])
    want = np.asarray(jax.jit(qdot)(y, wq, s)[:64])
    err = np.abs(got - want).max()
    print("pallas-vs-xla max abs diff (first 64 rows):", err)

    def body(i, y, wq, s):
        yy = y + i.astype(jnp.float32) * 1e-3
        return jnp.abs(mm(yy, wq, s)).sum() * 1e-9

    ms = rep_probe(body, y, wq, s, k=16)
    print(f"w8a8 qdot (incl. in-kernel rowquant): {ms:7.3f} ms  "
          f"{2 * M * K * N / (ms * 1e-3) / 1e12:6.1f} TOP/s")

    def body_bf16(i, y, w):
        yy = y + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        out = lax.dot_general(yy, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return jnp.abs(out).sum() * 1e-9

    yb = y.astype(jnp.bfloat16)
    wb = (wq.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    ms2 = rep_probe(body_bf16, yb, wb, k=16)
    print(f"bf16 reference GEMM:                  {ms2:7.3f} ms  "
          f"{2 * M * K * N / (ms2 * 1e-3) / 1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()
