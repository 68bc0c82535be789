"""Probe: (H, W) label-map relabel gather — XLA vs Pallas alternatives.

merged_label_map's tail is `dense[region_map_hw]`: a 4.2M-element lookup
into an R=8192 int32 table. Measures the XLA gather and two Pallas
formulations (one-hot matmul per block, and in-kernel jnp.take) to see if
the ~28 ms XLA gather is beatable.
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
from jax.experimental.pallas import tpu as pltpu

from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402


def main():
    print("devices:", jax.devices())
    H = W = 2048
    R = 8192
    rng = np.random.default_rng(0)
    region_map = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)
    dense = jnp.asarray(rng.integers(0, 3000, (R,)), jnp.int32)

    def body_xla(i, table, idx):
        t = table + i  # perturb
        out = t[idx]
        return jnp.abs(out).astype(jnp.float32).sum() * 1e-9

    ms = rep_probe(body_xla, dense, region_map, k=8)
    px_per_s = H * W / (ms * 1e-3)
    print(f"XLA gather dense[region_map]: {ms:7.3f} ms  "
          f"({px_per_s / 1e6:.0f} Mpx/s)")

    # Pallas: table whole in VMEM, row-blocks of the map, jnp.take inside
    def kern(t_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take(t_ref[...], idx_ref[...], axis=0)

    bm = 256
    lookup = pl.pallas_call(
        kern, grid=(H // bm,),
        in_specs=[pl.BlockSpec((R,), lambda i: (0,)),
                  pl.BlockSpec((bm, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    try:
        got = np.asarray(jax.jit(lookup)(dense, region_map)[:4])
        want = np.asarray(dense)[np.asarray(region_map)[:4]]
        assert (got == want).all(), "pallas take mismatch"

        def body_pl(i, table, idx):
            t = table + i
            return jnp.abs(lookup(t, idx)).astype(jnp.float32).sum() * 1e-9

        ms2 = rep_probe(body_pl, dense, region_map, k=8)
        print(f"Pallas jnp.take lookup:       {ms2:7.3f} ms  "
              f"({H * W / (ms2 * 1e-3) / 1e6:.0f} Mpx/s)")
    except Exception as e:
        print("pallas take FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
