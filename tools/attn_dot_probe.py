"""On-chip A/B: are int8 MXU dots faster than bf16 at the ATTENTION shape?

The megakernel's attention runs per-head (bt, n, d) x (bt, n, d) dots at
n=192, d=64 (``nets/ShfitScaleFormer.py:84-156`` geometry). The w8a8+attn
experiment measured NEGATIVE in situ (37.6 vs 26.9 ms/block — the per-head
quant chain swamps everything); this probe isolates the question the
in-situ number can't answer: do the RAW dots (inputs already int8, no quant
chain at all) beat bf16 at this shape? If not, no amount of quant-chain
optimization can make int8 attention win, and the direction is dead on
this chip.

Grid layout mirrors the megakernel: one Pallas program per bt-tile, static
head unroll, all operands VMEM-resident.
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

from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402


def _dots_kernel(q_ref, k_ref, v_ref, out_ref, *, heads, int8):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    bt, n, c = q.shape
    d = c // heads
    acc_t = jnp.int32 if int8 else jnp.float32
    outs = []
    for h in range(heads):
        qh = q[:, :, h * d : (h + 1) * d]
        kh = k[:, :, h * d : (h + 1) * d]
        vh = v[:, :, h * d : (h + 1) * d]
        logits = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc_t,
        )
        # no softmax: dots only. Feed logits straight to the second dot
        # (cast to the input dtype as the real kernel would).
        p = logits.astype(q.dtype) if int8 else logits.astype(jnp.bfloat16)
        if int8:
            # logits are int32; a real kernel would requantize — here we
            # just truncate to int8 to keep the operand type honest
            p = jnp.clip(logits, -127, 127).astype(jnp.int8)
        av = lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_t,
        )
        outs.append(av.astype(jnp.float32))
    out_ref[...] = jnp.concatenate(outs, axis=2)


@functools.partial(jax.jit, static_argnames=("heads", "int8", "bt"))
def attn_dots(q, k, v, heads: int, int8: bool, bt: int):
    b, n, c = q.shape
    spec = pl.BlockSpec((bt, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dots_kernel, heads=heads, int8=int8),
        grid=(b // bt,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((bt, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def main():
    print("devices:", jax.devices())
    B, N, C, H = 2048, 192, 768, 12
    rng = np.random.default_rng(0)
    for bt in (2, 8):
        xb = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
        xi = jnp.asarray(
            rng.integers(-127, 128, (B, N, C)), jnp.int8)

        def body_bf16(i, q, k, v):
            qq = q + i.astype(jnp.bfloat16) * jnp.bfloat16(0)
            out = attn_dots(qq, k, v, H, False, bt)
            return jnp.abs(out).sum() * 1e-9

        def body_int8(i, q, k, v):
            qq = (q + i.astype(jnp.int8) * jnp.int8(0)).astype(jnp.int8)
            out = attn_dots(qq, k, v, H, True, bt)
            return jnp.abs(out).sum() * 1e-9

        ms_b = rep_probe(body_bf16, xb, xb, xb, k=8)
        ms_i = rep_probe(body_int8, xi, xi, xi, k=8)
        print(f"bt={bt}: attention dots (q@kT + p@v, {H} heads, N={N}, "
              f"d=64) bf16 {ms_b:6.2f} ms | int8 {ms_i:6.2f} ms "
              f"({ms_b / ms_i:.2f}x)")


if __name__ == "__main__":
    main()
