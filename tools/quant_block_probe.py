"""On-chip A/B: w8a8 megakernel block vs bf16 at production shape.

B=2048, N=192, C=768, bt=2 — the stage-0 operating point of the headline
extraction. rep_probe (in-jit repetition slope) per the relay measurement
discipline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.ops.pallas.fused_block import (  # noqa: E402
    _fused_block_forward,
    quantize_block_params,
)
from deepmerge_tpu.utils.profiling import rep_probe  # noqa: E402


def mkparams(rng, C, H, N, dt):
    mk = lambda *s, scale=0.02: jnp.asarray(rng.standard_normal(s) * scale, dt)
    f32 = lambda *s, off=0.0: jnp.asarray(
        rng.standard_normal(s) * 0.1 + off, jnp.float32)
    return (
        f32(C, off=1.0), f32(C), mk(C, 3 * C), mk(3 * C),
        mk(H, N, N, scale=0.5), mk(C, C), mk(C), f32(C, off=1.0), f32(C),
        mk(C, 4 * C), mk(4 * C), mk(4 * C, C), mk(C),
    )


def main():
    print("devices:", jax.devices())
    B, N, C, H, bt = 2048, 192, 768, 12, 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    params = mkparams(rng, C, H, N, dt)
    qp = jax.jit(quantize_block_params)(params)

    def body_bf16(i, x, *p):
        xx = x + i.astype(dt) * dt(1e-3)
        out = _fused_block_forward(xx, p, H, False, bt, False)
        return jnp.abs(out.astype(jnp.float32)).sum() * 1e-6

    def body_q8(i, x, *p):
        xx = x + i.astype(dt) * dt(1e-3)
        out = _fused_block_forward(xx, p, H, False, bt, False, quant=True)
        return jnp.abs(out.astype(jnp.float32)).sum() * 1e-6

    def body_q8a(i, x, *p):
        xx = x + i.astype(dt) * dt(1e-3)
        out = _fused_block_forward(xx, p, H, False, bt, False, quant=True,
                                   quant_attn=True)
        return jnp.abs(out.astype(jnp.float32)).sum() * 1e-6

    ms_b = rep_probe(body_bf16, x, *params, k=4)
    print(f"bf16 block      (bt={bt}): {ms_b:7.2f} ms")
    ms_q = rep_probe(body_q8, x, *qp, k=4)
    print(f"w8a8 block      (bt={bt}): {ms_q:7.2f} ms  "
          f"({ms_b / ms_q:.2f}x vs bf16)")
    ms_qa = rep_probe(body_q8a, x, *qp, k=4)
    print(f"w8a8+attn block (bt={bt}): {ms_qa:7.2f} ms  "
          f"({ms_b / ms_qa:.2f}x vs bf16, {ms_q / ms_qa:.2f}x vs w8a8)")
    for bt2 in (4, 8):
        ms_q2 = rep_probe(
            lambda i, x, *p: jnp.abs(_fused_block_forward(
                x + i.astype(dt) * dt(1e-3), p, H, False, bt2, False,
                quant=True).astype(jnp.float32)).sum() * 1e-6,
            x, *qp, k=4)
        print(f"w8a8 block (bt={bt2}): {ms_q2:7.2f} ms")


if __name__ == "__main__":
    main()
