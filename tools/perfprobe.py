"""Per-op TPU timing probe for the flagship forward (ROOFLINE.md data).

Every probe repeats its op K times INSIDE one jitted program (a fori_loop
whose input depends on the loop counter, so XLA cannot hoist the op) and
reduces to a scalar — on this relayed platform a dispatch costs ~28ms and
``block_until_ready`` does not truly sync, so per-dispatch host timing lies.
The reported per-op ms is (t_loop(K) - t_loop(0-ish)) / K via two K values.

  python tools/perfprobe.py            # all probes
  python tools/perfprobe.py attn       # one section
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from deepmerge_tpu.utils.profiling import rep_probe, sync_time  # noqa: E402


def probe_gemms(B=2048):
    """The raw GEMM shapes of one stage-0 block at batch B (Nr = B*192)."""
    key = jax.random.key(0)
    rows = B * 192
    x = jax.random.normal(key, (rows, 768), jnp.bfloat16)
    w_qkv = jax.random.normal(key, (768, 2304), jnp.bfloat16)
    w_proj = jax.random.normal(key, (768, 768), jnp.bfloat16)
    w_up = jax.random.normal(key, (768, 3072), jnp.bfloat16)
    w_dn = jax.random.normal(key, (3072, 768), jnp.bfloat16)

    def qkv(i, x, w):
        xi = x + i.astype(x.dtype)
        return jnp.abs(xi @ w).sum()

    def proj(i, x, w):
        xi = x + i.astype(x.dtype)
        return jnp.abs(xi @ w).sum()

    def mlp(i, x, wu, wd):
        xi = x + i.astype(x.dtype)
        h = jax.nn.gelu(xi @ wu, approximate=True)
        return jnp.abs(h @ wd).sum()

    def ln(i, x):
        xi = (x + i.astype(x.dtype)).astype(jnp.float32)
        mu = xi.mean(-1, keepdims=True)
        v = ((xi - mu) ** 2).mean(-1, keepdims=True)
        return jnp.abs(((xi - mu) * lax.rsqrt(v + 1e-5)).astype(x.dtype)).sum()

    def residual(i, x):
        return jnp.abs(x + i.astype(x.dtype)).sum()

    base = rep_probe(residual, x)  # cost of the perturb-add + abs-sum itself
    print(f"  perturb+reduce baseline  : {base:7.2f} ms (subtracted below)")
    for name, f, a, flops in [
        ("qkv   (Nr,768)x(768,2304)", qkv, (x, w_qkv), 2 * rows * 768 * 2304),
        ("proj  (Nr,768)x(768,768) ", proj, (x, w_proj), 2 * rows * 768 * 768),
        ("mlp   up+gelu+down       ", mlp, (x, w_up, w_dn), 4 * rows * 768 * 3072),
        ("layernorm (Nr,768)       ", ln, (x,), 0),
    ]:
        ms = rep_probe(f, *a) - base
        tf = flops / (ms / 1000) / 1e12 if flops else 0.0
        print(f"  {name}: {ms:7.2f} ms  {tf:6.1f} TFLOP/s")


def probe_attn(B=2048):
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    key = jax.random.key(0)
    n, h, c = 192, 12, 768
    qkv = jax.random.normal(key, (B, n, 3 * c), jnp.bfloat16)
    bias = jax.random.normal(key, (h, n, n), jnp.float32)
    ideal = 4 * B * n * n * c  # the two attention matmuls

    def xla_attn(i, qkv_packed, bias):
        x = qkv_packed + i.astype(qkv_packed.dtype)
        b = x.shape[0]
        d = c // h
        q, k, v = jnp.split(x, 3, axis=2)
        q = q.reshape(b, n, h, d) * (d ** -0.5)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits + bias[None], axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        return jnp.abs(out.astype(jnp.bfloat16)).sum()

    def fused(i, qkv_, bias_, bb=2, packed=False):
        x = qkv_ + i.astype(qkv_.dtype)
        return jnp.abs(
            fused_attention_qkv(x, bias_, heads=h, block_b=bb,
                                packed_pv=packed)
        ).sum()

    def perturb(i, qkv_, bias_):
        return jnp.abs(qkv_ + i.astype(qkv_.dtype)).sum()

    base = rep_probe(perturb, qkv, bias, k=8)
    print(f"  perturb baseline     : {base:7.2f} ms")
    ms = rep_probe(xla_attn, qkv, bias, k=8) - base
    print(f"  xla attention        : {ms:7.2f} ms  ({ideal / (ms/1e3) / 1e12:5.1f} TF/s)")
    for bb in (2, 8):
        ms = rep_probe(functools.partial(fused, bb=bb), qkv, bias, k=8) - base
        print(f"  fused qkv block_b={bb:2d} : {ms:7.2f} ms  ({ideal / (ms/1e3) / 1e12:5.1f} TF/s)")
        ms = rep_probe(functools.partial(fused, bb=bb, packed=True),
                       qkv, bias, k=8) - base
        print(f"  packed-pv block_b={bb:2d}: {ms:7.2f} ms  ({ideal / (ms/1e3) / 1e12:5.1f} TF/s)")


def _flagship(fused: bool = True):
    from deepmerge_tpu.config import ModelConfig
    from deepmerge_tpu.models.s2former import build_model, init_params

    mcfg = ModelConfig(dtype="bfloat16", fused_attention=fused)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0), batch=2)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables["params"],
    )
    return model, params, mcfg


def probe_forward(B=2048):
    """Full v3 forward per-batch ms (the dominant bench phase)."""
    for fused in (True, False):
        model, params, mcfg = _flagship(fused)
        patches = tuple(
            jax.random.normal(jax.random.key(1), (B, s, s, 3), jnp.float32)
            for s in mcfg.input_image_scales
        )
        designed = jax.random.normal(jax.random.key(2), (B, 19), jnp.float32)

        def fwd(i, params, p0, p1, p2, designed):
            pats = (p0 + i.astype(p0.dtype), p1, p2)
            out = model.apply({"params": params}, pats, designed, False)
            return jnp.abs(out).sum()

        ms = rep_probe(fwd, params, *patches, designed, k=2)
        flops = B * 20.4e9  # ROOFLINE.md per-point matmul FLOPs
        print(f"  full v3 fwd (fused_attention={fused}): {ms:7.1f} ms "
              f"({flops / (ms/1e3) / 1e12:5.1f} TF/s eff)")


def probe_pipeline(B=2048):
    """Patch pipeline (window gather + resize + designed) vs full fused batch."""
    from deepmerge_tpu.config import DataConfig
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.ops.patches import adaptive_scales, extract_multiscale_patches
    from deepmerge_tpu.train.sampler import stage_scene

    model, params, mcfg = _flagship(True)
    dcfg = DataConfig(max_window=512, eval_batch_size=B)
    scene = generate_scene(h=2048, w=2048, n_regions=8192, n_objects=256,
                           points_per_region=1, seed=0)
    ds = stage_scene(scene, dcfg)
    idx = np.arange(B)
    scales, factors = adaptive_scales(
        ds.point_inner[idx], ds.point_object[idx],
        tuple(dcfg.patch_sizes) + (1,),
    )
    centers = jnp.asarray(ds.points_yx[idx])
    feats = jnp.asarray(ds.point_features[idx], jnp.float32)

    def pipeline(i, padded, centers, scales, factors, feats):
        c = centers + (i % 2).astype(centers.dtype)  # jiggle: no hoisting
        patches = extract_multiscale_patches(
            padded, c, scales, patch_sizes=tuple(mcfg.input_image_scales),
            caps=ds.caps, quantize_uint8=True, out_channels=3,
        )
        return sum(jnp.abs(p).sum() for p in patches)

    def full(i, params, padded, centers, scales, factors, feats):
        c = centers + (i % 2).astype(centers.dtype)
        patches = extract_multiscale_patches(
            padded, c, scales, patch_sizes=tuple(mcfg.input_image_scales),
            caps=ds.caps, quantize_uint8=True, out_channels=3,
        )
        designed = jnp.concatenate([feats, factors], axis=1)
        out = model.apply({"params": params}, patches, designed, False)
        return jnp.abs(out).sum()

    ms_pipe = rep_probe(pipeline, ds.padded, centers, scales, factors, feats, k=4)
    print(f"  patch pipeline only  : {ms_pipe:7.1f} ms")
    ms_full = rep_probe(full, params, ds.padded, centers, scales, factors,
                        feats, k=2)
    print(f"  pipeline + forward   : {ms_full:7.1f} ms")


def probe_train(pairs=120):
    """fwd vs fwd+bwd of the flagship Siamese step (B = 2*pairs stacked).

    Variants: XLA block path (the shipped training path), megakernel with
    recompute VJP, and attention-backward precision experiments.
    """
    import dataclasses

    from deepmerge_tpu.train.losses import contrastive_pair_loss

    B = 2 * pairs
    model, params, mcfg = _flagship(True)
    import deepmerge_tpu.models.s2former as s2

    xla_model = s2.build_model(dataclasses.replace(mcfg, fused_block=False))
    mk_model = s2.build_model(dataclasses.replace(mcfg, fused_block=True))

    r = jax.random.key(3)
    patches = tuple(
        jax.random.uniform(r, (B, s, s, 3), jnp.float32)
        for s in mcfg.input_image_scales
    )
    designed = jax.random.uniform(r, (B, 19), jnp.float32)
    flag = (jnp.arange(pairs) % 2).astype(jnp.float32)

    def loss_fn(model):
        def f(params, p0, p1, p2, designed):
            emb = model.apply({"params": params}, (p0, p1, p2), designed,
                              True, rngs={"dropout": jax.random.key(0)})
            el, er = jnp.split(emb, 2, axis=0)
            return contrastive_pair_loss(el, er, flag, 1.0)
        return f

    for name, m in (("xla-block ", xla_model), ("megakernel", mk_model)):
        f = loss_fn(m)

        def fwd(i, params, p0, p1, p2, designed):
            return f(params, p0 + i.astype(p0.dtype), p1, p2, designed)

        def fwdbwd(i, params, p0, p1, p2, designed):
            l, g = jax.value_and_grad(f)(params, p0 + i.astype(p0.dtype),
                                         p1, p2, designed)
            # reduce EVERY grad leaf: reducing only a couple lets XLA
            # dead-code-eliminate most dW GEMMs (~33 ms at batch 120 —
            # the round-3 "106 ms fwd+bwd" artifact, BENCH.md correction)
            return l + sum(jnp.abs(x).sum() for x in jax.tree.leaves(g))

        ms_f = rep_probe(fwd, params, *patches, designed, k=8)
        ms_fb = rep_probe(fwdbwd, params, *patches, designed, k=4)
        print(f"  {name} fwd {ms_f:7.2f} ms   fwd+bwd {ms_fb:7.2f} ms "
              f"(bwd ~{ms_fb - ms_f:6.2f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    if which in ("all", "gemm"):
        print("[gemms]")
        probe_gemms()
    if which in ("all", "attn"):
        print("[attention]")
        probe_attn()
    if which in ("all", "fwd"):
        print("[full forward]")
        probe_forward()
    if which in ("all", "pipe"):
        print("[patch pipeline]")
        probe_pipeline()
    if which in ("all", "train"):
        print("[train step]")
        probe_train()
