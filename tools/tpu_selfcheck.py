"""On-TPU kernel correctness asserts (VERDICT r1 #10).

CPU tests run every Pallas kernel in interpret mode; this script is the
committed TPU-mode counterpart: when the backend is a real TPU it runs the
window-gather DMA kernel, both fused-attention kernels (including the v5
odd-length sequence), and the INTER_AREA resize GEMMs against XLA/host
references and fails loudly on mismatch.

  python tools/tpu_selfcheck.py        # exits 0 iff all kernels agree
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, got, want, atol=2e-5, rtol=2e-5):
    got = np.asarray(got)
    want = np.asarray(want)
    try:
        np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
        print(f"  OK   {name}  (max|Δ|={np.max(np.abs(got - want)):.2e})")
    except AssertionError as e:
        FAILURES.append(name)
        print(f"  FAIL {name}: {str(e).splitlines()[3][:120]}")


def check_window_gather():
    from deepmerge_tpu.ops.pallas.window_gather import gather_windows

    r = np.random.RandomState(0)
    h, w = 512, 1024
    scene = r.randint(0, 256, (h, w), np.uint8)
    win_r, win_c = 160, 384
    starts = np.stack([
        r.randint(0, h - win_r, 64) // 32 * 32,   # uint8 sublane tile
        r.randint(0, w - win_c, 64) // 128 * 128,  # lane tile
    ], 1).astype(np.int32)
    got = gather_windows(jnp.asarray(scene), jnp.asarray(starts), win_r, win_c)
    want = np.stack([
        scene[y : y + win_r, x : x + win_c] for y, x in starts
    ])
    check("window_gather (uint8 HBM DMA)", got, want, atol=0, rtol=0)


def _xla_attention(q, k, v, bias):
    d = q.shape[-1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * d ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn + bias[None].astype(jnp.float32), axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def check_attention():
    from deepmerge_tpu.ops.pallas.fused_attention import (
        fused_attention,
        fused_attention_qkv,
    )

    r = np.random.RandomState(1)
    for n, tag in ((192, "flagship"), (193, "v5 extra-token"), (48, "stage1")):
        b, h, d = 16, 12, 64
        c = h * d
        qkv = jnp.asarray(r.randn(b, n, 3 * c), jnp.float32)
        bias = jnp.asarray(r.randn(h, n, n), jnp.float32)
        q = qkv[:, :, :c].reshape(b, n, h, d)
        k = qkv[:, :, c : 2 * c].reshape(b, n, h, d)
        v = qkv[:, :, 2 * c :].reshape(b, n, h, d)
        # tolerance: TPU f32 matmuls are bf16-pass emulated in BOTH Mosaic
        # and XLA, but the two round differently; softmax amplifies an ulp
        # on an outlier logit to ~1e-3 on O(1) values (a real slicing/bias
        # bug would be O(1) everywhere, so 5e-3 still discriminates)
        want = np.asarray(_xla_attention(q, k, v, bias)).reshape(b, n, c)
        got = fused_attention_qkv(qkv, bias, heads=h)
        check(f"fused_attention_qkv n={n} ({tag})", got, want,
              atol=5e-3, rtol=5e-3)
        got2 = np.asarray(fused_attention(q, k, v, bias)).reshape(b, n, c)
        check(f"fused_attention     n={n} ({tag})", got2, want,
              atol=5e-3, rtol=5e-3)


def check_fused_block():
    """Megakernel vs the INTERPRET lowering of the same kernel code.

    Comparing against the separate XLA implementation is dominated by
    f32-matmul-emulation rounding compounded through the 6-op chain
    (measured: interpret-vs-XLA alone differs 4.4e-2 at these magnitudes,
    while end-to-end merge partitions are bit-identical) — so the Mosaic
    check isolates kernel-lowering bugs by comparing against interpret
    mode, and a loose sanity bound covers the XLA reference.
    """
    from deepmerge_tpu.ops.pallas.fused_block import _xla_block, fused_block

    r = np.random.RandomState(3)
    for n, tag in ((192, "flagship"), (193, "v5 extra-token")):
        c, heads, hid = 768, 12, 3072
        rr = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
        params = (
            jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
            rr(c, 3 * c), rr(3 * c), rr(heads, n, n), rr(c, c), rr(c),
            jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
            rr(c, hid), rr(hid), rr(hid, c), rr(c),
        )
        x = jnp.asarray(r.randn(8, n, c), jnp.float32)
        want = np.asarray(
            fused_block(x, params, heads=heads, interpret=True)
        )
        got = np.asarray(fused_block(x, params, heads=heads))
        check(f"fused_block vs interpret n={n} ({tag})", got, want,
              atol=5e-2, rtol=5e-2)
        xla = np.asarray(_xla_block(x, params, heads, False))
        check(f"fused_block vs XLA ref  n={n} ({tag})", got, xla,
              atol=2e-1, rtol=2e-1)


def check_fused_block_q8():
    """w8a8 megakernel on chip vs its interpret lowering + the bf16 path.

    Same interpret-anchored scheme as ``check_fused_block``; the bf16
    comparison bounds total quantization error at the flagship shape.
    """
    from deepmerge_tpu.ops.pallas.fused_block import (
        _xla_block,
        fused_block,
        fused_block_chain,
        quantize_block_params,
    )

    r = np.random.RandomState(7)
    n, c, heads, hid = 192, 768, 12, 3072
    rr = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
    params = (
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        rr(c, 3 * c), rr(3 * c), rr(heads, n, n), rr(c, c), rr(c),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        rr(c, hid), rr(hid), rr(hid, c), rr(c),
    )
    qp = jax.jit(quantize_block_params)(params)
    x = jnp.asarray(r.randn(8, n, c), jnp.float32)
    want = np.asarray(
        fused_block(x, qp, heads=heads, interpret=True, quant=True)
    )
    got = np.asarray(fused_block(x, qp, heads=heads, quant=True))
    # Mosaic-vs-interpret f32 reassociation flips int8 codes sitting on a
    # rounding boundary; each flip moves the output one dequant step and
    # flips compound across the four GEMMs. Measured on chip at this shape
    # (outputs span ±13.7): mean|Δ|=0.0019, p99=0.043, max=0.161 — bound
    # at 2× the observed max (rtol=0: near-zero outputs make rtol lie)
    check("fused_block w8a8 vs interpret n=192", got, want,
          atol=0.33, rtol=0)
    bf16 = np.asarray(_xla_block(x, params, heads, False))
    # total quantization error vs bf16: measured mean|Δ|=0.051 (≈2.2% of
    # mean|out|=2.26), max=0.368 — identical from chip and interpret
    check("fused_block w8a8 vs bf16 ref n=192", got, bf16,
          atol=0.75, rtol=0)

    # the production serving default also CHAINS the short stages with
    # quant=True — cover that kernel variant at the stage-1 shape
    n1 = 48
    params1 = tuple(
        p if p.ndim != 3 else jnp.asarray(r.randn(heads, n1, n1) * 0.05,
                                          jnp.float32)
        for p in params
    )
    qp1 = jax.jit(quantize_block_params)(params1)
    x1 = jnp.asarray(r.randn(8, n1, c), jnp.float32)
    want1 = np.asarray(fused_block_chain(
        x1, (qp1, qp1), heads=heads, interpret=True, quant=True))
    got1 = np.asarray(fused_block_chain(
        x1, (qp1, qp1), heads=heads, quant=True))
    check("fused_block_chain w8a8 vs interpret n=48x2", got1, want1,
          atol=0.5, rtol=0)


def check_fused_block_chain():
    """Stage-chained kernel (whole stage, weights VMEM-resident) on chip."""
    from deepmerge_tpu.ops.pallas.fused_block import (
        fused_block_chain,
        _xla_chain,
    )

    r = np.random.RandomState(4)
    for n, depth, tag in ((48, 4, "stage1"), (12, 2, "stage2")):
        c, heads, hid = 768, 12, 3072
        rr = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
        params_list = tuple(
            (
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                rr(c, 3 * c), rr(3 * c), rr(heads, n, n), rr(c, c), rr(c),
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                rr(c, hid), rr(hid), rr(hid, c), rr(c),
            )
            for _ in range(depth)
        )
        x = jnp.asarray(r.randn(8, n, c), jnp.float32)
        want = np.asarray(
            fused_block_chain(x, params_list, heads=heads, interpret=True)
        )
        got = np.asarray(fused_block_chain(x, params_list, heads=heads))
        # bf16 accumulation error compounds over the chained blocks: the
        # single-block kernel measures max|Δ|≈2.8e-2 vs interpret, the
        # 4-block stage-1 chain ≈9.8e-2 (scattered tail, 0.016% of
        # elements, no tile/row structure — measured 2026-08-17; XLA's own
        # f32 path deviates from interpret up to 6.8e-2 at the same
        # indices). Tolerance scales with depth; strict correctness is
        # anchored by the CPU interpret-vs-XLA equality tests and the
        # XLA cross-check below.
        tol = 5e-2 * max(1, depth - 1)
        check(f"fused_block_chain vs interpret n={n}x{depth} ({tag})", got,
              want, atol=tol, rtol=tol)
        xla = np.asarray(_xla_chain(x, params_list, heads, False))
        check(f"fused_block_chain vs XLA n={n}x{depth} ({tag})", got, xla,
              atol=2e-1, rtol=2e-1)


def check_attention_variants():
    """save_probs (training) and packed_pv kernels on chip."""
    from deepmerge_tpu.ops.pallas.fused_attention import fused_attention_qkv

    r = np.random.RandomState(5)
    n, heads, c = 192, 12, 768
    qkv = jnp.asarray(r.randn(16, n, 3 * c) * 0.3, jnp.float32)
    bias = jnp.asarray(r.randn(heads, n, n) * 0.3, jnp.float32)
    base = np.asarray(fused_attention_qkv(qkv, bias, heads=heads))
    probs = np.asarray(
        fused_attention_qkv(qkv, bias, heads=heads, save_probs=True)
    )
    check("attention save_probs fwd == default", probs, base)
    packed = np.asarray(
        fused_attention_qkv(qkv, bias, heads=heads, packed_pv=True)
    )
    check("attention packed_pv == default", packed, base, atol=5e-4,
          rtol=5e-4)


def check_resize():
    from deepmerge_tpu.ops.patches import extract_multiscale_patches, pad_scene

    try:
        import cv2
    except Exception:
        cv2 = None

    r = np.random.RandomState(2)
    h = w = 256
    scene = r.randint(0, 256, (h, w, 3), np.uint8)
    caps = (128, 128)
    padded = jnp.asarray(pad_scene(scene, caps))
    centers = np.stack([r.randint(40, h - 40, 16), r.randint(40, w - 40, 16)],
                       1).astype(np.int32)
    scales = np.stack([np.full(16, 50), np.full(16, 100)], 1).astype(np.int32)
    got = extract_multiscale_patches(
        padded, jnp.asarray(centers), jnp.asarray(scales),
        patch_sizes=(32, 64), caps=caps, out_channels=3,
    )
    if cv2 is None:
        print("  SKIP resize (no cv2 on this host)")
        return
    for slot, out in ((0, 32), (1, 64)):
        want = []
        for (cy, cx), s in zip(centers, scales[:, slot]):
            y0 = int(cy - s / 2)
            x0 = int(cx - s / 2)
            win = np.zeros((s, s, 3), np.uint8)
            ys, xs = max(y0, 0), max(x0, 0)
            ye, xe = min(y0 + s, h), min(x0 + s, w)
            win[ys - y0 : ye - y0, xs - x0 : xe - x0] = scene[ys:ye, xs:xe]
            bands = [
                cv2.resize(win[:, :, i], (out, out),
                           interpolation=cv2.INTER_AREA)
                for i in range(3)
            ]
            want.append(np.stack(bands, -1).astype(np.float32) / 255.0)
        check(f"cut+INTER_AREA resize slot {slot} ({out}px)",
              got[slot], np.stack(want), atol=1 / 255.0 + 1e-6, rtol=0)


def check_labelmap():
    """Device dense-relabel + (H, W) expansion vs host np.unique semantics
    (``ops.merged_label_map`` — jnp.sort/searchsorted + HBM gather on chip)."""
    from deepmerge_tpu.ops.labelprop import merged_label_map

    r = np.random.RandomState(7)
    n = 513
    labels = np.minimum(np.arange(n), r.randint(0, n, n)).astype(np.int32)
    region_map = r.randint(0, n, (257, 384)).astype(np.int32)
    map_dev, k_dev = merged_label_map(
        jnp.asarray(labels), jnp.asarray(region_map)
    )
    uniq, dense = np.unique(labels, return_inverse=True)
    check("merged_label_map (H,W) expansion", map_dev,
          dense.astype(np.int32)[region_map], atol=0, rtol=0)
    check("merged_label_map cluster count", k_dev, np.int32(len(uniq)),
          atol=0, rtol=0)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend != "tpu":
        print("not a TPU backend — nothing to self-check (CPU tests cover "
              "interpret mode); exiting 0")
        return 0
    print("[window gather]")
    check_window_gather()
    print("[fused attention]")
    check_attention()
    print("[fused block megakernel]")
    check_fused_block()
    print("[fused block w8a8]")
    check_fused_block_q8()
    print("[fused block chain]")
    check_fused_block_chain()
    print("[attention variants]")
    check_attention_variants()
    print("[resize]")
    check_resize()
    print("[label map]")
    check_labelmap()
    if FAILURES:
        print(f"SELFCHECK FAILED: {FAILURES}")
        return 1
    print("SELFCHECK OK: all TPU kernels match their references")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
