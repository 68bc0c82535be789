"""Multi-scale patch extraction from HBM-resident scene tiles.

TPU-native replacement for the reference's per-sample GDAL window read +
cv2 resize pipeline (``MyUtils1.py:116-223``, ``cut_image`` at ``:162-200``):
the scene tile lives zero-padded in HBM (uint8), each sample point slices a
static per-slot window with ``lax.dynamic_slice``, and crop+INTER_AREA-resize
happens as BATCHED weight-matrix matmuls (see ``ops/resize.py``) — one
(B, out, cap) × (B, cap, cap·C) GEMM per axis per slot, shapes the MXU likes.

Performance structure:
  * per-slot window caps: slot 0 only ever sees the small "inner" scale, so
    it slices a small window; caps are chosen from the data at staging time
    (rounded up to 128) instead of one worst-case cap for all slots.
  * 3-pass float32 matmuls (``Precision.HIGH``) on the quantized path: the
    result is rounded to uint8 anyway, and bf16x3 keeps error ≪ 0.5 LSB.

Reference semantics preserved exactly:
  * window top-left ``int(center - scale/2)`` with Python toward-zero
    truncation (``MyUtils1.py:219-222``),
  * zero padding for out-of-scene pixels (``MyUtils1.py:174-191``),
  * per-slot resize targets ``configs.scales=[32,64,128,1]`` with the 4th
    slot factor-only (``config.py:32``; inference drops patch 4:
    ``ExtractFeatures.py:64-70``),
  * adaptive scale ladder inner/object/object+Δ/object+2Δ
    (``MyUtils1.py:130-156``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from deepmerge_tpu.ops.resize import resize_weights
from deepmerge_tpu.ops.pallas.window_gather import (
    LANE_ALIGN,
    ROW_ALIGN,
    default_interpret,
    gather_windows,
)


def adaptive_scales(inner, obj, patch_targets=(32, 64, 128, 1)):
    """Adaptive scale ladder + factors (``MyUtils1.py:130-156``).

    Args:
      inner, obj: int arrays (...,) — the per-region "inner" and "object"
        scale shapefile fields.
      patch_targets: per-slot resize targets (reference ``configs.scales``).

    Returns:
      scales (..., 4) int32, factors (..., 4) float32.
    """
    inner = jnp.asarray(inner, jnp.int32)
    obj = jnp.asarray(obj, jnp.int32)
    interval = obj - inner
    scene = obj + interval
    envi = obj + 2 * interval
    scales = jnp.stack([inner, obj, scene, envi], axis=-1)
    targets = jnp.asarray(patch_targets, jnp.float32)
    factors = scales.astype(jnp.float32) / targets
    return scales, factors


def staging_caps(
    inner: np.ndarray,
    obj: np.ndarray,
    patch_sizes,
    max_window: int,
    scene_name: str = "",
) -> tuple[int, ...]:
    """Per-slot window caps from the data's max adaptive scales, with the
    clamp-divergence warning (shared by single-device ``stage_scene`` and
    sharded ``stage_scene_shards`` so the two staging paths can't drift).

    The scale ladder is the reference's inner/object/object+Δ/object+2Δ
    (``MyUtils1.py:130-156``); scales above ``max_window`` are clamped,
    which diverges patch content from the reference for those points —
    warn so the divergence is never silent.
    """
    inner64 = np.asarray(inner).astype(np.int64)
    obj64 = np.asarray(obj).astype(np.int64)
    ladder = np.stack(
        [inner64, obj64, 2 * obj64 - inner64, 3 * obj64 - 2 * inner64], 1
    )
    max_scales = ladder.max(0)[: len(patch_sizes)]
    caps = slot_caps(max_scales, max_window)
    if int(max_scales.max(initial=0)) > max_window:
        import warnings

        warnings.warn(
            f"scene '{scene_name}': adaptive scales up to "
            f"{int(max_scales.max())} exceed data.max_window="
            f"{max_window}; windows will be clamped (patch content "
            f"differs from the reference for those points)",
            stacklevel=3,
        )
    return caps


def slot_caps(
    max_scales: np.ndarray | tuple[int, ...],
    max_window: int = 512,
    align: int = 128,
) -> tuple[int, ...]:
    """Per-slot static window caps from the data's max adaptive scales."""
    caps = []
    for m in np.asarray(max_scales).tolist():
        c = min(int(-(-m // align)) * align, max_window)
        caps.append(max(c, align))
    return tuple(caps)


def _pixel_align(channels: int) -> int:
    """Column alignment in PIXELS so element offsets hit the 128-lane grid."""
    import math

    return math.lcm(LANE_ALIGN, channels) // channels


def staged_channels(channels: int) -> int:
    """Channel count scenes are STAGED with: the next power of two.

    An interleaved 3-band row needs 128-PIXEL window alignment (lcm of the
    128-lane tile and 3 bytes/px), blowing every gathered window up to
    cap+128 px wide; padding to RGBA drops the alignment to 32 px —
    cap+32-wide windows, ~17% less DMA traffic and resize work. The zero
    band rides through the linear resize and is sliced off the patches.
    """
    return 1 << (max(channels, 1) - 1).bit_length()


def scene_pad(caps: int | tuple[int, ...], channels: int) -> int:
    """Per-side zero padding: half the max window + DMA alignment spill.

    ``channels`` may be the original band count — alignment always uses the
    STAGED (power-of-two padded) channel count. The spill must cover BOTH
    axes: columns align down by up to ``_pixel_align`` pixels, rows by up
    to ``ROW_ALIGN`` (32) — for staged channels ≥ 8 the pixel alignment
    drops below 32, so the row bound dominates (under-padding there sent
    bottom-edge window DMAs past the padded array).
    """
    m = caps if isinstance(caps, int) else max(caps)
    return m // 2 + max(ROW_ALIGN, _pixel_align(staged_channels(channels)))


@functools.partial(jax.jit, static_argnames=("pad", "staged_c"))
def pad_scene_device(tile, pad: int, staged_c: int):
    """Device-side ``pad_scene``: upload the RAW (H, W, C) tile, pad in HBM.

    Byte-identical layout to ``pad_scene`` (spatial zeros where the
    reference's ``cut_image`` zero-fills, ``MyUtils1.py:174-191``; channel
    pad to the staged power-of-two) — but the host→device transfer moves
    only the raw bytes, ~2.2× less than the padded layout for a 2048² RGB
    scene (12.6 vs 27.5 MB). H2D bandwidth is the scarce resource on the
    serving path, so staging pads on device.
    """
    h, w, c = tile.shape
    out = jnp.zeros((h + 2 * pad, w + 2 * pad, staged_c), tile.dtype)
    return out.at[pad : pad + h, pad : pad + w, :c].set(tile)


def pad_scene(scene: np.ndarray, caps: int | tuple[int, ...]) -> np.ndarray:
    """Zero-pad an (H, W, C) scene for in-bounds aligned window DMA.

    Spatial zeros land exactly where the reference's ``cut_image``
    zero-fills (``MyUtils1.py:174-191``); channels pad to the next power
    of two (``staged_channels``) for tighter DMA alignment.
    """
    p = scene_pad(caps, scene.shape[-1])
    h, w, c = scene.shape
    cs = staged_channels(c)
    # preallocate + slice-assign: np.pad's sequential per-axis copies cost
    # ~1.9 s for a 2048² RGB tile vs ~50 ms this way (measured) — this is
    # per-scene host work on the serving path, worth 40x
    out = np.zeros((h + 2 * p, w + 2 * p, cs), scene.dtype)
    out[p : p + h, p : p + w, :c] = scene
    return out


def _left_top(center, scale):
    """Reference window origin: Python ``int(center - scale/2)`` (truncation
    toward zero, ``MyUtils1.py:219-222``)."""
    v = center.astype(jnp.float32) - scale.astype(jnp.float32) / 2.0
    return jnp.trunc(v).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch_sizes", "caps", "chunk", "quantize_uint8", "out_channels",
        "out_dtype",
    ),
)
def extract_multiscale_patches(
    padded_scene,
    centers_yx,
    scales,
    patch_sizes: tuple[int, ...] = (32, 64, 128),
    caps: int | tuple[int, ...] = 512,
    chunk: int = 256,
    quantize_uint8: bool = True,
    out_channels: int | None = None,
    out_dtype=jnp.float32,
):
    """Extract per-point multi-scale patches.

    Args:
      padded_scene: (H + pad, W + pad, C) uint8 — ``pad_scene`` output with
        ``pad = max(caps)``, resident in HBM (C = ``staged_channels``).
      centers_yx: (B, 2) int32 pixel centers (row, col) in ORIGINAL coords.
      scales: (B, S) int32 adaptive window sides, S >= len(patch_sizes).
      patch_sizes: static per-slot output sides.
      caps: static per-slot max window sides (even; scales clamp to them).
      chunk: batch chunk bounding transient window memory.
      quantize_uint8: emulate cv2-on-uint8 rounding (see ops/resize.py).
      out_channels: slice patches to the original band count (``pad_scene``
        stages 3-band scenes as RGBA); None keeps the staged channels.
      out_dtype: patch dtype. Model consumers cast to the compute dtype
        anyway, so emitting bf16 directly halves the patch materialization
        the forward reads.

    Returns:
      tuple of (B, p, p, out_channels) ``out_dtype`` in [0, 1], per size.
    """
    n_slots = len(patch_sizes)
    if isinstance(caps, int):
        caps = (caps,) * n_slots
    assert all(c % 2 == 0 for c in caps)
    b = centers_yx.shape[0]
    c = padded_scene.shape[-1]
    pad = scene_pad(caps, c)
    a_px = _pixel_align(c)

    rem = b % chunk
    if rem:
        extra = chunk - rem
        centers_yx = jnp.concatenate(
            [centers_yx, jnp.zeros((extra, 2), centers_yx.dtype)], axis=0
        )
        scales = jnp.concatenate(
            [scales, jnp.ones((extra, scales.shape[1]), scales.dtype)], axis=0
        )

    hi_prec = lax.Precision.HIGH  # bf16x3: error ≪ 0.5 uint8 LSB

    h_pad, w_pad = padded_scene.shape[0], padded_scene.shape[1]
    scene2d = padded_scene.reshape(h_pad, w_pad * c)
    interpret = default_interpret()

    def slot_patches(centers, slot_scales, slot: int):
        cap, out = caps[slot], patch_sizes[slot]
        win_rows = cap + ROW_ALIGN
        win_px = cap + a_px

        # per-point window DMA (Pallas) — NOT vmap(dynamic_slice), which XLA
        # lowers to a pathologically slow gather. Origins align DOWN to the
        # uint8 tile grid; the residual crop offset lives in the weights.
        y0 = centers[:, 0] + (pad - cap // 2)
        y0a = (y0 // ROW_ALIGN) * ROW_ALIGN
        px0 = centers[:, 1] + (pad - cap // 2)
        px0a = (px0 // a_px) * a_px
        starts = jnp.stack([y0a, px0a * c], axis=1)
        windows = gather_windows(
            scene2d, starts, win_rows, win_px * c, interpret=interpret
        )

        s = jnp.clip(slot_scales, 1, cap)
        # window index of original coord y is y - (y0a - pad)
        off_y = _left_top(centers[:, 0], s) - y0a + pad
        off_x = _left_top(centers[:, 1], s) - px0a + pad

        if quantize_uint8 and cap <= 256:
            # EXACT reduced-pass path — only sound for window sides
            # s ≤ 256. INTER_AREA weights scaled by the window side s are
            # small integers (≤ max(out, s) ≤ 256, bf16-exact): both down
            # (overlap·out) and up ((1−f)·s, f·s) coefficients — and uint8
            # pixels are integers ≤ 255 — so pass 1 runs as ONE bf16
            # matmul with every product (≤ 2^16) and f32-accumulated sum
            # (≤ s·255 < 2^24) exact, instead of 3-pass Precision.HIGH on
            # f32 windows (2× the operand traffic). Pass 2 keeps its
            # integer f32 operands and uses HIGH — the bf16x3 split of
            # ≤18-bit integers is exact and its 3 accumulation passes stay
            # inside one kernel (a round+frac 2-einsum split was measured
            # SLOWER: two full memory-traffic matmuls beat 3 in-kernel
            # passes — BENCH.md round 3). One divide by s² at the end,
            # with an integer tie-correction so rounding is exactly
            # floor(x2/s² + ½) and not at the mercy of the f32 reciprocal.
            # Beyond s = 256 the invariants break (scaled weights stop
            # being bf16-exact; Σ ≤ s²·255 passes 2^24), so larger caps
            # take the 3-pass HIGH fallback below.
            kr = jax.vmap(
                lambda sc, off: resize_weights(out, win_rows, sc, off)
                * sc.astype(jnp.float32)
            )(s, off_y).astype(jnp.bfloat16)
            kc = jax.vmap(
                lambda sc, off: resize_weights(out, win_px, sc, off)
                * sc.astype(jnp.float32)
            )(s, off_x)
            win_b = windows.reshape(-1, win_rows, win_px, c).astype(
                jnp.bfloat16
            )
            x1 = jnp.einsum(
                "boi,bijc->bojc", kr, win_b,
                preferred_element_type=jnp.float32,
            )
            x2 = jnp.einsum(
                "bpj,bojc->bopc", kc, x1,
                precision=hi_prec, preferred_element_type=jnp.float32,
            )
            s2 = (s.astype(jnp.float32) ** 2)[:, None, None, None]
            k = jnp.floor(x2 / s2 + 0.5)
            # exact tie-correction: x2, k·s² and their difference are all
            # exact f32 integers here (≤ 2^24 for s ≤ 256), so adjusting k
            # by the sign tests below lands exactly on floor(x2/s² + ½)
            d2 = 2.0 * (x2 - k * s2)
            k = k + (d2 >= s2).astype(jnp.float32)
            k = k - (d2 < -s2).astype(jnp.float32)
            return (k / 255.0).astype(out_dtype)

        windows = windows.reshape(-1, win_rows, win_px, c).astype(jnp.float32)
        wr = jax.vmap(lambda sc, off: resize_weights(out, win_rows, sc, off))(
            s, off_y
        )
        wc = jax.vmap(lambda sc, off: resize_weights(out, win_px, sc, off))(
            s, off_x
        )

        x = jnp.einsum(
            "boi,bijc->bojc", wr, windows,
            precision=hi_prec, preferred_element_type=jnp.float32,
        )
        x = jnp.einsum(
            "bpj,bojc->bopc", wc, x,
            precision=hi_prec, preferred_element_type=jnp.float32,
        )
        if quantize_uint8:  # cap > 256: HIGH fallback, same cv2 rounding
            x = jnp.floor(x + 0.5)
        return (x / 255.0).astype(out_dtype)

    def chunk_fn(args):
        centers, scls = args
        return tuple(
            slot_patches(centers, scls[:, slot], slot)
            for slot in range(n_slots)
        )

    co = c if out_channels is None else out_channels
    centers_c = centers_yx.reshape(-1, chunk, 2)
    scales_c = scales.reshape(-1, chunk, scales.shape[-1])
    if centers_c.shape[0] == 1:
        outs = chunk_fn((centers_c[0], scales_c[0]))
        return tuple(o[:b, :, :, :co] for o in outs)
    outs = lax.map(chunk_fn, (centers_c, scales_c))
    return tuple(
        o.reshape(-1, p, p, c)[:b, :, :, :co]
        for o, p in zip(outs, patch_sizes)
    )
