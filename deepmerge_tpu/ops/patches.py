"""Multi-scale patch extraction from HBM-resident scene tiles.

TPU-native replacement for the reference's per-sample GDAL window read +
cv2 resize pipeline (``MyUtils1.py:116-223``, ``cut_image`` at ``:162-200``):
the scene tile lives zero-padded in HBM (uint8), each sample point slices a
static max-cap window with ``lax.dynamic_slice``, and crop+INTER_AREA-resize
happens as weight-matrix matmuls (see ``ops/resize.py``). Batches are chunked
through ``lax.map`` to bound the materialized window memory.

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

from deepmerge_tpu.ops.resize import crop_resize


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


def pad_scene(scene: np.ndarray, cap: int) -> np.ndarray:
    """Zero-pad an (H, W, C) scene by cap//2 on each spatial side.

    With this padding, every max-cap window slice is in-bounds and the zeros
    land exactly where the reference's ``cut_image`` zero-fills
    (``MyUtils1.py:174-191``).
    """
    p = cap // 2
    return np.pad(scene, ((p, p), (p, p), (0, 0)))


def _left_top(center, scale):
    """Reference window origin: Python ``int(center - scale/2)`` (truncation
    toward zero, ``MyUtils1.py:219-222``)."""
    v = center.astype(jnp.float32) - scale.astype(jnp.float32) / 2.0
    return jnp.trunc(v).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("patch_sizes", "cap", "chunk", "quantize_uint8")
)
def extract_multiscale_patches(
    padded_scene,
    centers_yx,
    scales,
    patch_sizes: tuple[int, ...] = (32, 64, 128),
    cap: int = 512,
    chunk: int = 32,
    quantize_uint8: bool = True,
):
    """Extract per-point multi-scale patches.

    Args:
      padded_scene: (H + cap, W + cap, C) uint8 — ``pad_scene`` output,
        resident in HBM.
      centers_yx: (B, 2) int32 pixel centers (row, col) in ORIGINAL coords.
      scales: (B, S) int32 adaptive window sides, S >= len(patch_sizes).
      patch_sizes: static per-slot output sides.
      cap: static max window side (must be even; scales are clamped to cap).
      chunk: lax.map chunk size bounding window memory (chunk * cap² * C).
      quantize_uint8: emulate cv2-on-uint8 rounding (see ops/resize.py).

    Returns:
      tuple of (B, p, p, C) float32 arrays in [0, 1], one per patch size.
    """
    assert cap % 2 == 0
    n_slots = len(patch_sizes)
    b = centers_yx.shape[0]
    c = padded_scene.shape[-1]

    pad = b % chunk
    if pad:
        pad = chunk - pad
        centers_yx = jnp.concatenate(
            [centers_yx, jnp.zeros((pad, 2), centers_yx.dtype)], axis=0
        )
        scales = jnp.concatenate(
            [scales, jnp.ones((pad, scales.shape[1]), scales.dtype)], axis=0
        )

    def one_point(center, point_scales):
        cy, cx = center[0], center[1]
        window = lax.dynamic_slice(
            padded_scene, (cy, cx, jnp.int32(0)), (cap, cap, c)
        )
        outs = []
        for slot in range(n_slots):
            s = jnp.clip(point_scales[slot], 1, cap)
            lt_y = _left_top(cy, s)
            lt_x = _left_top(cx, s)
            # window index of original coord y is y - cy + cap//2
            off_y = lt_y - cy + cap // 2
            off_x = lt_x - cx + cap // 2
            outs.append(
                crop_resize(
                    window, s, off_y, off_x, patch_sizes[slot], quantize_uint8
                )
            )
        return tuple(outs)

    def chunk_fn(args):
        centers, scls = args
        return jax.vmap(one_point)(centers, scls)

    centers_c = centers_yx.reshape(-1, chunk, 2)
    scales_c = scales.reshape(-1, chunk, scales.shape[-1])
    outs = lax.map(chunk_fn, (centers_c, scales_c))
    return tuple(o.reshape(-1, p, p, c)[:b] for o, p in zip(outs, patch_sizes))
