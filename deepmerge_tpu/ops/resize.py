"""Crop + area-interpolated resize as MXU matmuls.

The reference cuts adaptive, data-dependent windows around region sample
points and resizes each to a fixed per-slot target with
``cv2.resize(INTER_AREA)`` (``MyUtils1.py:116-216``). Data-dependent window
sizes are hostile to XLA (dynamic shapes), so the TPU-native formulation is:

  1. slice a *static* max-cap window around the point, and
  2. apply a separable resize expressed as two small weight-matrix matmuls
     ``out = W_rows @ window @ W_cols^T`` whose weights encode BOTH the crop
     (zero outside the adaptive window) and the exact INTER_AREA kernel.

This turns a ragged gather+resample into dense MXU work with static shapes.

INTER_AREA semantics were verified empirically against OpenCV:
  * downscale (ratio >= 1): true area average — output pixel ``o`` integrates
    source interval ``[o*r, (o+1)*r)`` with fractional edge weights.
  * upscale (ratio < 1): OpenCV's special INTER_AREA fallback, NOT plain
    bilinear: ``sx = floor(o*r)``, ``f = (o+1) - (sx+1)/r`` (clamped to 0 when
    <= 0, else fractional part), blending ``sx`` and ``min(sx+1, s-1)``.
  * uint8 inputs: fixed-point rounding equal to ``floor(x + 0.5)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def resize_weights(out_size: int, cap: int, scale, offset):
    """Build the (out_size, cap) separable resize weight matrix.

    Args:
      out_size: static output side.
      cap: static max-window side (the padded input extent).
      scale: traced int scalar — the adaptive source window side ``s``.
      offset: traced int scalar — index inside the cap window where the
        adaptive source window starts (source pixel ``i`` of the window lives
        at cap index ``offset + i``).

    Returns:
      float32 ``W`` with ``out = W @ window_axis`` performing crop + resize
      along one axis, matching cv2 INTER_AREA for both shrink and enlarge.
    """
    s = jnp.asarray(scale, jnp.float32)
    off = jnp.asarray(offset, jnp.int32)
    r = s / out_size  # source pixels per output pixel

    o = lax.broadcasted_iota(jnp.float32, (out_size, cap), 0)
    j = lax.broadcasted_iota(jnp.int32, (out_size, cap), 1)
    i = (j - off).astype(jnp.float32)  # source-window coordinate of cap col j
    in_window = (i >= 0) & (i < s)

    # --- downscale: area overlap of [o*r, (o+1)*r) with [i, i+1) ------------
    lo = o * r
    hi = (o + 1.0) * r
    overlap = jnp.clip(jnp.minimum(hi, i + 1.0) - jnp.maximum(lo, i), 0.0, 1.0)
    w_down = overlap / r

    # --- upscale: OpenCV INTER_AREA fallback coefficients -------------------
    sx = jnp.floor(o * r)
    f = (o + 1.0) - (sx + 1.0) / r
    f = jnp.where(f <= 0.0, 0.0, f - jnp.floor(f))
    sx2 = jnp.minimum(sx + 1.0, s - 1.0)
    w_up = jnp.where(i == sx, 1.0 - f, 0.0) + jnp.where(i == sx2, f, 0.0)

    w = jnp.where(r >= 1.0, w_down, w_up)
    return jnp.where(in_window, w, 0.0)


def crop_resize(
    window, scale, offset_y, offset_x, out_size: int, quantize_uint8: bool = True
):
    """Crop the adaptive sub-window and resize it to (out_size, out_size).

    Args:
      window: (cap, cap, C) raw pixel values (0..255, any float/int dtype).
      scale: traced int scalar — adaptive window side (square, as in the
        reference).
      offset_y, offset_x: traced int scalars — start of the adaptive window
        inside `window` per axis (they differ only when the reference's
        toward-zero window-origin truncation lands on opposite signs).
      out_size: static target side.
      quantize_uint8: emulate the reference's cv2-on-uint8 rounding
        (``MyUtils1.py:207`` resizes the uint8 buffer, then ``/255``).

    Returns:
      (out_size, out_size, C) float32 in [0, 1].
    """
    wr = resize_weights(out_size, window.shape[0], scale, offset_y)
    wc = resize_weights(out_size, window.shape[1], scale, offset_x)
    x = window.astype(jnp.float32)
    # rows: (out, cap) @ (cap, cap, C) -> (out, cap, C)
    x = jnp.einsum("oi,ijc->ojc", wr, x, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    # cols: (out, cap) with (out, cap, C) -> (out, out, C)
    x = jnp.einsum("pj,ojc->opc", wc, x, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    if quantize_uint8:
        x = jnp.floor(x + 0.5)
    return x / 255.0


@functools.partial(jax.jit, static_argnames=("out_size", "quantize_uint8"))
def area_resize(image, out_size: int, quantize_uint8: bool = False):
    """Whole-image INTER_AREA resize (no crop): (H, W, C) -> (out, out, C).

    Convenience wrapper over the same weight-matrix kernel; used for golden
    tests against cv2 and for fixed-scale pipelines.
    """
    h, w = image.shape[0], image.shape[1]
    wr = resize_weights(out_size, h, h, 0)
    wc = resize_weights(out_size, w, w, 0)
    x = image.astype(jnp.float32)
    x = jnp.einsum("oi,ijc->ojc", wr, x, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    x = jnp.einsum("pj,ojc->opc", wc, x, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    if quantize_uint8:
        x = jnp.floor(x + 0.5)
    return x
