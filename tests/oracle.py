"""NumPy/cv2 oracle implementing the REFERENCE's patch-pipeline semantics.

Independent re-statement of the behavior documented in SURVEY.md §3.5
(``MyUtils1.py``: ``cut_image`` zero-padded clipped window, ``get_scales``
adaptive ladder, cv2 INTER_AREA resize of the uint8 buffer then /255,
window origin ``int(center - scale/2)``). Used as golden truth for the
TPU-native array ops.
"""

from __future__ import annotations

import cv2
import numpy as np


def ref_get_scales(inner: int, obj: int, targets=(32, 64, 128, 1)):
    interval = int(obj - inner)
    scene = obj + interval
    envi = obj + interval * 2
    scales = [int(inner), int(obj), int(scene), int(envi)]
    factors = [s * 1.0 / t for s, t in zip(scales, targets)]
    return scales, factors


def ref_cut_image(image_hwc: np.ndarray, center_yx, scale: int) -> np.ndarray:
    """Zero-padded clipped window, HWC uint8. Origin = int(c - s/2) (trunc)."""
    h, w, c = image_hwc.shape
    cy, cx = center_yx
    lt_y = int(cy - scale / 2)
    lt_x = int(cx - scale / 2)
    dst = np.zeros((scale, scale, c), np.uint8)
    y0, x0 = max(lt_y, 0), max(lt_x, 0)
    y1, x1 = min(lt_y + scale, h), min(lt_x + scale, w)
    if y1 > y0 and x1 > x0:
        dst[y0 - lt_y : y1 - lt_y, x0 - lt_x : x1 - lt_x] = image_hwc[y0:y1, x0:x1]
    return dst


def ref_resize(patch_hwc: np.ndarray, target: int) -> np.ndarray:
    """Per-band cv2 INTER_AREA on uint8, then /255 (MyUtils1.py:202-216)."""
    bands = [
        cv2.resize(
            patch_hwc[..., i], (target, target), interpolation=cv2.INTER_AREA
        )
        for i in range(patch_hwc.shape[-1])
    ]
    out = np.stack(bands, axis=-1)
    return out.astype(np.float32) / 255.0


def ref_patches(image_hwc, center_yx, inner, obj, patch_sizes=(32, 64, 128)):
    scales, factors = ref_get_scales(inner, obj, tuple(patch_sizes) + (1,))
    out = []
    for slot, target in enumerate(patch_sizes):
        win = ref_cut_image(image_hwc, center_yx, scales[slot])
        out.append(ref_resize(win, target))
    return out, scales, factors
