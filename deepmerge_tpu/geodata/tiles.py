"""Class-labeled patch export with deterministic train/val split.

TPU-native equivalent of the reference's standalone tile exporter
(``OpenVectorWithGDAL.py:60-419``): shapefile-driven patch cutting around
classified points (``CutImage`` :98-128), a fixed-seed shuffled split
(``:76-87,266-311``), and per-split dumps (``WriteTrain``/``WriteVal``/
``WriteTest`` :136-178; its TFRecord writer was commented out — here the
sink is compressed .npz shards, which feed straight back into jnp).

Patch extraction reuses the device pipeline (same zero-padded clipped-window
semantics as ``cut_image``).
"""

from __future__ import annotations

import os

import numpy as np

from deepmerge_tpu.ops.patches import (
    extract_multiscale_patches,
    pad_scene,
    slot_caps,
)


def split_indices(
    n: int, train_frac: float = 0.8, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic shuffled train/val split (fixed seed, ref ``:76-87``)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    cut = int(n * train_frac)
    return order[:cut], order[cut:]


def cut_class_patches(
    image: np.ndarray,
    centers_yx: np.ndarray,
    window: int = 224,
    out_size: int = 224,
    max_window: int = 512,
    _padded_caps=None,
) -> np.ndarray:
    """Fixed-window patches around classified points → (N, out, out, C)."""
    import jax.numpy as jnp

    if _padded_caps is None:
        caps = slot_caps([min(window, max_window)], max_window)
        padded = jnp.asarray(pad_scene(image, caps))
    else:
        padded, caps = _padded_caps  # staged once by the sharded exporter
    scales = np.full((len(centers_yx), 1), window, np.int32)
    (patches,) = extract_multiscale_patches(
        padded, jnp.asarray(centers_yx, jnp.int32), jnp.asarray(scales),
        patch_sizes=(out_size,), caps=caps,
        out_channels=image.shape[-1],
    )
    return np.asarray(patches, np.float32)


def export_class_patches(
    out_dir: str,
    image: np.ndarray,
    centers_yx: np.ndarray,
    class_ids: np.ndarray,
    window: int = 224,
    out_size: int = 224,
    train_frac: float = 0.8,
    seed: int = 42,
    shard_size: int = 4096,
) -> dict[str, list[str]]:
    """Cut, split, and write class-labeled patches as .npz shards.

    Patches are cut PER SHARD so host memory is bounded by one shard
    (~shard_size × out² × C float32), not the whole export — a 100k-point
    run would otherwise materialize ~60 GB before the first write.
    """
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    caps = slot_caps([min(window, 512)], 512)
    staged = (jnp.asarray(pad_scene(image, caps)), caps)  # uploaded once
    centers_yx = np.asarray(centers_yx)
    tr, va = split_indices(len(centers_yx), train_frac, seed)
    written: dict[str, list[str]] = {"train": [], "val": []}
    for split, idx in (("train", tr), ("val", va)):
        for shard_no, start in enumerate(range(0, len(idx), shard_size)):
            take = idx[start : start + shard_size]
            path = os.path.join(out_dir, f"{split}_{shard_no:04d}.npz")
            np.savez_compressed(
                path,
                patches=cut_class_patches(
                    image, centers_yx[take], window, out_size,
                    _padded_caps=staged,
                ),
                labels=np.asarray(class_ids)[take],
                index=take,
            )
            written[split].append(path)
    return written


def load_patch_shard(path: str) -> tuple[np.ndarray, np.ndarray]:
    with np.load(path) as z:
        return z["patches"], z["labels"]
