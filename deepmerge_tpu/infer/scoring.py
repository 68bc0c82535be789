"""RAG edge scoring on device.

Replaces the reference's per-edge Python loop (``test_for_shp``,
``ExtractFeatures.py:150-225``): mean-pool each region's point embeddings,
then score ALL edges in padded batches with one fused gather+reduce — the
Euclidean distance written back as the ``simi`` edge attribute.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.ops.segment import edge_distances, segment_mean


def region_embeddings(
    point_embeddings: np.ndarray, point_region: np.ndarray, num_regions: int
) -> jnp.ndarray:
    """(P, D) point embeddings -> (R, D) mean-pooled region embeddings."""
    return segment_mean(
        jnp.asarray(point_embeddings, jnp.float32),
        jnp.asarray(point_region, jnp.int32),
        num_regions,
    )


def score_edges(
    region_emb: jnp.ndarray, edges: np.ndarray, edge_batch: int = 8192
) -> np.ndarray:
    """Distance per edge, padded-batched to a fixed compiled shape."""
    e = np.asarray(edges, np.int32)
    n = len(e)
    out = np.empty(n, np.float32)
    for start in range(0, n, edge_batch):
        chunk = e[start : start + edge_batch]
        pad = edge_batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
        d = np.asarray(edge_distances(region_emb, jnp.asarray(chunk)))
        out[start : start + edge_batch - pad] = d[: edge_batch - pad]
    return out


def score_scene_edges(
    scene: Scene, point_embeddings: np.ndarray, edge_batch: int = 8192
) -> np.ndarray:
    """Score every RAG edge of a scene; fills ``scene.rag.simi``."""
    remb = region_embeddings(
        point_embeddings,
        scene.regions.point_region,
        scene.regions.num_regions,
    )
    simi = score_edges(remb, scene.rag.edges, edge_batch)
    scene.rag.simi = simi
    return simi
