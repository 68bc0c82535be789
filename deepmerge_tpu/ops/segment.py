"""Segment pooling and padded edge-batch scoring.

Replaces the reference's per-edge Python loop (``ExtractFeatures.py:150-225``:
gather a polygon's point embeddings by ID, mean-pool each side, Euclidean
distance, write ``simi``) with dense, padded device ops:

  * ``segment_mean`` — mean-pool point embeddings into region embeddings by
    region id (XLA ``segment_sum``; the scatter stays in HBM).
  * ``edge_distances`` — score a padded batch of RAG edges in one gather +
    fused reduction.
  * ``pairwise_sqdist`` — dense distance matrix (``Euclidean_distance`` at
    ``ExtractFeatures.py:119-147`` / ``MC_Lyu_2020`` at ``:228-238``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(embeddings, segment_ids, num_segments: int):
    """Mean-pool (N, D) point embeddings into (num_segments, D) by region id.

    Regions with zero points get a zero embedding. ``segment_ids`` may contain
    ``num_segments`` as a "padding" id; those rows are dropped.
    """
    sums = jax.ops.segment_sum(
        embeddings, segment_ids, num_segments=num_segments + 1
    )[:num_segments]
    # counts accumulate in f32 regardless of the embedding dtype: bf16
    # integer resolution ends at 256, which would silently saturate the
    # per-region point count on dense regions
    ones = jnp.ones((embeddings.shape[0],), jnp.float32)
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments + 1
    )[:num_segments]
    mean = sums.astype(jnp.float32) / jnp.maximum(counts, 1.0)[:, None]
    return mean.astype(sums.dtype)


@jax.jit
def pairwise_sqdist(x, y):
    """Dense squared Euclidean distance matrix (N, M), clamped at 0."""
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    d2 = x2 + y2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)


@jax.jit
def edge_distances(region_embeddings, edges, valid=None):
    """Score a padded batch of RAG edges.

    Args:
      region_embeddings: (R, D) mean-pooled region embeddings.
      edges: (E, 2) int32 region-id pairs (LEFT_FID/RIGHT_FID semantics,
        ``MyUtils2.py:177-193``); padding rows may point anywhere.
      valid: optional (E,) bool mask; padded rows score +inf.

    Returns:
      (E,) float32 Euclidean distances (the reference's ``simi`` attribute).
    """
    left = region_embeddings[edges[:, 0]]
    right = region_embeddings[edges[:, 1]]
    d2 = jnp.sum((left - right) ** 2, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    if valid is not None:
        d = jnp.where(valid, d, jnp.inf)
    return d
