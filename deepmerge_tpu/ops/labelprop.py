"""Fully on-device iterative merge via min-label propagation.

The host merge engine (``infer/merge.py``) does union-find + RAG contraction
on the CPU between device scoring rounds — each round costs a dispatch
(~28ms on relayed platforms) plus host work. This module runs the ENTIRE
iterative merge as ONE jitted program:

  round:  cluster embeddings (segment mean over current labels)
          → score every original RAG edge through its clusters' labels
          → passing = distance < threshold (and endpoints differ)
          → connected components of passing edges by min-label propagation
            (scatter-min over edges + pointer jumping, O(log R) sweeps)
  until no edge passes or max_rounds.

Labels use min-member-id semantics (label of a cluster = smallest region id
in it) — identical to the host engine's deterministic min-root relabel, just
not densified until the host reads the result back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepmerge_tpu.ops.segment import edge_distances, segment_mean


def _propagate(labels, edges, valid, sweeps: int):
    """Min-label connected components over masked edges.

    Early-exits once a sweep changes nothing — converged labels are a
    fixpoint of the sweep, so the result is identical to running all
    ``sweeps`` iterations (which remains the worst-case bound).
    """
    a, b = edges[:, 0], edges[:, 1]
    big = jnp.iinfo(labels.dtype).max

    def sweep(labels):
        la = labels[a]
        lb = labels[b]
        m = jnp.minimum(la, lb)
        upd = jnp.where(valid, m, big)
        labels = labels.at[a].min(upd)
        labels = labels.at[b].min(upd)
        # pointer jumping: labels follow their own label's label
        return jnp.minimum(labels, labels[labels])

    def body(state):
        labels, i, _ = state
        new = sweep(labels)
        return new, i + 1, jnp.any(new != labels)

    def cond(state):
        _, i, changed = state
        return changed & (i < sweeps)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.int32(0), jnp.bool_(True))
    )
    return labels


@functools.partial(
    jax.jit, static_argnames=("num_regions", "max_rounds", "sweeps")
)
def device_score_and_merge(
    point_embeddings,
    point_region,
    edges,
    edge_valid,
    num_regions: int,
    max_rounds: int = 16,
    sweeps: int = 16,
    threshold_quantile: float = 0.5,
    threshold=None,
):
    """ONE dispatch for the whole scoring+merge tail of the pipeline:

    initial region pooling → edge distances (the ``simi`` attribute) →
    threshold = quantile of valid distances (or the absolute traced
    ``threshold`` when given, e.g. a calibrated one) → iterative device
    merge.

    NB the quantile threshold is NOT a reference semantic — the reference
    stops at scored edges (``ExtractFeatures.py:150-225``) and never
    thresholds. The quantile (floor-index, matching
    ``np.quantile(method='lower')``) is a scale-free default for
    single-dispatch pipelines with untrained/uncalibrated embeddings;
    deployments should calibrate an absolute threshold on a labeled
    validation scene (``infer/calibrate.py``, ``calibrate`` CLI) and pass
    it via ``cfg.merge.threshold`` / ``device_merge`` instead.

    Returns (simi (E,), labels (R,), rounds); padded simi rows are +inf.
    """
    emb = point_embeddings.astype(jnp.float32)
    pr = point_region.astype(jnp.int32)
    remb = segment_mean(emb, pr, num_regions)
    simi = edge_distances(remb, edges, edge_valid)  # padded rows score +inf
    if threshold is None:
        valid_sorted = jnp.sort(simi)
        n_valid = jnp.sum(edge_valid)
        q_idx = jnp.clip(
            (threshold_quantile * (n_valid - 1)).astype(jnp.int32), 0,
            simi.shape[0] - 1,
        )
        threshold = valid_sorted[q_idx]
    else:
        # absolute (e.g. calibrated — infer/calibrate.py) threshold; rides
        # as a TRACED scalar so sweeps reuse the compiled program
        threshold = jnp.asarray(threshold, jnp.float32)
    labels, rounds = device_merge(
        emb, pr, edges, edge_valid, threshold,
        num_regions=num_regions, max_rounds=max_rounds, sweeps=sweeps,
    )
    return simi, labels, rounds


@functools.partial(
    jax.jit, static_argnames=("num_regions", "max_rounds", "sweeps")
)
def device_merge(
    point_embeddings,
    point_region,
    edges,
    edge_valid,
    threshold,
    num_regions: int,
    max_rounds: int = 16,
    sweeps: int = 16,
):
    """One-dispatch iterative merge.

    Args:
      point_embeddings: (P, D) float32.
      point_region: (P,) int32 region id per point. May contain
        ``num_regions`` as a PADDING id (like ``segment_mean``): those
        rows never contribute to any cluster embedding, so callers can
        keep the point axis statically padded across scenes.
      edges: (E, 2) int32 ORIGINAL RAG edges (padding allowed).
      edge_valid: (E,) bool mask for padding.
      threshold: merge edges with Euclidean distance < threshold.
      num_regions: static region count R.
      max_rounds: merge round cap.
      sweeps: label-propagation sweeps per round (≥ log2 of the longest
        merge chain; 16 covers 65k-region chains).

    Returns:
      labels (R,) int32 min-member-id cluster labels, rounds (int32).
    """
    labels0 = jnp.arange(num_regions, dtype=jnp.int32)
    pr = point_region.astype(jnp.int32)
    pad_pt = pr >= num_regions
    emb = point_embeddings.astype(jnp.float32)

    def round_body(state):
        labels, rounds, _changed = state
        # padding rows keep the sentinel id through the label gather
        # (labels[pr] would CLAMP the out-of-range sentinel onto the last
        # real region when R fills its bucket exactly); segment_mean then
        # drops them
        pt_cluster = jnp.where(pad_pt, num_regions, labels[pr])
        cemb = segment_mean(emb, pt_cluster, num_regions)
        la = labels[edges[:, 0]]
        lb = labels[edges[:, 1]]
        d2 = jnp.sum((cemb[la] - cemb[lb]) ** 2, axis=-1)
        passing = (
            edge_valid
            & (la != lb)
            & (d2 < jnp.asarray(threshold, jnp.float32) ** 2)
        )
        relabeled = _propagate(
            labels, jnp.stack([la, lb], axis=1), passing, sweeps
        )
        changed = jnp.any(passing)
        return relabeled, rounds + changed.astype(jnp.int32), changed

    def cond(state):
        _, rounds, changed = state
        return changed & (rounds < max_rounds)

    labels, rounds, _ = jax.lax.while_loop(
        cond, round_body, (labels0, jnp.int32(0), jnp.bool_(True))
    )
    return labels, rounds


@jax.jit
def merged_label_map(labels, region_map_hw, num_real=None):
    """Dense-relabel cluster labels and expand to an (H, W) merged map —
    entirely on device, output device-resident.

    The host equivalent (``np.unique(labels, return_inverse=True)`` then
    ``dense[scene.labels]``, e.g. ``infer/merge.py``) gathers millions of
    pixels on the CPU (~tens of ms per scene on small hosts); on device the
    same work is one sort over R plus one HBM-bandwidth gather. Downstream
    device consumers (tile writers, mosaic compositors) keep the map on
    device; only pull it to host when a file must be written.

    Args:
      labels: (R,) int32 min-member-id cluster labels (``device_merge``).
      region_map_hw: (H, W) int32 superpixel region-id map (device array;
        upload once per scene alongside staging).
      num_real: optional TRACED region count when ``labels`` carries a
        region axis padded up to a bucket (``region_bucket`` in
        ``infer/extract.py``: phantom regions ``num_real..R-1`` have no
        points and no edges, so they stay singleton clusters whose labels
        sort strictly AFTER every real label — the dense ids of real
        clusters are unaffected). ``num_clusters`` then counts only
        clusters with a member below ``num_real``.

    Returns:
      (map_hw (H, W) int32 dense labels 0..k-1 ordered by smallest member
       id — identical to the host np.unique relabel — and num_clusters
       (int32 scalar)).
    """
    s = jnp.sort(labels)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    dense_at_sorted = (jnp.cumsum(first) - 1).astype(jnp.int32)
    dense = dense_at_sorted[jnp.searchsorted(s, labels)]
    if num_real is None:
        n_clusters = dense_at_sorted[-1] + 1
    else:
        n_clusters = jnp.sum(
            first & (s < jnp.asarray(num_real, s.dtype))
        ).astype(jnp.int32)
    return dense[region_map_hw], n_clusters
