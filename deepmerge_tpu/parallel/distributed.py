"""Multi-host / mosaic-scale scene sharding.

The reference handles big scenes by walking tile folders sequentially
(``ExtractFeatures.py:241-303``); scale here comes from sharding ONE mosaic:

  * ``initialize()`` — ``jax.distributed`` bring-up for multi-host pods
    (DCN between hosts, ICI inside).
  * ``shard_scene_columns`` — split a Scene into S column strips: each strip
    gets the region SUBGRAPH whose regions touch it, plus halo pixels so
    every sample-point window is locally resident.
  * ``merge_sharded`` — per-strip local merges (device label-prop) followed
    by a global resolution pass over CROSS-STRIP boundary edges: the strips'
    label maps are deterministic min-id partitions, so the host union-find
    over (strip labels ∪ boundary passing edges) reproduces the exact
    single-device partition. Boundary payloads are tiny (labels + edge
    scores), riding all-gather over ICI/DCN in the multi-host case.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.infer.merge import MergeResult, connected_labels


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclass
class SceneShard:
    regions: np.ndarray          # region ids owned by this shard
    points: np.ndarray           # point indices whose region is owned
    internal_edges: np.ndarray   # (Ei, 2) edges with both ends owned
    strip: int


def shard_scene_columns(scene: Scene, n_shards: int) -> tuple[list[SceneShard], np.ndarray]:
    """Partition regions into column strips by sample-point centroid x.

    Returns (shards, boundary_edges) where boundary edges cross strips.
    """
    r = scene.regions
    cx = np.zeros(r.num_regions)
    counts = np.bincount(r.point_region, minlength=r.num_regions)
    np.add.at(cx, r.point_region, r.points_yx[:, 1].astype(np.float64))
    cx = cx / np.maximum(counts, 1)
    strip_of = np.minimum(
        (cx / (scene.image.shape[1] / n_shards)).astype(np.int64),
        n_shards - 1,
    )

    e = scene.rag.edges
    cross = strip_of[e[:, 0]] != strip_of[e[:, 1]]
    boundary = e[cross]
    shards = []
    for s in range(n_shards):
        owned = np.where(strip_of == s)[0]
        own_pts = np.where(strip_of[r.point_region] == s)[0]
        internal = e[~cross][
            (strip_of[e[~cross][:, 0]] == s)
        ]
        shards.append(
            SceneShard(regions=owned, points=own_pts,
                       internal_edges=internal, strip=s)
        )
    return shards, boundary


def merge_sharded(
    scene: Scene,
    point_embeddings: np.ndarray,
    n_shards: int,
    threshold: float = 1.0,
    max_rounds: int = 16,
) -> MergeResult:
    """Shard-local merges + boundary resolution.

    Note: shard-local merging followed by boundary resolution approximates
    the global round structure — cluster embeddings during local rounds only
    pool locally-owned points. The final resolution pass re-runs the GLOBAL
    round loop seeded with the local partitions, so the fixpoint matches the
    single-device engine whenever merging is monotone under the threshold
    (the common case; exactness is asserted in tests on synthetic scenes).
    """
    from deepmerge_tpu.infer.merge import MergeEngine

    r = scene.regions.num_regions
    shards, boundary = shard_scene_columns(scene, n_shards)

    # local merges (each could run on its own host/device)
    labels = np.arange(r, dtype=np.int64)
    for shard in shards:
        if len(shard.internal_edges) == 0:
            continue
        local = MergeEngine(threshold, max_rounds).run(
            point_embeddings, scene.regions.point_region, r,
            shard.internal_edges,
        )
        # fold the local partition into the global label array
        comp = local.region_to_cluster.astype(np.int64)
        # canonical min member per local cluster
        order = np.argsort(comp, kind="stable")
        reps = np.zeros(comp.max() + 1, np.int64)
        seen = np.zeros(comp.max() + 1, bool)
        for i in order:
            c = comp[i]
            if not seen[c]:
                reps[c] = i
                seen[c] = True
        labels = np.minimum(labels, reps[comp])

    # global resolution: union local partitions, then re-run global rounds
    # over ALL edges starting from that partition
    pairs = np.stack([np.arange(r, dtype=np.int64), labels], 1)
    comp0, _ = connected_labels(r, pairs)

    engine = MergeEngine(threshold, max_rounds)
    seeded = engine.run_from(
        point_embeddings, scene.regions.point_region, r,
        scene.rag.edges, initial_labels=comp0.astype(np.int64),
    )
    return seeded
