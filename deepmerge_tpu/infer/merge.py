"""Iterative region-merge engine.

The capability the reference only gestures at (it stops at scored edges,
``SURVEY.md §0``): rounds of

  device: cluster embeddings (segment mean over point embeddings)
          → padded edge-batch scoring
  host:   union-find over passing edges → stable relabel
          → RAG contraction (edge remap + dedupe)

until no edge scores under the merge threshold. Relabeling is deterministic
(roots ordered by smallest member id), which keeps multi-shard runs
reproducible — the parity bar (BASELINE.md) requires it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import functools

import jax
import jax.numpy as jnp

from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.ops.segment import edge_distances, segment_mean

try:
    from deepmerge_tpu.native import unionfind as _native_uf

    if not _native_uf.available():  # toolchain missing: pure-Python fallback
        _native_uf = None
except Exception:  # pragma: no cover - native ext optional
    _native_uf = None


class UnionFind:
    """Path-halving union-find with deterministic min-root relabel."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return int(x)

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb

    def union_edges(self, edges: np.ndarray) -> None:
        for a, b in edges:
            self.union(int(a), int(b))

    def labels(self) -> tuple[np.ndarray, int]:
        """Compress to dense labels 0..k-1 ordered by smallest member id."""
        n = len(self.parent)
        roots = np.fromiter((self.find(i) for i in range(n)), np.int64, n)
        uniq, dense = np.unique(roots, return_inverse=True)
        return dense.astype(np.int32), len(uniq)


def connected_labels(n: int, edges: np.ndarray) -> tuple[np.ndarray, int]:
    """Dense connected-component labels of n nodes under ``edges``."""
    if _native_uf is not None:
        return _native_uf.connected_labels(n, edges)
    uf = UnionFind(n)
    uf.union_edges(edges)
    return uf.labels()


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _round_scores(point_embeddings, pt_cluster, edges, num_segments: int):
    """One merge round's device work in one dispatch: pool + score."""
    cemb = segment_mean(point_embeddings, pt_cluster, num_segments)
    return edge_distances(cemb, edges)


@dataclass
class MergeResult:
    region_to_cluster: np.ndarray          # (R,) final cluster id per region
    num_clusters: int
    rounds: int
    edges_scored: int
    merges_per_round: list[int] = field(default_factory=list)

    def label_map(self, scene: Scene) -> np.ndarray:
        """Merged (H, W) label map: region labels → cluster ids."""
        return self.region_to_cluster[scene.labels]


class MergeEngine:
    """Round-based merge loop over a scored RAG."""

    def __init__(
        self,
        threshold: float = 1.0,
        max_rounds: int = 16,
        edge_batch: int = 8192,
    ):
        self.threshold = threshold
        self.max_rounds = max_rounds
        self.edge_batch = edge_batch

    def run(
        self,
        point_embeddings: np.ndarray,
        point_region: np.ndarray,
        num_regions: int,
        edges: np.ndarray,
    ) -> MergeResult:
        return self.run_from(point_embeddings, point_region, num_regions, edges)

    def run_from(
        self,
        point_embeddings: np.ndarray,
        point_region: np.ndarray,
        num_regions: int,
        edges: np.ndarray,
        initial_labels: np.ndarray | None = None,
    ) -> MergeResult:
        """Merge rounds starting from an existing partition (dense labels).

        Used by the sharded mosaic path to resolve shard-local partitions
        into the global fixpoint.
        """
        point_region = np.asarray(point_region, np.int64)
        if initial_labels is None:
            cur_labels = np.arange(num_regions, dtype=np.int64)
        else:
            cur_labels = np.asarray(initial_labels, np.int64).copy()
        cur_edges = np.asarray(edges, np.int64)
        # contract edges through the initial partition
        if initial_labels is not None:
            remapped = cur_labels[cur_edges]
            keep = remapped[:, 0] != remapped[:, 1]
            remapped = remapped[keep]
            lo = np.minimum(remapped[:, 0], remapped[:, 1])
            hi = np.maximum(remapped[:, 0], remapped[:, 1])
            cur_edges = np.unique(np.stack([lo, hi], 1), axis=0)
        n_clusters = (
            int(cur_labels.max()) + 1 if initial_labels is not None else num_regions
        )
        total_scored = 0
        merges = []
        rounds = 0

        emb_dev = jnp.asarray(point_embeddings, jnp.float32)

        for rounds in range(1, self.max_rounds + 1):
            if len(cur_edges) == 0:
                rounds -= 1
                break
            # device: cluster embeddings + edge scores as ONE dispatch
            # (dispatch overhead dominates these tiny computations).
            # num_segments stays pinned at the initial region count so every
            # round reuses ONE compiled kernel (cluster ids are always < R).
            pt_cluster = cur_labels[point_region]
            e = cur_edges
            pad = (-len(e)) % self.edge_batch
            if pad:
                e = np.concatenate([e, np.zeros((pad, 2), e.dtype)])
            d = np.asarray(
                _round_scores(
                    emb_dev,
                    jnp.asarray(pt_cluster, jnp.int32),
                    jnp.asarray(e, jnp.int32),
                    num_regions,
                )
            )[: len(cur_edges)]
            total_scored += len(cur_edges)

            passing = cur_edges[d < self.threshold]
            merges.append(len(passing))
            if len(passing) == 0:
                rounds -= 1
                break

            # host: union-find over passing edges, stable relabel
            comp, n_new = connected_labels(n_clusters, passing)
            cur_labels = comp.astype(np.int64)[cur_labels]

            # contract the RAG
            remapped = comp[cur_edges]
            keep = remapped[:, 0] != remapped[:, 1]
            remapped = remapped[keep]
            lo = np.minimum(remapped[:, 0], remapped[:, 1])
            hi = np.maximum(remapped[:, 0], remapped[:, 1])
            cur_edges = np.unique(np.stack([lo, hi], 1), axis=0)
            n_clusters = n_new

        return MergeResult(
            region_to_cluster=cur_labels.astype(np.int32),
            num_clusters=n_clusters,
            rounds=rounds,
            edges_scored=total_scored,
            merges_per_round=merges,
        )


def merge_scene(
    scene: Scene,
    point_embeddings: np.ndarray,
    threshold: float = 1.0,
    max_rounds: int = 16,
    edge_batch: int = 8192,
) -> MergeResult:
    engine = MergeEngine(threshold, max_rounds, edge_batch)
    return engine.run(
        point_embeddings,
        scene.regions.point_region,
        scene.regions.num_regions,
        scene.rag.edges,
    )


def merge_scene_device(
    scene: Scene,
    point_embeddings: np.ndarray,
    threshold: float = 1.0,
    max_rounds: int = 16,
    edge_pad: int = 2048,
) -> MergeResult:
    """Fully on-device merge (ONE dispatch): min-label-propagation rounds.

    Produces the same partition as ``merge_scene`` (both use deterministic
    min-id components); labels are densified on the host afterwards.
    """
    from deepmerge_tpu.ops.labelprop import device_merge

    r = scene.regions.num_regions
    edges = np.asarray(scene.rag.edges, np.int32)
    pad = (-len(edges)) % edge_pad if len(edges) else edge_pad
    valid = np.ones(len(edges), bool)
    if pad:
        edges = np.concatenate([edges, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])

    labels, rounds = device_merge(
        jnp.asarray(point_embeddings, jnp.float32),
        jnp.asarray(scene.regions.point_region, jnp.int32),
        jnp.asarray(edges),
        jnp.asarray(valid),
        threshold,
        num_regions=r,
        max_rounds=max_rounds,
    )
    # edges_scored counts the work THIS engine did: the device loop scores
    # the full padded-valid edge set every sweep, including the terminal
    # sweep that found nothing to merge (rounds counts only merging rounds,
    # so a no-merge scene still scored everything once). The host engine's
    # count differs by construction — it rescoring only the contracted
    # edge list each round.
    sweeps_run = min(int(rounds) + 1, max_rounds)
    return labels_to_result(labels, rounds,
                            edges_scored=sweeps_run * int(np.sum(valid)))


def write_label_geotiff(path: str, label_map, geotransform=None) -> None:
    """Write an (H, W) merged label map as a GeoTIFF.

    Label ids pack into 3 little-endian uint8 planes (up to 16.7M
    clusters) so any TIFF consumer can open the file; decode with
    ``arr[...,0] | arr[...,1]<<8 | arr[...,2]<<16``.
    """
    import numpy as np

    from deepmerge_tpu.geodata.geotiff import write_geotiff

    lm = np.asarray(label_map).astype(np.uint32)
    packed = np.stack(
        [lm & 0xFF, (lm >> 8) & 0xFF, (lm >> 16) & 0xFF], -1
    ).astype(np.uint8)
    write_geotiff(path, packed, geotransform or (0, 1, 0, 0, 0, -1))


def labels_to_result(labels, rounds, scene: Scene | None = None,
                     edges_scored: int | None = None) -> MergeResult:
    """Densify min-member-id labels (``device_merge`` /
    ``distributed_merge`` output) into a MergeResult on the host."""
    labels = np.asarray(labels)
    uniq, dense = np.unique(labels, return_inverse=True)
    if edges_scored is None:
        edges_scored = int(rounds) * (
            len(scene.rag.edges) if scene is not None else 0
        )
    return MergeResult(
        region_to_cluster=dense.astype(np.int32),
        num_clusters=len(uniq),
        rounds=int(rounds),
        edges_scored=edges_scored,
    )
