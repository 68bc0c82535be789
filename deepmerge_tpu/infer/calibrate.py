"""Merge-threshold calibration on a labeled validation scene.

The reference stops at scored edges (``ExtractFeatures.py:150-225`` writes
``simi`` and leaves thresholding to downstream tooling), so the merge
threshold is THIS framework's own deployment surface. The contrastive loss
margins on squared distance (``Losses.py:34-38``), which anchors the natural
operating point near ``sqrt(margin)`` — but the best threshold drifts with
the training trajectory (EVAL.md round 2: threshold 1.0 over-merged a
held-out scene to 0.71% pair disagreement; 0.6 rescued it). This module
turns that manual sweep into a utility: score a validation scene once, sweep
candidate thresholds through the device merge, and pick by partition
agreement with the validation labels.

Note: ``ops/labelprop.device_score_and_merge`` defaults to a
quantile-of-distances threshold — a fast self-calibrating heuristic that the
reference does NOT have. Use this module when a labeled validation scene is
available; the quantile default when none is.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.utils.parity import pair_disagreement


@dataclass
class CalibrationResult:
    threshold: float                 # argmin-disagreement threshold
    disagreement: float              # its pair disagreement
    clusters: int                    # cluster count at that threshold
    table: list = field(default_factory=list)  # (thr, clusters, disagreement)

    def __str__(self):
        rows = "\n".join(
            f"  thr={t:6.3f}  clusters={c:5d}  disagreement={d * 100:6.3f}%"
            for t, c, d in self.table
        )
        return (
            f"calibrated threshold {self.threshold:.3f} "
            f"({self.disagreement * 100:.3f}% pair disagreement, "
            f"{self.clusters} clusters)\n{rows}"
        )


def candidate_thresholds(
    scene: Scene, embeddings: np.ndarray, n: int = 15
) -> np.ndarray:
    """Data-driven sweep grid: quantiles of the scored RAG edge distances.

    Scoring once and sweeping quantiles of the ACTUAL distance distribution
    covers the decision surface better than a fixed linspace (distances
    concentrate near 0 and near the margin after contrastive training).
    """
    from deepmerge_tpu.infer.scoring import score_scene_edges

    # the padded/static-shape scorer (CLAUDE.md device-op convention):
    # shares compiled programs with the extract pipeline instead of
    # minting one program per distinct scene edge count
    d = np.asarray(score_scene_edges(scene, embeddings))
    d = d[np.isfinite(d)]
    if d.size == 0:
        raise ValueError(
            f"scene '{scene.name}' has no finite RAG edge distances to "
            "calibrate on (empty edge list or degenerate embeddings) — "
            "pick a validation scene with adjacent regions"
        )
    qs = np.quantile(d, np.linspace(0.05, 0.95, n))
    return np.unique(np.round(qs, 6))


def calibrate_threshold(
    scene: Scene,
    embeddings: np.ndarray,
    region_objects: np.ndarray | None = None,
    thresholds=None,
    max_rounds: int = 16,
) -> CalibrationResult:
    """Pick the merge threshold by agreement on a labeled validation scene.

    Args:
      scene: validation Scene (RAG + labels present).
      embeddings: (P, D) point embeddings of the scene.
      region_objects: (R,) ground-truth object id per region. Defaults to
        ``scene.object_of_region`` (synthetic scenes carry it).
      thresholds: candidate thresholds; default = distance quantiles.
      max_rounds: merge round cap per candidate.

    Returns CalibrationResult (threshold = argmin pair disagreement of the
    merged label map vs the object map; ties break toward the LARGER
    threshold, matching the reference's preference for merging).
    """
    import jax.numpy as jnp

    from deepmerge_tpu.ops.labelprop import device_merge

    if region_objects is None:
        region_objects = scene.object_of_region
    if region_objects is None:
        raise ValueError(
            "calibration needs ground-truth region objects "
            "(scene.object_of_region or the region_objects argument)"
        )
    if thresholds is None:
        thresholds = candidate_thresholds(scene, embeddings)

    # stage the scene ONCE; only the threshold scalar varies per candidate.
    # (merge_scene_device per candidate re-uploaded the full (P, D)
    # embedding array each iteration — multi-minute on the ~36 MB/s relay
    # for big scenes.)
    r = scene.regions.num_regions
    edges = np.asarray(scene.rag.edges, np.int32)
    pad = (-len(edges)) % 2048 if len(edges) else 2048
    valid = np.ones(len(edges), bool)
    if pad:
        edges = np.concatenate([edges, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    emb_dev = jnp.asarray(embeddings, jnp.float32)
    pr_dev = jnp.asarray(scene.regions.point_region, jnp.int32)
    e_dev, ev_dev = jnp.asarray(edges), jnp.asarray(valid)

    gt = np.asarray(region_objects)[scene.labels]
    table = []
    best = None
    # ascending sweep so the documented larger-threshold tie-break holds
    # regardless of the caller's grid order
    for thr in np.sort(np.asarray(thresholds, np.float64)):
        labels, _rounds = device_merge(
            emb_dev, pr_dev, e_dev, ev_dev, float(thr),
            num_regions=r, max_rounds=max_rounds,
        )
        _, dense = np.unique(np.asarray(labels), return_inverse=True)
        pred = dense.astype(np.int32)[scene.labels]
        dis = float(pair_disagreement(pred, gt))
        n_clusters = int(dense.max()) + 1
        table.append((float(thr), n_clusters, dis))
        if best is None or dis < best[2] - 1e-12:
            best = (float(thr), n_clusters, dis)
        elif dis <= best[2] + 1e-12:
            # epsilon-tie: prefer the larger threshold but KEEP the best
            # disagreement (don't let it drift upward across a long sweep)
            best = (float(thr), n_clusters, best[2])
    return CalibrationResult(
        threshold=best[0], disagreement=best[2], clusters=best[1], table=table
    )
