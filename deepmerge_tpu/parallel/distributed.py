"""Multi-host / mosaic-scale scene sharding.

The reference handles big scenes by walking tile folders sequentially
(``ExtractFeatures.py:241-303``); scale here comes from sharding ONE mosaic:

  * ``initialize()`` — ``jax.distributed`` bring-up for multi-host pods
    (DCN between hosts, ICI inside).
  * ``shard_scene_columns`` — split a Scene into S column strips: each strip
    gets the region SUBGRAPH whose regions touch it, plus halo pixels so
    every sample-point window is locally resident.
  * ``merge_sharded_approx`` — HOST partition-level simulation (per-strip
    local merges + a global resolution pass). Exact only for monotone
    merging — the name carries the caveat; the exact memory-distributed
    path is ``extract_and_merge_sharded`` / ``distributed_merge``.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass

import numpy as np

from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.infer.merge import MergeResult, connected_labels

LABEL_BIG = np.iinfo(np.int32).max


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
    same = e[~cross]
    same_strip = strip_of[same[:, 0]]
    shards = []
    for s in range(n_shards):
        owned = np.where(strip_of == s)[0]
        own_pts = np.where(strip_of[r.point_region] == s)[0]
        shards.append(
            SceneShard(regions=owned, points=own_pts,
                       internal_edges=same[same_strip == s], strip=s)
        )
    return shards, boundary


def merge_sharded_approx(
    scene: Scene,
    point_embeddings: np.ndarray,
    n_shards: int,
    threshold: float = 1.0,
    max_rounds: int = 16,
) -> MergeResult:
    """HOST simulation: shard-local merges + boundary resolution. APPROX —
    exact only for monotone merging.

    This is a partition-level simulation only — every shard reads the
    global embedding array, and local-first merging is exact only when
    merging is monotone under the threshold (non-monotone chains can
    diverge from the single-device partition). The REAL memory-distributed
    path is ``extract_and_merge_sharded`` below (disjoint per-shard pixel
    tiles + exact collective merge rounds); this one is kept as a host
    fallback and as documentation of the two-phase alternative — the
    ``_approx`` suffix is the API-level caveat.
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
        # fold the local partition into the global label array:
        # canonical rep = min member id per local cluster (vectorized)
        comp = local.region_to_cluster.astype(np.int64)
        reps = np.full(comp.max() + 1, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(reps, comp, np.arange(r, dtype=np.int64))
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


# ---------------------------------------------------------------------------
# Memory-distributed path: disjoint per-shard pixel tiles (+halo) and an
# EXACT collective merge — no monotonicity assumption.
# ---------------------------------------------------------------------------


@dataclass
class StagedShards:
    """Scene staged as S physically disjoint column-strip shards.

    All arrays have leading axis S and are meant to be sharded over a mesh
    data axis: device s sees ONLY its strip's pixels (plus halo columns wide
    enough to cover every owned point's largest gather window) and ONLY its
    own points. Together with ``distributed_merge``'s collective rounds this
    is the memory-distributed analog of the reference's sequential tile walk
    (``ExtractFeatures.py:241-303``).
    """

    tiles: np.ndarray           # (S, Hp, Wp, C) uint8, pad_scene layout
    centers: np.ndarray         # (S, Pm, 2) int32 tile-LOCAL yx
    point_region: np.ndarray    # (S, Pm) int32; padding rows = num_regions
    features: np.ndarray        # (S, Pm, 15) float32
    inner: np.ndarray           # (S, Pm) int32
    object_: np.ndarray         # (S, Pm) int32
    edges: np.ndarray           # (S, Em, 2) int32 partition of the RAG
    edge_valid: np.ndarray      # (S, Em) bool
    caps: tuple[int, ...]       # static window caps (global, shared)
    num_regions: int


def stage_scene_shards(scene: Scene, cfg, n_shards: int) -> StagedShards:
    """Split a Scene into column-strip shards with real pixel halos.

    Each shard's tile holds only the columns its points can touch
    (point x ± (max(caps)/2 + alignment) — exactly ``scene_pad``'s reach),
    so shard inputs are physically disjoint sub-arrays of the mosaic, not
    views of the global scene. Window content is identical to the global
    staging, hence embeddings are identical.
    """
    from deepmerge_tpu.ops.patches import pad_scene, scene_pad, staging_caps

    r = scene.regions
    R = r.num_regions
    feats, inner, obj = r.point_meta()

    # global caps (shared static shape across shards); warns on clamping
    caps = staging_caps(inner, obj, cfg.patch_sizes, cfg.max_window,
                        scene_name=scene.name)
    c = scene.image.shape[-1]
    halo = scene_pad(caps, c)  # max window half-extent + DMA alignment spill

    # regions → strips by point-centroid x; points follow their region
    cx = np.zeros(R)
    counts = np.bincount(r.point_region, minlength=R)
    np.add.at(cx, r.point_region, r.points_yx[:, 1].astype(np.float64))
    cx = cx / np.maximum(counts, 1)
    strip_of = np.minimum(
        (cx / (scene.image.shape[1] / n_shards)).astype(np.int64),
        n_shards - 1,
    )
    pt_strip = strip_of[r.point_region]

    # edge partition: each edge scored by exactly one shard (min endpoint's)
    e = np.asarray(scene.rag.edges, np.int64)
    e_strip = np.minimum(strip_of[e[:, 0]], strip_of[e[:, 1]])

    pm = max(int(np.max(np.bincount(pt_strip, minlength=n_shards))), 1)
    em = max(int(np.max(np.bincount(e_strip, minlength=n_shards))), 1)

    h, w = scene.image.shape[:2]
    # tile bounds per shard from OWNED point x-range ± halo
    tiles, centers_l = [], []
    point_region_l, feats_l, inner_l, obj_l = [], [], [], []
    edges_l, evalid_l = [], []
    widths = []
    bounds = []
    for s in range(n_shards):
        pts = np.where(pt_strip == s)[0]
        if len(pts):
            xs = r.points_yx[pts, 1].astype(np.int64)
            xlo = max(int(xs.min()) - halo, 0)
            xhi = min(int(xs.max()) + halo + 1, w)
        else:
            xlo, xhi = 0, 1
        bounds.append((xlo, xhi))
        widths.append(xhi - xlo)
    wmax = max(widths)

    for s in range(n_shards):
        xlo, xhi = bounds[s]
        tile = np.zeros((h, wmax, c), scene.image.dtype)
        tile[:, : xhi - xlo] = scene.image[:, xlo:xhi]
        tiles.append(pad_scene(tile, caps))

        pts = np.where(pt_strip == s)[0]
        n = len(pts)
        ctr = np.zeros((pm, 2), np.int32)
        pr = np.full(pm, R, np.int32)          # sentinel: dropped by pooling
        ft = np.zeros((pm, feats.shape[1]), np.float32)
        inn = np.full(pm, 8, np.int32)
        ob = np.full(pm, 16, np.int32)
        if n:
            ctr[:n, 0] = r.points_yx[pts, 0]
            ctr[:n, 1] = r.points_yx[pts, 1] - xlo
            pr[:n] = r.point_region[pts]
            ft[:n] = feats[pts]
            inn[:n] = inner[pts]
            ob[:n] = obj[pts]
        centers_l.append(ctr)
        point_region_l.append(pr)
        feats_l.append(ft)
        inner_l.append(inn)
        obj_l.append(ob)

        es = np.where(e_strip == s)[0]
        ed = np.zeros((em, 2), np.int32)
        ev = np.zeros(em, bool)
        ed[: len(es)] = e[es]
        ev[: len(es)] = True
        edges_l.append(ed)
        evalid_l.append(ev)

    return StagedShards(
        tiles=np.stack(tiles),
        centers=np.stack(centers_l),
        point_region=np.stack(point_region_l),
        features=np.stack(feats_l),
        inner=np.stack(inner_l),
        object_=np.stack(obj_l),
        edges=np.stack(edges_l),
        edge_valid=np.stack(evalid_l),
        caps=caps,
        num_regions=R,
    )


def _collective_merge_rounds(
    emb, pr, edges, evalid, threshold, num_regions: int,
    max_rounds: int, sweeps: int, axis: str,
):
    """device_merge's round loop with its two reductions made collective.

    Exactness: per round, the global cluster embedding is psum of per-shard
    partial segment sums (== the global segment sum); each edge is scored by
    exactly one shard against those global embeddings; each propagation
    sweep's scatter-min is a per-shard partial min combined by pmin (min is
    associative, so this IS the global scatter-min), after which labels are
    replicated and pointer jumping is shard-local deterministic. Every round
    therefore produces bit-identical labels to the single-device
    ``ops/labelprop.device_merge`` — monotone or not.

    Knife-edge caveat, now MEASURED instead of assumed: the f32 summation
    ORDER of the psum differs from single-device, so a squared distance
    within float rounding of ``threshold²`` could flip a comparison between
    the two. The returned ``margin`` is the minimum |d² − threshold²| over
    every real edge of every round — callers warn when it is small (see
    ``distributed_merge``), turning the previously unguarded bit-identical
    claim into a runtime-checked one.
    """
    import jax
    import jax.numpy as jnp

    R = num_regions
    labels0 = jnp.arange(R, dtype=jnp.int32)
    big = jnp.int32(LABEL_BIG)
    ea, eb = edges[:, 0], edges[:, 1]
    ones = jnp.ones((emb.shape[0],), jnp.float32)

    pr_real = pr < R  # padding points carry the R sentinel

    def round_body(state):
        labels, rounds, _, margin = state
        # padding points route to segment R, which pooling drops (an
        # unguarded labels[pr] would CLAMP to R-1 and pollute that cluster)
        pt_cluster = jnp.where(
            pr_real, labels[jnp.minimum(pr, R - 1)], jnp.int32(R)
        )
        sums = jax.ops.segment_sum(emb, pt_cluster, num_segments=R + 1)[:R]
        cnts = jax.ops.segment_sum(ones, pt_cluster, num_segments=R + 1)[:R]
        sums = jax.lax.psum(sums, axis)
        cnts = jax.lax.psum(cnts, axis)
        cemb = sums / jnp.maximum(cnts, 1.0)[:, None]
        la, lb = labels[ea], labels[eb]
        d2 = jnp.sum((cemb[la] - cemb[lb]) ** 2, axis=-1)
        thr2 = jnp.asarray(threshold, jnp.float32) ** 2
        passing = evalid & (la != lb) & (d2 < thr2)
        live = evalid & (la != lb)
        margin = jnp.minimum(
            margin,
            jnp.min(jnp.where(live, jnp.abs(d2 - thr2), jnp.inf)),
        )

        def sweep(_, labels):
            cur = jnp.minimum(labels[la], labels[lb])
            upd = jnp.where(passing, cur, big)
            l2 = labels.at[la].min(upd).at[lb].min(upd)
            l2 = jax.lax.pmin(l2, axis)
            return jnp.minimum(l2, l2[l2])

        relabeled = jax.lax.fori_loop(0, sweeps, sweep, labels)
        changed = jax.lax.psum(jnp.any(passing).astype(jnp.int32), axis) > 0
        return relabeled, rounds + changed.astype(jnp.int32), changed, margin

    def cond(state):
        _, rounds, changed, _ = state
        return changed & (rounds < max_rounds)

    labels, rounds, _, margin = jax.lax.while_loop(
        cond, round_body,
        (labels0, jnp.int32(0), jnp.bool_(True), jnp.float32(jnp.inf)),
    )
    return labels, rounds, jax.lax.pmin(margin, axis)


def distributed_merge(
    point_embeddings: np.ndarray,
    point_region: np.ndarray,
    num_regions: int,
    edges: np.ndarray,
    mesh,
    threshold: float,
    max_rounds: int = 16,
    sweeps: int = 16,
    axis: str = "data",
) -> tuple[np.ndarray, int]:
    """Collective merge over points/edges sharded across a mesh axis.

    Returns (labels (R,) min-member ids, rounds) — bit-identical to
    ``ops/labelprop.device_merge`` (see ``_collective_merge_rounds``).
    """
    import jax.numpy as jnp

    S = mesh.shape[axis]
    R = num_regions
    emb = np.asarray(point_embeddings, np.float32)
    pr = np.asarray(point_region, np.int32)
    p_pad = (-len(pr)) % S
    if p_pad:
        emb = np.concatenate([emb, np.zeros((p_pad, emb.shape[1]), np.float32)])
        pr = np.concatenate([pr, np.full(p_pad, R, np.int32)])
    e = np.asarray(edges, np.int32)
    ev = np.ones(len(e), bool)
    e_pad = (-len(e)) % S if len(e) else S
    if e_pad:
        e = np.concatenate([e, np.zeros((e_pad, 2), np.int32)])
        ev = np.concatenate([ev, np.zeros(e_pad, bool)])

    fn = _merge_shardmap_fn(mesh, axis, R, max_rounds, sweeps)
    labels, rounds, margin = fn(
        jnp.asarray(emb), jnp.asarray(pr), jnp.asarray(e), jnp.asarray(ev),
        jnp.float32(threshold),
    )
    _warn_knife_edge(float(margin), threshold)
    return np.asarray(labels), int(rounds)


# compiled shard_map programs keyed per (mesh, axis, R, rounds, sweeps) —
# rebuilding jax.jit(shard_map(...)) per CALL would recompile identical
# programs (minutes each through the remote-compile relay) on every
# threshold sweep or same-shaped scene; threshold is a traced argument.
# Bounded LRU: heterogeneous folder walks mint one entry per distinct
# scene signature (R and staged caps are in the extract key), and each
# entry pins a compiled executable — unbounded growth would leak programs
# on multi-hundred-scene jobs.
_MERGE_FN_CACHE: OrderedDict = OrderedDict()
_MERGE_FN_CACHE_MAX = 16


def _merge_cache_put(key, fn):
    _MERGE_FN_CACHE[key] = fn
    while len(_MERGE_FN_CACHE) > _MERGE_FN_CACHE_MAX:
        _MERGE_FN_CACHE.popitem(last=False)


def _merge_cache_get(key):
    fn = _MERGE_FN_CACHE.get(key)
    if fn is not None:
        _MERGE_FN_CACHE.move_to_end(key)
    return fn


def _merge_shardmap_fn(mesh, axis, R, max_rounds, sweeps):
    import jax
    from jax.sharding import PartitionSpec as P

    key = (mesh, axis, R, max_rounds, sweeps)
    fn = _merge_cache_get(key)
    if fn is None:
        def local(emb, pr, e, ev, thr):
            return _collective_merge_rounds(
                emb, pr, e, ev, thr, R, max_rounds, sweeps, axis
            )

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
        _merge_cache_put(key, fn)
    return fn


def extract_and_merge_sharded(
    model,
    params,
    scene: Scene,
    cfg,
    mesh,
    threshold: float = 1.0,
    max_rounds: int = 16,
    sweeps: int = 16,
    axis: str = "data",
    batch_stats=None,
) -> MergeResult:
    """Memory-distributed extract+merge over a device mesh.

    ONE jitted shard_map program: each device gathers patches from ITS OWN
    strip tile (disjoint pixels + halo), embeds only its own points, and the
    merge rounds run with psum/pmin collectives (see
    ``_collective_merge_rounds`` for the exactness argument). The only
    global-size arrays a device ever holds are the (R, D) cluster-embedding
    table and the (R,) label vector — pixels, points and edges stay sharded.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from deepmerge_tpu.ops.patches import (
        adaptive_scales,
        extract_multiscale_patches,
    )

    n_shards = mesh.shape[axis]
    staged = stage_scene_shards(scene, cfg, n_shards)
    R = staged.num_regions
    mcfg = model.cfg
    # v4/v5 variants carry a batch_stats collection (AuxBlock BatchNorm);
    # it rides replicated alongside params
    batch_stats = batch_stats or {}
    has_bs = bool(batch_stats)
    targets = tuple(cfg.patch_sizes) + (1,) * (
        cfg.factor_slots - len(cfg.patch_sizes)
    )
    scales, factors = adaptive_scales(staged.inner, staged.object_, targets)
    scales = np.asarray(scales)
    factors = np.asarray(factors)

    if str(mcfg.quantize).startswith("w8a8-static"):
        # static-quant serving needs calibrated activation scales; absent,
        # calibrate once on shard 0's points (bf16 forward with amax taps —
        # pass pre-calibrated batch_stats for bit-exact parity with a
        # single-device extractor calibrated elsewhere)
        from deepmerge_tpu.infer.extract import _tree_has_key

        if not _tree_has_key(batch_stats, "act_amax"):
            def _calib(params_, bs_, tile, centers, feats, scl, fac):
                patches = extract_multiscale_patches(
                    tile, centers, scl,
                    patch_sizes=tuple(mcfg.input_image_scales),
                    caps=staged.caps, quantize_uint8=cfg.quantize_uint8,
                    out_channels=mcfg.in_channels,
                    out_dtype=jnp.dtype(mcfg.dtype),
                )
                designed = jnp.concatenate([feats, fac], axis=1)
                variables = {"params": params_}
                if bs_:
                    variables["batch_stats"] = bs_
                _, upd = model.apply(variables, patches, designed, False,
                                     mutable=["batch_stats"])
                return upd["batch_stats"]

            batch_stats = jax.jit(_calib)(
                params, batch_stats, jnp.asarray(staged.tiles[0]),
                jnp.asarray(staged.centers[0]),
                jnp.asarray(staged.features[0], jnp.float32),
                jnp.asarray(scales[0]),
                jnp.asarray(factors[0], jnp.float32),
            )
            has_bs = True

    # compiled once per (model/mesh/shape signature); threshold is traced.
    # NB the params/batch_stats PyTree STRUCTURE is part of the signature
    # (in_specs are built from it), so it joins the key.
    key = (
        model, mesh, axis, R, max_rounds, sweeps, staged.caps,
        tuple(cfg.patch_sizes), cfg.quantize_uint8, has_bs,
        jax.tree.structure(params), jax.tree.structure(batch_stats),
    )
    fn = _merge_cache_get(key)
    if fn is None:
        # bind scalars, NOT `staged`/`cfg` — the closure outlives the scene
        # in the module-global cache, and capturing staged would pin its
        # full pixel tiles (tens of MB per real mosaic) forever
        caps = staged.caps
        quantize = cfg.quantize_uint8

        def local(params, bs_, tile, centers, feats, scl, fac, pr, edges,
                  evalid, thr):
            tile, centers, feats = tile[0], centers[0], feats[0]
            scl, fac, pr = scl[0], fac[0], pr[0]
            edges, evalid = edges[0], evalid[0]
            patches = extract_multiscale_patches(
                tile, centers, scl,
                patch_sizes=tuple(mcfg.input_image_scales),
                caps=caps, quantize_uint8=quantize,
                out_channels=mcfg.in_channels,
                out_dtype=jnp.dtype(mcfg.dtype),
            )
            designed = jnp.concatenate([feats, fac], axis=1)
            variables = {"params": params}
            if has_bs:
                variables["batch_stats"] = bs_
            emb = model.apply(
                variables, patches, designed, False
            ).astype(jnp.float32)
            labels, rounds, margin = _collective_merge_rounds(
                emb, pr, edges, evalid, thr, R, max_rounds, sweeps, axis
            )
            return labels, rounds, margin

        rep = P()
        shard = P(axis)
        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    jax.tree.map(lambda _: rep, params),
                    jax.tree.map(lambda _: rep, batch_stats),
                    shard, shard, shard, shard, shard, shard, shard, shard,
                    rep,
                ),
                out_specs=(rep, rep, rep),
                check_vma=False,
            )
        )
        _merge_cache_put(key, fn)
    labels, rounds, margin = fn(
        params,
        batch_stats,
        jnp.asarray(staged.tiles),
        jnp.asarray(staged.centers),
        jnp.asarray(staged.features, jnp.float32),
        jnp.asarray(scales),
        jnp.asarray(factors, jnp.float32),
        jnp.asarray(staged.point_region),
        jnp.asarray(staged.edges),
        jnp.asarray(staged.edge_valid),
        jnp.float32(threshold),
    )
    _warn_knife_edge(float(margin), threshold)
    labels = np.asarray(labels)
    uniq, dense = np.unique(labels, return_inverse=True)
    return MergeResult(
        region_to_cluster=dense.astype(np.int32),
        num_clusters=len(uniq),
        rounds=int(rounds),
        edges_scored=int(rounds) * int(staged.edge_valid.sum()),
    )


def _warn_knife_edge(margin: float, threshold: float,
                     rel_eps: float = 1e-5) -> None:
    """Warn when a merge decision sat within float rounding of threshold².

    The collective merge's psum order differs from single-device summation,
    so only edges with |d² − thr²| comfortably above f32 rounding are
    guaranteed bit-identical across the two paths. ``margin`` is the
    measured minimum over all rounds (``_collective_merge_rounds``).
    """
    import warnings

    thr2 = float(threshold) ** 2
    if np.isfinite(margin) and margin < rel_eps * max(thr2, 1e-30):
        warnings.warn(
            f"distributed merge: an edge decision sat {margin:.3e} from "
            f"threshold²={thr2:.6g} — within f32 reordering noise, so the "
            "partition may differ from the single-device path at this "
            "knife edge",
            stacklevel=3,
        )
