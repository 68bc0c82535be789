"""Inference drivers: per-scene extraction + scoring + merge, and the
multi-scene batch walk (reference ``Extract_featrues_from_multi_files``,
``ExtractFeatures.py:241-303`` and ``test_for_shp``, ``:150-225``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from deepmerge_tpu.config import Config
from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.infer.extract import (
    FeatureExtractor,
    FeatureStore,
    unpack_serve_tail,
)
from deepmerge_tpu.infer.merge import MergeResult, merge_scene
from deepmerge_tpu.infer.scoring import score_scene_edges
from deepmerge_tpu.models.s2former import build_model, init_params
from deepmerge_tpu.utils.profiling import Timings, phase_timer


def load_params(cfg: Config, checkpoint_path: Optional[str] = None):
    """Params from a checkpoint, or fresh init when none exists yet.

    ``checkpoint_path`` may be an orbax checkpoint directory, an imported
    ``.msgpack`` (``tools/import_torch_ckpt.py``), or a reference ``.pth``
    (imported on the fly — requires torch)."""
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.key(0))
    params, batch_stats = variables["params"], variables.get("batch_stats")
    if not checkpoint_path:
        import warnings

        warnings.warn(
            "load_params: no checkpoint_path given — using FRESH random "
            "parameters (embeddings will be untrained)",
            stacklevel=2,
        )
    if checkpoint_path and checkpoint_path.endswith(".msgpack"):
        from deepmerge_tpu.compat.torch_import import load_flax_variables

        loaded = load_flax_variables(checkpoint_path)
        params = loaded["params"]
        batch_stats = loaded.get("batch_stats", batch_stats)
    elif checkpoint_path and checkpoint_path.endswith(".pth"):
        from deepmerge_tpu.compat.torch_import import load_torch_checkpoint

        loaded = load_torch_checkpoint(checkpoint_path, cfg)
        params = loaded["params"]
        batch_stats = loaded.get("batch_stats", batch_stats)
    elif checkpoint_path:
        from deepmerge_tpu.train.checkpoint import CheckpointManager
        from deepmerge_tpu.train.loop import create_train_state

        state = create_train_state(model, cfg, jax.random.key(0))
        mgr = CheckpointManager(checkpoint_path, cfg)
        state, _, _ = mgr.restore(state)
        params, batch_stats = state.params, state.batch_stats
    return model, params, batch_stats


def _staged_edge_arrays(scene: Scene, edge_batch: int, ds=None):
    """Padded RAG edge arrays as device handles, cached on the staged
    scene so the folder walk's prefetch thread can upload them while the
    previous scene computes (same rationale as the chunked-metadata
    cache in ``FeatureExtractor``). Padding to an ``edge_batch`` multiple
    keeps same-bucket scenes on one compiled program."""
    import jax.numpy as jnp

    cache = getattr(ds, "_edge_arrays_cache", None) if ds is not None \
        else None
    if cache is not None and edge_batch in cache:
        return cache[edge_batch]
    edges = np.asarray(scene.rag.edges, np.int32)
    pad = (-len(edges)) % edge_batch if len(edges) else edge_batch
    valid = np.ones(len(edges), bool)
    if pad:
        edges = np.concatenate([edges, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    out = (jnp.asarray(edges), jnp.asarray(valid))
    if ds is not None:
        if cache is None:
            cache = {}
            object.__setattr__(ds, "_edge_arrays_cache", cache)
        cache[edge_batch] = out
    return out


def prestage_scene(extractor: FeatureExtractor, scene: Scene, ds,
                   data_cfg, edge_batch: int) -> None:
    """Warm every per-scene device-input cache from the PREFETCH thread:
    chunked point metadata (~1MB H2D through a slow relay), the padded
    point→region ids and the padded edge arrays. The walk's main thread
    then dispatches the fused program without paying any H2D upload on
    the critical path."""
    from deepmerge_tpu.infer.extract import region_bucket

    _, _, args = extractor._chunked_inputs(ds, data_cfg)
    total = args[0].shape[0] * args[0].shape[1]
    extractor._padded_point_region(
        ds, region_bucket(scene.regions.num_regions), total
    )
    _staged_edge_arrays(scene, edge_batch, ds=ds)


def process_scene(
    cfg: Config,
    scene: Scene,
    model=None,
    params=None,
    batch_stats=None,
    h5_path: Optional[str] = None,
    lines_path: Optional[str] = None,
    do_merge: bool = True,
    timings: Optional[Timings] = None,
    log_fn=print,
    extractor: Optional[FeatureExtractor] = None,
    mesh=None,
    stream_tiles: Optional[int] = None,
    device_scene=None,
    fused: Optional[bool] = None,
    finalize_executor=None,
) -> tuple[np.ndarray, np.ndarray, Optional[MergeResult]]:
    """Extract → score → (merge) one scene.

    Returns (point_embeddings, edge_simi, merge_result). Optionally streams
    embeddings into an HDF5 store (the reference's per-scene .h5,
    ``ExtractFeatures.py:286``) and writes ``simi`` back into lines.shp.
    ``extractor`` lets multi-scene callers reuse ONE FeatureExtractor (its
    jit cache lives on the instance — a fresh one per scene recompiles the
    whole fused pipeline even for identically-shaped tiles).
    ``mesh`` runs extraction shard_map-sharded over the mesh's data axis
    and the merge with the exact psum/pmin collective rounds
    (``parallel.distributed.distributed_merge``) — same partition as
    single-device, memory and FLOPs spread across the mesh.
    ``stream_tiles`` extracts through N sequential column-strip tiles so
    the device never holds the whole mosaic
    (``FeatureExtractor.extract_scene_streamed``); identical embeddings
    and partition, bounded HBM. Mutually exclusive with ``mesh``.
    ``device_scene`` supplies an already-staged ``DeviceScene`` (see
    ``train.sampler.stage_scene``) — the folder walk stages scene k+1 on
    the prefetch thread while scene k computes, hiding the multi-MB H2D
    tile upload behind device time. Ignored by the mesh and streamed
    paths (each stages its own shards/strips).
    ``fused`` forces the single-dispatch serving path on/off (None = auto:
    on for single-device device-engine merges).
    ``finalize_executor``: an Executor with ONE worker. When given, the
    host tail of the scene — the multi-MB embedding pull through the slow
    relay, the .h5 write, the ``simi`` write-back — runs on that executor
    and the call returns a ``concurrent.futures.Future`` resolving to the
    usual ``(emb, simi, result)`` tuple instead of the tuple itself. The
    folder walk uses this so scene k's host finalize overlaps scene k+1's
    device compute (dispatch is async; only the pulls block).
    """
    if model is None:
        model, params, batch_stats = load_params(cfg)
    timings = timings or Timings()

    if extractor is None:
        extractor = FeatureExtractor(
            model, params, batch_stats, batch_size=cfg.data.eval_batch_size,
            mesh=mesh,
        )
    store = FeatureStore(h5_path) if h5_path else None
    emb_dev = None  # device-resident embeddings, when the path keeps them

    # serving fast path: the ENTIRE scene — extraction chunks, pooling,
    # edge scoring, threshold, merge rounds — as ONE dispatch with ONE
    # host sync (segment_scene_device with_embeddings; the split phases
    # below pay 4-6 extra relay round-trips, ~0.2-0.3 s/scene measured)
    if fused is None:
        fused = True
    fused = (
        fused
        and mesh is None
        and (stream_tiles is None or stream_tiles <= 1)
        and do_merge
        and cfg.merge.engine == "device"
        and scene.regions.num_points > 0
    )
    if fused:
        from deepmerge_tpu.infer.merge import labels_to_result

        edges_dev, valid_dev = _staged_edge_arrays(
            scene, max(cfg.merge.edge_batch, 1), ds=device_scene
        )
        q = cfg.merge.threshold_quantile
        # dispatch only — async under jit; the pulls below block.
        # serve_packed: ONE (P_padded, D) model-dtype embedding pull + ONE
        # f32 tail [simi | labels | rounds] — two relay round-trips per
        # scene instead of four, half the embedding bytes (bf16 upcast on
        # the host is lossless, the model computed in bf16)
        emb_dev, tail_dev = extractor.segment_scene_device(
            scene, cfg.data, edges_dev, valid_dev,
            num_regions=scene.regions.num_regions,
            max_rounds=cfg.merge.max_rounds,
            device_scene=device_scene,
            threshold=None if q is not None else cfg.merge.threshold,
            threshold_quantile=q if q is not None else 0.5,
            serve_packed=True,
        )
        n_edges_padded = int(edges_dev.shape[0])
        n_points = scene.regions.num_points
        n_regions = scene.regions.num_regions

        def finalize():
            with phase_timer(timings, "pull"):
                tail = np.asarray(tail_dev, np.float32)
                emb = np.asarray(emb_dev).astype(np.float32)[:n_points]
            simi, labels, rounds = unpack_serve_tail(
                tail, n_edges_padded, scene.rag.num_edges, n_regions
            )
            scene.rag.simi = simi
            if store is not None:
                with phase_timer(timings, "h5"):
                    store.append(emb)
                    store.close()
            if lines_path and os.path.exists(lines_path):
                from deepmerge_tpu.geodata.ingest import write_simi

                with phase_timer(timings, "simi"):
                    write_simi(lines_path, simi)
            sweeps_run = min(rounds + 1, cfg.merge.max_rounds)
            result = labels_to_result(
                labels, rounds,
                edges_scored=sweeps_run * scene.rag.num_edges,
            )
            log_fn(
                f"{scene.name}: {scene.regions.num_regions} regions -> "
                f"{result.num_clusters} objects in {result.rounds} rounds "
                f"({timings.summary()})"
            )
            return emb, simi, result

        if finalize_executor is not None:
            return finalize_executor.submit(finalize)
        return finalize()

    try:
        with phase_timer(timings, "extract"):
            if stream_tiles is not None and stream_tiles > 1:
                emb = extractor.extract_scene_streamed(
                    scene, cfg.data, n_strips=stream_tiles, store=store
                )
            elif mesh is None:
                # extract on device and pull the matrix ONCE (store +
                # return value); scoring and the device merge consume the
                # device handle directly — otherwise the embeddings cross
                # the host link three times (pull for the store, re-upload
                # for scoring, re-upload for the merge), ~3MB each way per
                # scene on the flagship config
                emb_dev = extractor.extract_scene_device(
                    scene, cfg.data, device_scene=device_scene
                )
                emb = np.asarray(emb_dev, np.float32)
                if store is not None:
                    store.append(emb)
            else:
                emb = extractor.extract_scene(scene, cfg.data, store)
    finally:
        if store is not None:
            store.close()

    with phase_timer(timings, "score"):
        simi = score_scene_edges(
            scene, emb if emb_dev is None else emb_dev, cfg.merge.edge_batch
        )

    if lines_path and os.path.exists(lines_path):
        from deepmerge_tpu.geodata.ingest import write_simi

        write_simi(lines_path, simi)

    result = None
    if do_merge:
        thr = cfg.merge.threshold
        if cfg.merge.threshold_quantile is not None and len(simi):
            # method='lower' matches the on-device quantile in
            # ops/labelprop.device_score_and_merge (floor-index), keeping
            # bench and driver partitions identical for the same config
            thr = float(
                np.quantile(simi, cfg.merge.threshold_quantile, method="lower")
            )
        with phase_timer(timings, "merge"):
            if mesh is not None and cfg.merge.engine == "device":
                from deepmerge_tpu.infer.merge import labels_to_result
                from deepmerge_tpu.parallel.distributed import (
                    distributed_merge,
                )

                labels, rounds = distributed_merge(
                    emb, scene.regions.point_region,
                    scene.regions.num_regions, scene.rag.edges, mesh,
                    threshold=thr, max_rounds=cfg.merge.max_rounds,
                )
                result = labels_to_result(labels, rounds, scene)
            elif cfg.merge.engine == "device":
                from deepmerge_tpu.infer.merge import merge_scene_device

                result = merge_scene_device(
                    scene, emb if emb_dev is None else emb_dev,
                    threshold=thr,
                    max_rounds=cfg.merge.max_rounds,
                )
            else:
                result = merge_scene(
                    scene, emb,
                    threshold=thr,
                    max_rounds=cfg.merge.max_rounds,
                    edge_batch=cfg.merge.edge_batch,
                )
        log_fn(
            f"{scene.name}: {scene.regions.num_regions} regions -> "
            f"{result.num_clusters} objects in {result.rounds} rounds "
            f"({timings.summary()})"
        )
    if finalize_executor is not None:
        # non-fused paths finalize inline; hand back a resolved Future so
        # callers handle both paths uniformly
        from concurrent.futures import Future

        f: Future = Future()
        f.set_result((emb, simi, result))
        return f
    return emb, simi, result


def process_folder(
    cfg: Config,
    image_folder: str,
    shp_folder: str,
    checkpoint_path: Optional[str] = None,
    log_fn=print,
    deep_pixels: str = "error",
    mesh=None,
    write_labelmaps: bool = False,
    stream_tiles: Optional[int] = None,
    watch_seconds: Optional[float] = None,
    watch_iterations: Optional[int] = None,
    extractor: Optional[FeatureExtractor] = None,
    stats: Optional[dict] = None,
) -> list[str]:
    """Walk per-scene shapefile folders like the reference's multi-scene
    driver (``ExtractFeatures.py:241-303``): each subfolder holds
    PointsGCS.shp (+ lines.shp), the raster is ``<folder>.tif``.
    ``mesh`` spreads each scene's extraction and merge over the mesh's
    data axis (see ``process_scene``). ``write_labelmaps`` writes each
    scene's merged (H, W) map as ``<model>_merged.tif`` in the scene
    folder — requires a ``<name>_labels.npy`` superpixel sidecar next to
    the polygon shapefile (the export-synthetic layout); scenes without
    one are skipped with a log line. ``stream_tiles`` bounds per-scene HBM
    by extracting through N sequential column strips (see
    ``process_scene``).

    ``watch_seconds`` turns the single walk into a serving loop: rescan
    the folder every N seconds and process scenes that newly appeared
    (already-done scenes are skipped; failed scenes retry on the next
    scan, so transient errors self-heal while the failure stays visible
    in the log). ``watch_iterations`` bounds the number of scans (None =
    until killed); the compiled extractor is reused across scans, so a
    steady stream of identically-shaped tiles never recompiles.

    ``stats``: pass a dict to receive ``{"scene_done_ts": [wall-clock
    perf_counter at each scene's completion]}`` — benchmarks derive the
    pipeline's steady-state rate (inter-completion deltas) from it,
    separating the walk-boundary fill cost from the sustained rate."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from deepmerge_tpu.geodata.ingest import load_scene
    from deepmerge_tpu.train.sampler import stage_scene

    model, params, batch_stats = load_params(cfg, checkpoint_path)
    # ONE extractor for the whole walk: identically-shaped tiles (the
    # common mosaic case, ExtractFeatures.py:257-299) then hit the jit
    # cache instead of recompiling per scene. Callers that walk
    # repeatedly (serving daemons restarting scans, benchmarks) can pass
    # their own warm ``extractor`` to keep the cache across calls — its
    # params then take precedence over ``checkpoint_path``.
    if extractor is None:
        extractor = FeatureExtractor(
            model, params, batch_stats, batch_size=cfg.data.eval_batch_size,
            mesh=mesh,
        )

    def scan_jobs(skip):
        jobs = []
        for entry in sorted(os.listdir(shp_folder)):
            sub = os.path.join(shp_folder, entry)
            points = os.path.join(sub, "PointsGCS.shp")
            if entry in skip or not os.path.isdir(sub) \
                    or not os.path.exists(points):
                continue
            jobs.append((
                entry,
                os.path.join(image_folder, f"{entry}.tif"),
                os.path.join(shp_folder, f"{entry}.shp"),
                points,
                os.path.join(sub, "lines.shp"),
                os.path.join(sub, f"{cfg.model.name}_features.h5"),
            ))
        return jobs

    done: list[str] = []
    failed: list[tuple[str, str]] = []

    def walk(jobs):
        # One-deep prefetch: scene k+1's host ingestion (TIFF decode +
        # shapefile parse) AND device staging (pad + H2D tile upload —
        # multi-MB through a slow relay) run on a worker thread while
        # scene k occupies the device; dispatches are async, so the
        # upload rides behind scene k's compute. A prefetch failure
        # surfaces at .result() inside scene k+1's own try block,
        # preserving per-scene fault isolation. The mesh and streamed
        # paths stage their own shards/strips, so prefetch staging is
        # skipped there (streamed callers opted into bounded HBM — a
        # prefetched whole-scene tile would defeat the budget).
        prestage = mesh is None and (stream_tiles is None
                                     or stream_tiles <= 1)

        def finish(entry, h5, scene, fut):
            # resolve scene k's finalize future (embedding pull, .h5,
            # simi write-back — running on the finalize thread) AFTER
            # scene k+1's program has been dispatched, so the host tail
            # overlaps device compute. Per-scene fault isolation holds:
            # a failure surfaces here, attributed to its own scene.
            try:
                _, _, result = fut.result()
                if stats is not None:
                    stats.setdefault("scene_done_ts", []).append(
                        time.perf_counter()
                    )
                if write_labelmaps and result is not None:
                    if os.path.exists(
                        os.path.join(shp_folder, f"{entry}_labels.npy")
                    ):
                        from deepmerge_tpu.infer.merge import (
                            write_label_geotiff,
                        )

                        out_tif = os.path.join(
                            shp_folder, entry,
                            f"{cfg.model.name}_merged.tif"
                        )
                        write_label_geotiff(
                            out_tif, result.label_map(scene),
                            scene.meta.get("geotransform"),
                        )
                        log_fn(f"  merged label map -> {out_tif}")
                    else:
                        log_fn(
                            f"  no {entry}_labels.npy superpixel "
                            "sidecar — skipping label-map export"
                        )
                done.append(entry)
            except Exception as e:  # a bad scene must not kill the walk
                failed.append((entry, str(e)))
                log_fn(f"FAILED {entry}: {e}")
                try:  # don't leave a truncated file looking complete
                    if os.path.exists(h5):
                        os.remove(h5)
                except OSError:
                    pass

        with ThreadPoolExecutor(max_workers=1) as pool, \
                ThreadPoolExecutor(max_workers=1) as fin_pool:
            def submit(j):
                entry, image, polygons, pts, lines, _ = j

                def load():
                    labels_npy = os.path.join(shp_folder,
                                              f"{entry}_labels.npy")
                    labels = (np.load(labels_npy)
                              if os.path.exists(labels_npy) else None)
                    t0 = time.perf_counter()
                    scene = load_scene(image, polygons, pts, lines,
                                       name=entry, deep_pixels=deep_pixels,
                                       labels=labels)
                    t1 = time.perf_counter()
                    ds = (stage_scene(scene, cfg.data)
                          if prestage and scene.regions.num_points
                          else None)
                    if ds is not None:
                        # point metadata + edge arrays upload here too —
                        # the main thread's dispatch then pays no H2D
                        prestage_scene(extractor, scene, ds, cfg.data,
                                       max(cfg.merge.edge_batch, 1))
                    log_fn(f"  prefetch[{entry}]: ingest {t1 - t0:.3f}s "
                           f"stage {time.perf_counter() - t1:.3f}s")
                    return scene, ds

                return pool.submit(load)

            # one-deep prefetch: ingest (~0.3 s) fits comfortably inside a
            # scene's device segment, and deeper prefetch was MEASURED to
            # hurt on relayed links — convoying two or three 12.6 MB tile
            # uploads ahead of the first scene's embedding pull stalls the
            # pull behind them in the relay's op stream (BENCH.md r5 walk
            # timeline: scene-1 pull 3.7 s with depth 2 vs 2.4 s with
            # depth 1 at the same link rate). The submit-ahead list keeps
            # the depth a named knob should real PCIe hosts want more.
            depth = 1
            futures = [submit(j) for j in jobs[:depth]]
            pending = None  # (entry, h5, scene, finalize-future)
            for i, (entry, image, polygons, points, lines, h5) in enumerate(jobs):
                this_future = futures[i]
                futures[i] = None  # don't pin every scene for the walk
                if i + depth < len(jobs):
                    futures.append(submit(jobs[i + depth]))
                try:
                    t0 = time.perf_counter()
                    scene, ds = this_future.result()
                    t1 = time.perf_counter()
                    log_fn(f"processing {entry} "
                           f"({scene.regions.num_points} points)")
                    fut = process_scene(
                        cfg, scene, model, params, batch_stats,
                        h5_path=h5, lines_path=lines, log_fn=log_fn,
                        extractor=extractor, mesh=mesh,
                        stream_tiles=stream_tiles, device_scene=ds,
                        finalize_executor=fin_pool,
                    )
                    t2 = time.perf_counter()
                except Exception as e:  # ingest/staging/dispatch failure
                    failed.append((entry, str(e)))
                    log_fn(f"FAILED {entry}: {e}")
                    try:
                        if os.path.exists(h5):
                            os.remove(h5)
                    except OSError:
                        pass
                    continue
                if pending is not None:
                    finish(*pending)
                t3 = time.perf_counter()
                log_fn(f"  walk[{entry}]: wait-prefetch {t1 - t0:.3f}s "
                       f"dispatch {t2 - t1:.3f}s "
                       f"wait-finalize(prev) {t3 - t2:.3f}s")
                pending = (entry, h5, scene, fut)
            if pending is not None:
                finish(*pending)

    iteration = 0
    while True:
        walk(scan_jobs(skip=set(done)))
        iteration += 1
        if watch_iterations is not None and iteration >= watch_iterations:
            break
        if watch_seconds is None:
            break  # default: one pass, like the reference's walk
        time.sleep(watch_seconds)
    if failed:
        log_fn(f"{len(failed)} scene(s) failed: "
               f"{sorted(set(f[0] for f in failed))}")
    return done
