"""Batched region-embedding extraction + feature store.

TPU-native redesign of ``ExtractFeatures.py:27-116`` (``FeatureIO``): every
sample point of a scene is embedded by the eval single-branch forward in
fixed-size padded batches (one compiled program, no shape churn), streamed
device→host, and appended to a feature store. The store speaks the
reference's resizable-HDF5 format (``save_h5`` at ``ExtractFeatures.py:88-
101``: one growable dataset named ``"dataset"``) when h5py is available, and
falls back to an in-memory array otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.config import DataConfig
from deepmerge_tpu.geodata.types import Scene
from deepmerge_tpu.ops.patches import extract_multiscale_patches
from deepmerge_tpu.train.sampler import DeviceScene, stage_scene

try:
    import h5py

    _HAS_H5PY = True
except Exception:  # pragma: no cover
    _HAS_H5PY = False


class FeatureStore:
    """Append-only embedding store, HDF5-compatible with the reference."""

    def __init__(self, path: Optional[str] = None, dataset_name: str = "dataset"):
        self.path = path
        self.dataset_name = dataset_name
        self._chunks: list[np.ndarray] = []
        # cumulative row offsets of the in-memory chunks ([0, n0, n0+n1, ...])
        # so get_by_id is O(log #chunks), not an O(N) concatenate per lookup
        self._offsets: list[int] = [0]
        self._h5 = None
        if path is not None:
            if not _HAS_H5PY:
                raise RuntimeError("h5py unavailable; use in-memory store")
            self._h5 = h5py.File(path, "w")

    def append(self, data: np.ndarray) -> None:
        if self._h5 is not None:
            if self.dataset_name not in self._h5:
                maxshape = (None,) + data.shape[1:]
                self._h5.create_dataset(
                    self.dataset_name, data=data, maxshape=maxshape, chunks=True
                )
            else:
                ds = self._h5[self.dataset_name]
                old = ds.shape[0]
                ds.resize((old + data.shape[0],) + data.shape[1:])
                ds[old:] = data
        else:
            data = np.asarray(data)
            self._chunks.append(data)
            self._offsets.append(self._offsets[-1] + data.shape[0])

    def read_all(self) -> np.ndarray:
        if self._h5 is not None:
            return np.asarray(self._h5[self.dataset_name])
        return np.concatenate(self._chunks, axis=0)

    def get_by_id(self, idx: int) -> np.ndarray:
        """Random access by point FID (``GetFeaturesByID``, ref :109-112)."""
        if self._h5 is not None:
            return np.asarray(self._h5[self.dataset_name][idx])
        import bisect

        n = self._offsets[-1]
        i = idx + n if idx < 0 else idx
        if not 0 <= i < n:
            raise IndexError(f"index {idx} out of range for store of {n}")
        c = bisect.bisect_right(self._offsets, i) - 1
        return self._chunks[c][i - self._offsets[c]]

    def close(self) -> None:
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None

    @staticmethod
    def open(path: str, dataset_name: str = "dataset") -> np.ndarray:
        if not _HAS_H5PY:
            raise RuntimeError("h5py unavailable")
        with h5py.File(path, "r") as f:
            return np.asarray(f[dataset_name])


def _plan_strips(scene: Scene, caps, xs: np.ndarray, order: np.ndarray,
                 n_strips: int):
    """Contiguous x-sorted point groups + per-strip crop bounds.

    Each strip's crop covers its points' x-range ± ``scene_pad`` (the
    window gather's exact maximum reach, see ``stage_scene_shards``'s halo
    argument in ``parallel/distributed.py``), so strip-local windows read
    the same bytes as whole-scene staging. All strips share the max width
    so one compiled program serves every strip.
    """
    from deepmerge_tpu.ops.patches import scene_pad

    halo = scene_pad(caps, scene.image.shape[-1])
    w = scene.image.shape[1]
    groups = [g for g in np.array_split(order, n_strips) if len(g)]
    bounds = []
    for g in groups:
        gx = xs[g]
        xlo = max(int(gx.min()) - halo, 0)
        xhi = min(int(gx.max()) + halo + 1, w)
        bounds.append((xlo, xhi))
    wmax = max(xhi - xlo for xlo, xhi in bounds)
    return groups, bounds, wmax


def _strips_for_budget(scene: Scene, caps, xs: np.ndarray, order: np.ndarray,
                       budget_bytes: int, max_strips: int = 256) -> int:
    """Smallest strip count whose staged tile fits ``budget_bytes``."""
    from deepmerge_tpu.ops.patches import scene_pad, staged_channels

    h = scene.image.shape[0]
    p = scene_pad(caps, scene.image.shape[-1])
    cs = staged_channels(scene.image.shape[-1])
    for ns in range(1, max_strips + 1):
        _, _, wmax = _plan_strips(scene, caps, xs, order, ns)
        if (h + 2 * p) * (wmax + 2 * p) * cs <= budget_bytes:
            return ns
    raise ValueError(
        f"no column-strip split of scene '{scene.name}' fits "
        f"{budget_bytes} bytes (halo alone is {p} px per side; "
        f"{max_strips} strips still stage "
        f"{(h + 2 * p) * (wmax + 2 * p) * cs} bytes)"
    )


def region_bucket(num_regions: int, granularity: int = 256) -> int:
    """Bucketed region-axis size for the fused serving program.

    The region count rides as a STATIC shape through segment_mean / the
    merge rounds; rounding it up to a bucket lets scenes with drifting
    region counts (every real mosaic tile differs by a few) share ONE
    compiled program instead of recompiling per scene. Phantom regions
    have no points (sentinel-id pad rows are dropped by ``segment_mean``)
    and appear in no RAG edge, so they stay singleton clusters that never
    affect the real partition.
    """
    return -(-max(num_regions, 1) // granularity) * granularity


def unpack_serve_tail(tail, n_edges_padded: int, num_edges: int,
                      num_regions: int):
    """Decode the packed f32 serving tail ``[simi | labels | rounds]``
    produced by ``segment_scene_device(..., serve_packed=True)``.

    Returns ``(simi (num_edges,) f32, labels (num_regions,) int32,
    rounds int)`` — the real (unpadded) slices. Labels are exact through
    the f32 round-trip up to 2^24 regions.
    """
    tail = np.asarray(tail, np.float32)
    simi = tail[:n_edges_padded][:num_edges]
    labels = tail[
        n_edges_padded:n_edges_padded + num_regions
    ].astype(np.int32)
    return simi, labels, int(tail[-1])


def _tree_has_key(tree, key: str) -> bool:
    """True if a nested dict/FrozenDict tree contains ``key`` anywhere."""
    try:
        items = tree.items()
    except AttributeError:
        return False
    return any(k == key or _tree_has_key(v, key) for k, v in items)


class FeatureExtractor:
    """Embeds every sample point of a scene (``extract_features``, ref :45-86).

    The whole per-batch pipeline — window gather, crop+INTER_AREA resize,
    designed-vector assembly, model forward — is ONE jitted program, so XLA
    overlaps the HBM gathers with the MXU matmuls and the intermediate patch
    tensors never round-trip through HBM between programs.
    """

    def __init__(
        self,
        model,
        params,
        batch_stats=None,
        batch_size: int = 2000,
        cast_params: bool = True,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh — point batches are sharded
        over its 'data' axis and params replicated, so extraction scales
        across chips (batch_size must divide by the data-axis size)."""
        self.model = model
        dtype = jnp.dtype(model.cfg.dtype)
        if cast_params and dtype != jnp.float32:
            # one-time weight cast: halves weight reads per forward
            params = jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        self.params = params
        self.batch_stats = batch_stats or {}
        self.batch_size = batch_size
        self.mesh = mesh
        mcfg = model.cfg
        # static-quant serving needs calibrated activation scales in
        # batch_stats — absent, the FIRST batch of the first scene runs a
        # one-time calibration forward (amax taps, mutable batch_stats)
        self._needs_quant_calibration = (
            str(mcfg.quantize).startswith("w8a8-static")
            and not _tree_has_key(self.batch_stats, "act_amax")
        )

        def preprocess(padded, centers, scales, factors, feats, caps,
                       quantize):
            patches = extract_multiscale_patches(
                padded, centers, scales,
                patch_sizes=tuple(mcfg.input_image_scales),
                caps=caps, quantize_uint8=quantize,
                out_channels=mcfg.in_channels,
                out_dtype=jnp.dtype(mcfg.dtype),
            )
            return patches, jnp.concatenate([feats, factors], axis=1)

        # params are explicit jit arguments (NOT closure constants — that
        # would bake ~100MB of weights into the HLO)
        def fused(params, batch_stats, padded, centers, scales, factors, feats,
                  caps, quantize):
            patches, designed = preprocess(
                padded, centers, scales, factors, feats, caps, quantize
            )
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return self.model.apply(variables, patches, designed, False)

        # one-time w8a8-static calibration: same preprocessing, mutable
        # batch_stats — each CrossScaleBlock records its activation amaxes
        def calib(params, batch_stats, padded, centers, scales, factors,
                  feats, caps, quantize):
            patches, designed = preprocess(
                padded, centers, scales, factors, feats, caps, quantize
            )
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            _, upd = self.model.apply(
                variables, patches, designed, False,
                mutable=["batch_stats"],
            )
            return upd["batch_stats"]

        self._calib = jax.jit(calib, static_argnames=("caps", "quantize"))

        if mesh is None:
            self._fused = jax.jit(fused, static_argnames=("caps", "quantize"))

            # whole-scene single dispatch: lax.map the fused batch over all
            # point chunks inside ONE program (a dispatch costs ~28ms on
            # relayed platforms; 4+ batches/scene made that ~8% of extract)
            def fused_all(params, batch_stats, padded, centers, scales,
                          factors, feats, caps, quantize):
                def chunk(args):
                    c, s, f, ft = args
                    return fused(params, batch_stats, padded, c, s, f, ft,
                                 caps, quantize)

                return jax.lax.map(chunk, (centers, scales, factors, feats))

            self._fused_all = jax.jit(
                fused_all, static_argnames=("caps", "quantize")
            )

            # the ENTIRE inference pipeline as one program: extraction
            # chunks + region pooling + edge scoring + threshold + merge
            # rounds (ops/labelprop.device_score_and_merge inlines here).
            # ``threshold`` (absolute, traced) overrides the quantile;
            # ``with_emb`` additionally returns the (P_padded, D)
            # MODEL-dtype embeddings (for callers that persist them, e.g.
            # the serving driver's h5 — bf16 halves the D2H bytes through
            # a slow relay and the model computed in bf16 anyway, so the
            # host f32 upcast is lossless).
            #
            # NO data-dependent statics: the point axis stays PADDED (pr
            # carries the sentinel id num_regions for pad rows — dropped
            # by segment_mean, and harmless in the merge rounds because
            # phantom regions appear in no edge) and ``num_regions`` is
            # the BUCKETED region count (``region_bucket``), so a folder
            # of same-sized scenes with drifting point/region counts
            # reuses ONE compiled program instead of recompiling per
            # scene (~3-8 min each through the remote-compile relay).
            def fused_segment(params, batch_stats, padded, centers, scales,
                              factors, feats, pr, edges, valid,
                              threshold, tq, caps, quantize, num_regions,
                              max_rounds, with_emb=False):
                from deepmerge_tpu.ops.labelprop import device_score_and_merge

                emb = fused_all(params, batch_stats, padded, centers, scales,
                                factors, feats, caps, quantize)
                emb = emb.reshape(-1, emb.shape[-1])
                simi, labels, rounds = device_score_and_merge(
                    emb.astype(jnp.float32), pr, edges, valid,
                    num_regions=num_regions, max_rounds=max_rounds,
                    threshold=threshold, threshold_quantile=tq,
                )
                if with_emb:
                    return simi, labels, rounds, emb
                return simi, labels, rounds

            self._fused_segment = jax.jit(
                fused_segment,
                static_argnames=("caps", "quantize",
                                 "num_regions", "max_rounds", "with_emb"),
            )

            # same program + the dense (H, W) merged label map: one
            # dispatch AND one host sync for the entire scene (the
            # two-dispatch tail pays a full relay round-trip between the
            # merge and the labelmap — ~30ms/scene on relayed platforms).
            # ``num_real`` (traced) keeps num_clusters exact under the
            # bucketed region axis.
            def fused_segment_map(params, batch_stats, padded, centers,
                                  scales, factors, feats, pr,
                                  edges, valid, threshold, tq, region_map,
                                  num_real, caps, quantize, num_regions,
                                  max_rounds, with_emb=False):
                from deepmerge_tpu.ops.labelprop import merged_label_map

                out = fused_segment(
                    params, batch_stats, padded, centers, scales, factors,
                    feats, pr, edges, valid, threshold, tq, caps,
                    quantize, num_regions, max_rounds, with_emb,
                )
                simi, labels, rounds = out[:3]
                label_map, n_clusters = merged_label_map(
                    labels, region_map, num_real
                )
                return (simi, labels, rounds, label_map, n_clusters) + out[3:]

            self._fused_segment_map = jax.jit(
                fused_segment_map,
                static_argnames=("caps", "quantize",
                                 "num_regions", "max_rounds", "with_emb"),
            )

            # serving wrapper: the same program, outputs packed for the
            # MINIMUM number of host pulls through the relay (each pull
            # pays ~28ms of round-trip latency): (P_padded, D) model-dtype
            # embeddings + ONE f32 tail [simi | labels | rounds] (labels
            # are exact in f32 up to 2^24 regions)
            def fused_segment_serve(params, batch_stats, padded, centers,
                                    scales, factors, feats, pr, edges,
                                    valid, threshold, tq, caps, quantize,
                                    num_regions, max_rounds):
                simi, labels, rounds, emb = fused_segment(
                    params, batch_stats, padded, centers, scales, factors,
                    feats, pr, edges, valid, threshold, tq, caps,
                    quantize, num_regions, max_rounds, True,
                )
                tail = jnp.concatenate([
                    simi.astype(jnp.float32),
                    labels.astype(jnp.float32),
                    rounds.astype(jnp.float32)[None],
                ])
                return emb, tail

            self._fused_segment_serve = jax.jit(
                fused_segment_serve,
                static_argnames=("caps", "quantize",
                                 "num_regions", "max_rounds"),
            )
        else:
            # multi-chip extraction: replicate params + scene, split the
            # point batch over the 'data' axis with shard_map (Pallas kernels
            # need explicit per-device sharding, not GSPMD partitioning)
            from jax.sharding import PartitionSpec as P

            from deepmerge_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, mesh)
            if self.batch_stats:
                self.batch_stats = replicate(self.batch_stats, mesh)

            def make(caps, quantize):
                local = lambda params, bs_, padded, c, s, f, ft: fused(
                    params, bs_, padded, c, s, f, ft, caps, quantize
                )
                rep = P()
                return jax.jit(
                    jax.shard_map(
                        local,
                        mesh=mesh,
                        in_specs=(
                            jax.tree.map(lambda _: rep, self.params),
                            jax.tree.map(lambda _: rep, self.batch_stats),
                            rep, P("data"), P("data"), P("data"), P("data"),
                        ),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                )

            cache = {}

            def fused_sharded(params, bs_, padded, c, s, f, ft, caps, quantize):
                key = (caps, quantize)
                if key not in cache:
                    cache[key] = make(caps, quantize)
                return cache[key](params, bs_, padded, c, s, f, ft)

            self._fused = fused_sharded

    def _maybe_calibrate(self, padded, centers, scales, factors, feats,
                         *, caps, quantize):
        """One-time ``w8a8-static`` calibration on an about-to-be-served
        batch: a single forward with activation-amax taps populates the
        per-block static scales in ``batch_stats``; every later dispatch
        (this scene and the rest of the walk) serves with them. No-op
        unless static quantization is configured and scales are absent."""
        if not self._needs_quant_calibration:
            return
        import logging

        logging.getLogger(__name__).info(
            "calibrating w8a8-static activation scales on the first batch"
        )
        new_bs = self._calib(
            self.params, self.batch_stats, padded, centers, scales,
            factors, feats, caps=caps, quantize=quantize,
        )
        if self.mesh is not None:
            from deepmerge_tpu.parallel.mesh import replicate

            new_bs = replicate(new_bs, self.mesh)
        self.batch_stats = new_bs
        self._needs_quant_calibration = False

    def _extract_batches(self, scene, cfg, device_scene):
        from deepmerge_tpu.ops.patches import adaptive_scales

        ds = device_scene or stage_scene(scene, cfg)
        n = ds.points_yx.shape[0]
        bs = self.batch_size
        targets = tuple(cfg.patch_sizes) + (1,) * (
            cfg.factor_slots - len(cfg.patch_sizes)
        )
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n))
            pad = bs - len(idx)
            if pad:  # pad to the compiled batch shape, drop after
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            scales, factors = adaptive_scales(
                ds.point_inner[idx], ds.point_object[idx], targets
            )
            args = (
                jnp.asarray(ds.points_yx[idx]), scales, factors,
                jnp.asarray(ds.point_features[idx], jnp.float32),
            )
            self._maybe_calibrate(ds.padded, *args, caps=ds.caps,
                                  quantize=cfg.quantize_uint8)
            emb = self._fused(
                self.params, self.batch_stats, ds.padded, *args,
                caps=ds.caps, quantize=cfg.quantize_uint8,
            )
            yield emb[: bs - pad] if pad else emb

    def extract_scene(
        self,
        scene: Scene,
        cfg: DataConfig,
        store: Optional[FeatureStore] = None,
        device_scene: Optional[DeviceScene] = None,
    ) -> np.ndarray:
        """Embed all sample points; returns (P, out_dim) float32 (host)."""
        out = []
        for emb in self._extract_batches(scene, cfg, device_scene):
            emb = np.asarray(emb, np.float32)
            if store is not None:
                store.append(emb)
            out.append(emb)
        return np.concatenate(out, axis=0)

    def extract_scene_device(
        self,
        scene: Scene,
        cfg: DataConfig,
        device_scene: Optional[DeviceScene] = None,
    ) -> jnp.ndarray:
        """Embed all sample points, KEEPING the result on device.

        Feeds region pooling / edge scoring / merge without any
        device↔host round-trip of the embedding matrix. Single-device runs
        embed the WHOLE scene in one dispatch (chunked lax.map inside jit).
        """
        if self.mesh is None:
            ds = device_scene or stage_scene(scene, cfg)
            chunked = self._chunked_inputs(ds, cfg)
            n, _, args = chunked
            self._maybe_calibrate(ds.padded, *(a[0] for a in args),
                                  caps=ds.caps, quantize=cfg.quantize_uint8)
            emb = self._fused_all(
                self.params, self.batch_stats, ds.padded, *args,
                caps=ds.caps, quantize=cfg.quantize_uint8,
            )
            return emb.reshape(-1, emb.shape[-1])[:n].astype(jnp.float32)
        chunks = list(self._extract_batches(scene, cfg, device_scene))
        return (
            chunks[0].astype(jnp.float32)
            if len(chunks) == 1
            else jnp.concatenate(chunks, axis=0).astype(jnp.float32)
        )

    def _chunked_inputs(self, ds: DeviceScene, cfg: DataConfig):
        """Per-point metadata chunked + device-resident, cached per staged
        scene (the relay uploads ~1MB per call otherwise — repeated merges
        of one staged scene shouldn't re-pay it).

        The cache lives ON the DeviceScene (not keyed by ``id(ds)`` in the
        extractor): an id() key outlives the object, and CPython readily
        reuses the address for the next staged scene, silently serving it
        the previous scene's centers/scales/features.
        """
        key = (self.batch_size, cfg.patch_sizes, cfg.factor_slots)
        cache = getattr(ds, "_chunked_inputs_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(ds, "_chunked_inputs_cache", cache)
        if key in cache:
            return cache[key]
        out = self._chunked_inputs_uncached(ds, cfg)
        cache[key] = out
        return out

    def _chunked_inputs_uncached(self, ds: DeviceScene, cfg: DataConfig):
        from deepmerge_tpu.ops.patches import adaptive_scales

        n = ds.points_yx.shape[0]
        if n == 0:
            raise ValueError(
                "scene has no sample points — nothing to extract"
            )
        # balanced chunks: ceil-divide the points over the minimum number
        # of chunks instead of padding the tail up to batch_size (8193
        # points at batch 2048 would otherwise compute 12288 rows; the
        # mild 8-row alignment keeps shapes friendly)
        nb_min = max(-(-n // self.batch_size), 1)
        per_chunk = -(-n // nb_min)
        bs = min(-(-per_chunk // 8) * 8, max(n, 1))
        pad = (-n) % bs
        idx = np.arange(n + pad)
        if pad:
            idx[n:] = 0
        targets = tuple(cfg.patch_sizes) + (1,) * (
            cfg.factor_slots - len(cfg.patch_sizes)
        )
        scales, factors = adaptive_scales(
            ds.point_inner[idx], ds.point_object[idx], targets
        )
        nb = len(idx) // bs
        args = (
            jnp.asarray(ds.points_yx[idx]).reshape(nb, bs, 2),
            jnp.asarray(scales).reshape(nb, bs, -1),
            jnp.asarray(factors).reshape(nb, bs, -1),
            jnp.asarray(ds.point_features[idx], jnp.float32).reshape(
                nb, bs, -1
            ),
        )
        return n, nb, args

    def extract_scene_streamed(
        self,
        scene: Scene,
        cfg: DataConfig,
        n_strips: int | None = None,
        hbm_budget_bytes: int | None = None,
        store: Optional[FeatureStore] = None,
    ) -> np.ndarray:
        """Embed all points WITHOUT staging the whole mosaic in HBM.

        The streamed analog of the reference's sequential tile walk
        (``ExtractFeatures.py:241-303``) for ONE scene too big for device
        memory: the host keeps the mosaic, the device sees one column
        strip at a time (the points' x-range plus a ``scene_pad`` halo —
        the exact reach of the window gather, so every patch byte is
        identical to whole-scene staging). All strips pad to a shared
        width, so the pipeline compiles ONCE and every strip replays it.

        Embeddings come back in global point-FID order; downstream scoring
        and merge (host union-find or device label-prop) are unchanged —
        strip boundaries never affect the partition because the merge sees
        the full RAG with all embeddings.

        Pass ``n_strips`` directly, or ``hbm_budget_bytes`` to pick the
        smallest strip count whose staged tile fits the budget.
        """
        if self.mesh is not None:
            raise ValueError(
                "extract_scene_streamed is single-device only — a mesh "
                "already spreads the scene across chips "
                "(parallel.distributed.extract_and_merge_sharded)"
            )
        from deepmerge_tpu.ops.patches import (
            adaptive_scales,
            pad_scene_device,
            scene_pad,
            staged_channels,
            staging_caps,
        )

        n = scene.regions.num_points
        if n == 0:
            raise ValueError("scene has no sample points — nothing to extract")
        feats_all, inner_all, obj_all = scene.regions.point_meta()
        # GLOBAL caps (all points), like whole-scene staging: identical
        # window clamps, resize weights and compiled shapes
        caps = staging_caps(inner_all, obj_all, cfg.patch_sizes,
                            cfg.max_window, scene_name=scene.name)
        xs = scene.regions.points_yx[:, 1].astype(np.int64)
        order = np.argsort(xs, kind="stable")
        if n_strips is None:
            if hbm_budget_bytes is None:
                raise ValueError("pass n_strips or hbm_budget_bytes")
            n_strips = _strips_for_budget(
                scene, caps, xs, order, hbm_budget_bytes
            )
        groups, bounds, wmax = _plan_strips(
            scene, caps, xs, order, n_strips
        )

        h, w = scene.image.shape[:2]
        c = scene.image.shape[-1]
        targets = tuple(cfg.patch_sizes) + (1,) * (
            cfg.factor_slots - len(cfg.patch_sizes)
        )
        bs = self.batch_size
        out = None
        for g, (xlo, xhi) in zip(groups, bounds):
            tile = np.zeros((h, wmax, c), scene.image.dtype)
            tile[:, : xhi - xlo] = scene.image[:, xlo:xhi]
            # raw strip over the wire, pad in HBM (H2D is the scarce
            # resource; the padded layout is ~2x the raw bytes)
            padded = pad_scene_device(
                jnp.asarray(tile), pad=scene_pad(caps, c),
                staged_c=staged_channels(c),
            )
            centers = scene.regions.points_yx[g].astype(np.int32).copy()
            centers[:, 1] -= xlo
            for start in range(0, len(g), bs):
                idx = np.arange(start, min(start + bs, len(g)))
                pad = bs - len(idx)
                if pad:
                    idx = np.concatenate([idx, np.zeros(pad, np.int64)])
                gi = g[idx]
                scales, factors = adaptive_scales(
                    inner_all[gi], obj_all[gi], targets
                )
                fargs = (
                    jnp.asarray(centers[idx]), scales, factors,
                    jnp.asarray(feats_all[gi], jnp.float32),
                )
                self._maybe_calibrate(padded, *fargs, caps=caps,
                                      quantize=cfg.quantize_uint8)
                emb = np.asarray(
                    self._fused(
                        self.params, self.batch_stats, padded, *fargs,
                        caps=caps, quantize=cfg.quantize_uint8,
                    ),
                    np.float32,
                )
                if out is None:
                    out = np.empty((n, emb.shape[-1]), np.float32)
                real = bs - pad
                out[g[idx[:real]]] = emb[:real]
            del padded  # free the strip tile before staging the next
        if store is not None:
            store.append(out)  # append once, in global FID order
        return out

    def segment_scene_device(
        self,
        scene: Scene,
        cfg: DataConfig,
        edges,
        edge_valid,
        num_regions: int,
        max_rounds: int = 16,
        device_scene: Optional[DeviceScene] = None,
        region_map=None,
        threshold=None,
        threshold_quantile: float = 0.5,
        with_embeddings: bool = False,
        serve_packed: bool = False,
    ):
        """Extract + pool + score + merge a scene in ONE dispatch.

        ``edges``/``edge_valid`` are the padded RAG arrays (device or host);
        returns (simi, labels, rounds) like
        ``ops/labelprop.device_score_and_merge`` — embeddings never leave
        the program, let alone the device. Single-device path only.

        The compiled program has NO data-dependent statics: ``labels``
        come back over a BUCKETED region axis (``region_bucket
        (num_regions)`` — slice ``[:num_regions]`` on the host; phantom
        regions are singleton clusters that never touch the real
        partition) and ``with_embeddings`` returns the PADDED point axis
        in the MODEL dtype (slice ``[:scene.regions.num_points]`` and
        upcast on the host — lossless, the model computed in that dtype).
        A folder of same-sized scenes with drifting point/region counts
        therefore replays one compiled program instead of recompiling per
        scene.

        With ``region_map`` (the (H, W) int32 superpixel-id map, ideally a
        device array uploaded once per scene), the program additionally
        dense-relabels and expands the merged (H, W) label map
        (``ops/labelprop.merged_label_map``) and returns
        ``(simi, labels, rounds, label_map, n_clusters)`` — still ONE
        dispatch and one host sync for the whole scene; ``n_clusters``
        counts only real clusters (traced ``num_real``).

        ``threshold``: absolute merge threshold (traced scalar — sweeps
        reuse the program); None thresholds at ``threshold_quantile`` of
        the valid edge distances in-program (also traced; the 0.5 default
        is a NON-reference semantic, see ``device_score_and_merge``).
        ``serve_packed`` (serving drivers): return ``(emb, tail)`` where
        ``tail`` is one f32 vector ``[simi | labels | rounds]`` — TWO
        host pulls per scene instead of four (each pull pays a relay
        round-trip). Decode with ``unpack_serve_tail``.
        """
        if self.mesh is not None:
            raise ValueError("segment_scene_device is single-device only")
        ds = device_scene or stage_scene(scene, cfg)
        n, _, args = self._chunked_inputs(ds, cfg)
        self._maybe_calibrate(ds.padded, *(a[0] for a in args),
                              caps=ds.caps, quantize=cfg.quantize_uint8)
        r_pad = region_bucket(num_regions)
        total = args[0].shape[0] * args[0].shape[1]
        pr = self._padded_point_region(ds, r_pad, total)
        common = dict(
            pr=pr,
            edges=jnp.asarray(edges), valid=jnp.asarray(edge_valid),
            threshold=threshold, tq=jnp.float32(threshold_quantile),
            caps=ds.caps, quantize=cfg.quantize_uint8,
            num_regions=r_pad, max_rounds=max_rounds,
        )
        if serve_packed:
            assert region_map is None, "serve_packed has no labelmap output"
            return self._fused_segment_serve(
                self.params, self.batch_stats, ds.padded, *args, **common
            )
        if region_map is None:
            return self._fused_segment(
                self.params, self.batch_stats, ds.padded, *args,
                with_emb=with_embeddings, **common
            )
        return self._fused_segment_map(
            self.params, self.batch_stats, ds.padded, *args,
            region_map=jnp.asarray(region_map, jnp.int32),
            num_real=jnp.int32(num_regions), with_emb=with_embeddings,
            **common
        )

    def _padded_point_region(self, ds: DeviceScene, r_pad: int, total: int):
        """Device-resident point→region ids padded to the chunked point
        count ``total`` with the sentinel ``r_pad`` (segment_mean's
        padding id; out-of-range for every gather, whose clamp is harmless
        — see ``fused_segment``). Cached per staged scene like
        ``_chunked_inputs``."""
        cache = getattr(ds, "_padded_pr_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(ds, "_padded_pr_cache", cache)
        key = (r_pad, total)
        if key not in cache:
            n = ds.point_region.shape[0]
            prp = np.full(total, r_pad, np.int32)
            prp[:n] = ds.point_region
            cache[key] = jnp.asarray(prp)
        return cache[key]
