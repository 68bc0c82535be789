"""End-to-end benchmark: megapixels/sec segment-and-merge on one chip.

Pipeline measured (the BASELINE.md north-star workload): synthetic scene →
multi-scale patch extraction → flagship S2Former-v3 embeddings for every
region sample point → region pooling → RAG edge scoring → iterative merge
rounds → merged label map. Baseline: ≥50 MPix/s on v5e-8 ⇒ 6.25 MPix/s per
chip; ``vs_baseline`` is the per-chip ratio against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from deepmerge_tpu.config import Config, DataConfig, ModelConfig
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.infer.scoring import score_scene_edges
    from deepmerge_tpu.models.s2former import build_model, init_params
    from deepmerge_tpu.train.sampler import stage_scene

    H = W = 1024           # 1.05 MPix scene
    N_REGIONS = 2048       # ~2k superpixels per MPix (BASELINE.json configs)
    POINTS_PER_REGION = 1
    BATCH = 2048

    mcfg = ModelConfig(dtype="bfloat16")  # flagship v3-642
    dcfg = DataConfig(max_window=512, eval_batch_size=BATCH)
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0), batch=2)

    scene = generate_scene(
        h=H, w=W, n_regions=N_REGIONS, n_objects=128,
        points_per_region=POINTS_PER_REGION, seed=0,
    )
    ds = stage_scene(scene, dcfg)
    extractor = FeatureExtractor(model, variables["params"], batch_size=BATCH)

    verbose = bool(os.environ.get("BENCH_VERBOSE"))
    phases = {}

    def run_once():
        t = time.perf_counter()
        emb = extractor.extract_scene_device(scene, dcfg, device_scene=ds)
        phases["extract"] = phases.get("extract", 0) + time.perf_counter() - t
        t = time.perf_counter()
        simi = score_scene_edges(scene, emb)
        thr = float(np.median(simi))
        phases["score"] = phases.get("score", 0) + time.perf_counter() - t
        t = time.perf_counter()
        result = merge_scene_device(scene, emb, threshold=thr, max_rounds=8)
        _ = result.label_map(scene)
        phases["merge"] = phases.get("merge", 0) + time.perf_counter() - t
        return result

    run_once()  # warmup / compile
    phases.clear()
    t0 = time.perf_counter()
    runs = 3
    for _ in range(runs):
        result = run_once()
    dt = (time.perf_counter() - t0) / runs
    if verbose:
        detail = ", ".join(f"{k}={v / runs * 1000:.0f}ms" for k, v in phases.items())
        print(f"[bench] per-run phases: {detail}", file=sys.stderr)

    mpix = H * W / 1e6
    mpix_per_s = mpix / dt
    baseline_per_chip = 50.0 / 8.0
    print(json.dumps({
        "metric": "end_to_end_segment_and_merge_throughput",
        "value": round(mpix_per_s, 4),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mpix_per_s / baseline_per_chip, 4),
    }))
    # secondary detail on stderr-safe extra lines? keep stdout to ONE line.
    return result


if __name__ == "__main__":
    main()
