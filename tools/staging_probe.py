"""Measure per-scene staging (pad + H2D upload) vs compute on the real chip.

Answers two questions for the folder-serving path (`infer/driver.py`):
  1. What does staging a scene actually cost through the relay
     (host pad + H2D of the ~27MB RGBA tile + metadata)?
  2. Does an H2D upload OVERLAP device compute (async dispatch), or does
     the relay serialize them?  (Decides whether prefetch-thread staging
     buys a full staging-time win or nothing.)

Timing rule: the relay's `block_until_ready` does not truly sync — each
phase ends by pulling a scalar reduction of its output (CLAUDE.md).
Run SERIALLY on an idle box.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.config import Config, DataConfig, ModelConfig
from deepmerge_tpu.geodata.synthetic import generate_scene
from deepmerge_tpu.infer.driver import load_params
from deepmerge_tpu.infer.extract import FeatureExtractor
from deepmerge_tpu.train.sampler import stage_scene

SIZE = 2048
REGIONS = 8192


def sync(x):
    return float(jnp.abs(jnp.asarray(x, jnp.float32)).sum())


def main():
    cfg = Config(
        model=ModelConfig(dtype="bfloat16"),
        data=DataConfig(max_window=512, eval_batch_size=2048),
    )

    def make(seed):
        return generate_scene(h=SIZE, w=SIZE, n_regions=REGIONS,
                              n_objects=256, points_per_region=1, seed=seed)

    scenes = [make(0), make(1)]
    model, params, bs = load_params(cfg)
    ex = FeatureExtractor(model, params, bs,
                          batch_size=cfg.data.eval_batch_size)

    # warm: compile the fused-all program AND the sync-slice program on
    # scene 0 (otherwise phase 1 times a remote compile, not the upload)
    ds0 = stage_scene(scenes[0], cfg.data)
    sync(ds0.padded[::64, ::64, 0])
    emb = ex.extract_scene_device(scenes[0], cfg.data, device_scene=ds0)
    sync(emb)

    # 1) staging cost alone (fresh scene -> pad + H2D + force the transfer)
    t0 = time.perf_counter()
    ds1 = stage_scene(scenes[1], cfg.data)
    t_pad = time.perf_counter() - t0  # np.pad + asarray return
    sync(ds1.padded[::64, ::64, 0])   # force the H2D to finish
    t_stage = time.perf_counter() - t0
    mb = ds1.padded.size * ds1.padded.dtype.itemsize / 1e6
    print(f"stage_scene: pad+enqueue {t_pad*1e3:.0f} ms, "
          f"uploaded+synced {t_stage*1e3:.0f} ms ({mb:.1f} MB "
          f"-> {mb/t_stage:.0f} MB/s effective)")

    # warm scene-1 compute (identical shapes -> no recompile expected)
    sync(ex.extract_scene_device(scenes[1], cfg.data, device_scene=ds1))

    # 2) compute alone (scene 0, already staged)
    t0 = time.perf_counter()
    sync(ex.extract_scene_device(scenes[0], cfg.data, device_scene=ds0))
    t_compute = time.perf_counter() - t0
    print(f"compute alone: {t_compute*1e3:.0f} ms")

    # 3) overlap: dispatch scene-0 compute (async), then stage scene 1
    #    (fresh copy so the upload is real), then sync both
    scene1b = make(1)
    t0 = time.perf_counter()
    emb = ex.extract_scene_device(scenes[0], cfg.data, device_scene=ds0)
    ds1b = stage_scene(scene1b, cfg.data)
    sync(ds1b.padded[::64, ::64, 0])
    sync(emb)
    t_both = time.perf_counter() - t0
    print(f"compute + overlapped staging: {t_both*1e3:.0f} ms "
          f"(serial sum would be {(t_compute + t_stage)*1e3:.0f} ms -> "
          f"overlap hides {(t_compute + t_stage - t_both)*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
