"""Worker for the two-process jax.distributed (DCN) test.

Launched twice by tests/test_distributed_dcn.py with
``python dcn_worker.py <coordinator> <num_procs> <pid> <outfile>``.
Exercises ``parallel/distributed.initialize`` (reference has no distributed
path at all) + one cross-process all-gather + one data-parallel train step
whose gradient all-reduce rides the DCN link between the two processes.
"""

import json
import sys


def main():
    coordinator, num_procs, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import jax

    # the axon site package force-sets the platform; env alone won't win
    jax.config.update("jax_platforms", "cpu")

    from deepmerge_tpu.parallel.distributed import initialize

    initialize(coordinator=coordinator, num_processes=num_procs,
               process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_procs
    devices = jax.devices()
    assert len(devices) == num_procs  # one CPU device per process

    mesh = Mesh(np.asarray(devices).reshape(num_procs, 1), ("data", "model"))

    # 1) all-gather across processes: each contributes its own process id
    local = np.full((1, 4), float(pid), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local, (num_procs, 4)
    )

    @jax.jit
    def gather_sum(x):
        return x.sum()

    total = float(gather_sum(garr))  # sum over all processes' rows
    want_total = 4.0 * sum(range(num_procs))

    # 2) one data-parallel train step over the cross-process mesh
    from deepmerge_tpu.config import Config, DataConfig, ModelConfig
    from deepmerge_tpu.models.s2former import build_model
    from deepmerge_tpu.train.loop import create_train_state, make_train_step

    mcfg = ModelConfig(variant="v3", input_image_scales=(8, 16, 32), cube=4,
                       embed_dim=32, depth=(1, 1, 1), num_heads=4, out_dim=8,
                       dtype="float32", fused_attention=False)
    cfg = Config(model=mcfg, data=DataConfig(patch_sizes=(8, 16, 32),
                                             max_window=64, batch_size=2))
    model = build_model(mcfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, cfg)

    # params replicated, batch sharded over 'data' (one pair per process)
    rep = NamedSharding(mesh, P())
    state = state.replace(
        params=jax.device_put(state.params, rep),
        opt_state=jax.device_put(state.opt_state, rep),
    )
    rng = np.random.RandomState(0)  # same on both processes

    def patches():
        return tuple(
            rng.rand(num_procs, s, s, 3).astype(np.float32)
            for s in mcfg.input_image_scales
        )

    batch_host = {
        "left_patches": patches(),
        "right_patches": patches(),
        "left_designed": rng.rand(num_procs, 19).astype(np.float32),
        "right_designed": rng.rand(num_procs, 19).astype(np.float32),
        "flag": (np.arange(num_procs) % 2).astype(np.float32),
    }
    shard = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
            x[pid : pid + 1], x.shape,
        )

    batch = jax.tree.map(put, batch_host)
    state2, metrics = step(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])

    # 3) distributed merge: the psum/pmin collective rounds cross the REAL
    # process boundary and must reproduce the single-device device_merge
    # partition on an adversarial NON-MONOTONE chain (merging A-B moves
    # centroids enough to enable B-C in a later round).
    from deepmerge_tpu.ops.labelprop import device_merge

    # Weighted chain: region 0 = 3 points at 2.0, region 1 = one at 0.8,
    # region 2 = one at 2.9, threshold 1.3. Round 1: |2.0−0.8|=1.2 merges
    # {0,1} while |0.8−2.9|=2.1 fails; the merged mean (3·2.0+0.8)/4=1.7
    # pulls TOWARD region 2, so round 2 passes |1.7−2.9|=1.2 — a merge
    # that only becomes possible after the first (2 rounds, non-monotone).
    R = 3
    pemb = np.array(
        [[2.0, 0.0], [2.0, 0.0], [2.0, 0.0], [0.8, 0.0], [2.9, 0.0]],
        np.float32,
    )
    ppr = np.array([0, 0, 0, 1, 2], np.int32)
    chain_edges = np.array([[0, 1], [1, 2]], np.int32)
    thr = 1.3

    want_labels, want_rounds = jax.jit(
        device_merge, static_argnames=("num_regions", "max_rounds", "sweeps")
    )(
        jnp.asarray(pemb), jnp.asarray(ppr, jnp.int32),
        jnp.asarray(chain_edges, jnp.int32),
        jnp.ones(len(chain_edges), bool), thr, num_regions=R, max_rounds=16,
    )
    want_labels = np.asarray(want_labels)

    from deepmerge_tpu.parallel.distributed import distributed_merge

    got_labels, got_rounds = distributed_merge(
        pemb, ppr, R, chain_edges, mesh, threshold=thr, max_rounds=16,
    )
    # ≥2 rounds == the second merge only became possible AFTER the first
    # (the non-monotone property under test)
    merge_nontrivial = int(want_rounds) >= 2

    with open(outfile, "w") as f:
        json.dump({
            "pid": pid,
            "process_count": jax.process_count(),
            "gather_total": total,
            "gather_ok": abs(total - want_total) < 1e-6,
            "loss": loss,
            "merge_labels": np.asarray(got_labels).tolist(),
            "merge_want_labels": want_labels.tolist(),
            "merge_rounds": int(got_rounds),
            "merge_want_rounds": int(want_rounds),
            "merge_exact": bool(np.array_equal(got_labels, want_labels)),
            "merge_nontrivial": merge_nontrivial,
        }, f)


if __name__ == "__main__":
    main()
