"""CLI: ``python -m deepmerge_tpu <command> [section.key=value ...]``.

The reference has no CLI at all — every hyperparameter is edited in source
(``Train_SMT.py:363-379``, ``config.py``). Commands:

  train              train on a synthetic scene (or --scene-dir real data)
  extract            extract + score + merge one scene folder
  process-folder     multi-scene batch (ExtractFeatures.py:241-303 analog)
  export-synthetic   write a synthetic scene in the reference file layout
  calibrate          pick merge.threshold on a labeled validation scene
  import-ckpt        convert a reference torch .pth checkpoint to .msgpack
  export-ckpt        convert a TPU checkpoint to a reference-loadable .pth
  config             print the resolved config
"""

from __future__ import annotations

import argparse
import sys

from deepmerge_tpu.config import Config, apply_overrides


def _majority_object_per_region(labels, objects, num_regions):
    """(R,) majority ground-truth object id per superpixel region.

    Sparse mode-per-region: count unique (region, object) pixel pairs, then
    assign in ascending-count order so each region keeps its largest. Stays
    O(unique pairs) — a dense (R, n_objects) table would blow up on real
    mosaics with 100k regions.
    """
    import numpy as np

    lab = np.asarray(labels).ravel().astype(np.int64)
    obj = np.asarray(objects).ravel()
    # negative ids (-1 nodata conventions) would alias into other regions
    # through the key arithmetic below — drop those pixels instead
    keep = (lab >= 0) & (obj >= 0)
    if not keep.all():
        lab, obj = lab[keep], obj[keep]
    if lab.size and lab.max() >= num_regions:
        raise ValueError(
            f"label map contains region id {int(lab.max())} >= "
            f"num_regions={num_regions}"
        )
    uniq, inv = np.unique(obj, return_inverse=True)
    key, counts = np.unique(lab * len(uniq) + inv, return_counts=True)
    best = np.zeros(num_regions, np.int64)
    order = np.argsort(counts, kind="stable")
    best[key[order] // len(uniq)] = key[order] % len(uniq)
    return uniq[best]


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepmerge_tpu")
    parser.add_argument(
        "--platform",
        choices=("cpu", "tpu"),
        help="force the JAX platform (relayed-TPU sites override the "
        "JAX_PLATFORMS env var, so this goes through jax.config)",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train")
    p_train.add_argument("--scene-dir", help="reference-layout data dir")
    p_train.add_argument("--scene-name", help="scene name inside --scene-dir")
    p_train.add_argument("--epochs", type=int)
    p_train.add_argument("--max-steps", type=int)
    p_train.add_argument("--mesh", action="store_true")
    p_train.add_argument(
        "--pos-pairs",
        help="positive pair txt file or folder (the reference's "
        "PositiveData layout) — use with real scenes that have no "
        "ground-truth object map",
    )
    p_train.add_argument(
        "--neg-pairs",
        help="negative pair txt file or folder (reference NegativeData)",
    )
    p_train.add_argument("overrides", nargs="*", default=[])

    p_ex = sub.add_parser("extract")
    p_ex.add_argument("--image", required=True)
    p_ex.add_argument("--polygons", required=True)
    p_ex.add_argument("--points", required=True)
    p_ex.add_argument("--lines")
    p_ex.add_argument("--h5")
    p_ex.add_argument("--checkpoint-dir")
    p_ex.add_argument("--labels", help="synthetic-layout labels .npy (optional)")
    p_ex.add_argument("--out-labels", help="write merged label map GeoTIFF here")
    p_ex.add_argument("--out-png", help="write colorized merged map PNG here")
    p_ex.add_argument(
        "--deep-pixels", choices=("error", "wrap", "shift", "clip"), default="error",
        help="handling for >8-bit rasters (uint16 etc.): refuse, drop low "
        "bits, or clamp",
    )
    p_ex.add_argument(
        "--mesh", action="store_true",
        help="shard extraction + merge over all devices (shard_map "
        "extraction; exact psum/pmin collective merge)",
    )
    p_ex.add_argument(
        "--stream-tiles", type=int, metavar="N",
        help="extract through N sequential column-strip tiles so the "
        "device never stages the whole mosaic (identical embeddings and "
        "partition; for scenes bigger than HBM)",
    )
    p_ex.add_argument("overrides", nargs="*", default=[])

    p_pf = sub.add_parser("process-folder")
    p_pf.add_argument("--images", required=True)
    p_pf.add_argument("--shapefiles", required=True)
    p_pf.add_argument("--checkpoint-dir")
    p_pf.add_argument(
        "--mesh", action="store_true",
        help="shard each scene's extraction + merge over all devices "
        "(data-axis shard_map extraction; exact psum/pmin collective merge)",
    )
    p_pf.add_argument(
        "--deep-pixels", choices=("error", "wrap", "shift", "clip"), default="error",
        help="handling for >8-bit rasters (uint16 etc.)",
    )
    p_pf.add_argument(
        "--write-labelmaps", action="store_true",
        help="write each scene's merged label map as <model>_merged.tif "
        "(needs a <name>_labels.npy superpixel sidecar per scene)",
    )
    p_pf.add_argument(
        "--stream-tiles", type=int, metavar="N",
        help="per-scene HBM bound: extract each scene through N "
        "sequential column-strip tiles",
    )
    p_pf.add_argument(
        "--watch", type=float, metavar="SECONDS",
        help="serving loop: rescan the folder every SECONDS and process "
        "newly appeared scenes (failed scenes retry each scan)",
    )
    p_pf.add_argument(
        "--watch-iterations", type=int, metavar="K",
        help="stop after K folder scans (default: until killed)",
    )
    p_pf.add_argument("overrides", nargs="*", default=[])

    p_syn = sub.add_parser("export-synthetic")
    p_syn.add_argument("--out", required=True)
    p_syn.add_argument("--size", type=int, default=512)
    p_syn.add_argument("--regions", type=int, default=200)
    p_syn.add_argument("--objects", type=int, default=24)
    p_syn.add_argument("--seed", type=int, default=0)
    p_syn.add_argument("--compress", choices=["none", "deflate"],
                       default="none", help="raster compression (writer)")

    p_cal = sub.add_parser("calibrate")
    p_cal.add_argument("--image", required=True)
    p_cal.add_argument("--polygons", required=True)
    p_cal.add_argument("--points", required=True)
    p_cal.add_argument("--lines")
    p_cal.add_argument("--labels", required=True,
                       help="superpixel label map .npy of the scene")
    p_cal.add_argument("--objects", required=True,
                       help="ground-truth OBJECT map .npy (pixel-level)")
    p_cal.add_argument("--checkpoint-dir")
    p_cal.add_argument(
        "--deep-pixels", choices=("error", "wrap", "shift", "clip"), default="error",
        help="handling for >8-bit rasters (uint16 etc.)",
    )
    p_cal.add_argument("overrides", nargs="*", default=[])

    p_imp = sub.add_parser("import-ckpt")
    p_imp.add_argument("pth", help="reference torch checkpoint (.pth)")
    p_imp.add_argument("out", help="output .msgpack path")
    p_imp.add_argument("overrides", nargs="*", default=[])

    p_exp = sub.add_parser("export-ckpt")
    p_exp.add_argument("ckpt", help="orbax checkpoint dir or .msgpack file")
    p_exp.add_argument("out", help="output reference .pth path")
    p_exp.add_argument("--epoch", type=int, default=0)
    p_exp.add_argument("overrides", nargs="*", default=[])

    p_cfg = sub.add_parser("config")
    p_cfg.add_argument("overrides", nargs="*", default=[])

    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    cfg = apply_overrides(Config(), getattr(args, "overrides", []))

    if args.cmd == "config":
        print(cfg.to_json())
        return 0

    if args.cmd == "import-ckpt":
        from deepmerge_tpu.compat.torch_import import (
            load_torch_checkpoint,
            save_flax_variables,
        )

        variables = load_torch_checkpoint(args.pth, cfg)
        save_flax_variables(variables, args.out)
        print(f"imported -> {args.out} (model {cfg.model.name})")
        return 0

    if args.cmd == "export-ckpt":
        import os

        from deepmerge_tpu.compat.torch_export import save_torch_checkpoint

        epoch = args.epoch
        if os.path.isdir(args.ckpt):  # orbax checkpoint directory
            import json as _json

            import orbax.checkpoint as ocp

            payload = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.ckpt)
            )
            variables = {"params": payload["params"]}
            if payload.get("batch_stats"):
                variables["batch_stats"] = payload["batch_stats"]
            meta_path = os.path.join(args.ckpt, "meta.json")
            if os.path.exists(meta_path) and not args.epoch:
                with open(meta_path) as f:
                    epoch = int(_json.load(f).get("epoch", 0))
        else:  # .msgpack (import-ckpt output)
            from deepmerge_tpu.compat.torch_import import load_flax_variables

            variables = load_flax_variables(args.ckpt)
        save_torch_checkpoint(variables, cfg.model, args.out, epoch=epoch)
        print(
            f"exported -> {args.out} (model {cfg.model.name}, epoch {epoch};"
            " reference-loadable via checkpoint['net'])"
        )
        return 0

    if args.cmd == "export-synthetic":
        from deepmerge_tpu.geodata.ingest import export_scene
        from deepmerge_tpu.geodata.synthetic import generate_scene

        scene = generate_scene(
            h=args.size, w=args.size, n_regions=args.regions,
            n_objects=args.objects, seed=args.seed,
        )
        paths = export_scene(
            scene, args.out,
            compression=None if args.compress == "none" else args.compress,
        )
        import os

        import numpy as np

        labels_path = os.path.join(args.out, f"{scene.name}_labels.npy")
        np.save(labels_path, scene.labels)
        paths["labels"] = labels_path
        objects_path = os.path.join(args.out, f"{scene.name}_objects.npy")
        np.save(objects_path, scene.object_of_region[scene.labels])
        paths["objects"] = objects_path
        for k, v in paths.items():
            print(f"{k}: {v}")
        return 0

    if args.cmd == "train":
        import dataclasses

        from deepmerge_tpu.train.driver import train

        if args.epochs is not None:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, num_epochs=args.epochs)
            )
        scene = None
        if args.scene_dir:
            import os

            def load_cli_scene(name):
                """Scene + export-synthetic sidecars ({name}_labels.npy
                superpixel map, {name}_objects.npy ground-truth object
                map — with them a dir trains directly, no pair txts)."""
                import numpy as np

                from deepmerge_tpu.geodata.ingest import load_scene

                labels_npy = os.path.join(args.scene_dir,
                                          f"{name}_labels.npy")
                objects_npy = os.path.join(args.scene_dir,
                                           f"{name}_objects.npy")
                labels = (np.load(labels_npy)
                          if os.path.exists(labels_npy) else None)
                s = load_scene(
                    os.path.join(args.scene_dir, f"{name}.tif"),
                    os.path.join(args.scene_dir, f"{name}.shp"),
                    os.path.join(args.scene_dir, name, "PointsGCS.shp"),
                    os.path.join(args.scene_dir, name, "lines.shp"),
                    labels=labels,
                    name=name,
                )
                if labels is not None and os.path.exists(objects_npy):
                    s.object_of_region = _majority_object_per_region(
                        labels, np.load(objects_npy), s.regions.num_regions
                    )
                return s

            if args.scene_name:
                scene = load_cli_scene(args.scene_name)
            else:
                # no --scene-name: train over EVERY scene in the dir (the
                # reference iterates pair files over all training tiles,
                # MyUtils1.py:236-295). Needs ground-truth sidecars per
                # scene — pair txts stay single-scene (per-scene ids).
                if args.pos_pairs or args.neg_pairs:
                    parser.error(
                        "--pos-pairs/--neg-pairs need --scene-name: pair "
                        "ids are per-scene"
                    )
                names = sorted(
                    os.path.splitext(f)[0]
                    for f in os.listdir(args.scene_dir)
                    if f.endswith(".shp") and os.path.exists(
                        os.path.join(args.scene_dir,
                                     os.path.splitext(f)[0],
                                     "PointsGCS.shp")
                    )
                )
                if not names:
                    parser.error(
                        f"--scene-dir {args.scene_dir}: no scenes found "
                        "(<name>.shp + <name>/PointsGCS.shp layout)"
                    )
                scene = [load_cli_scene(n) for n in names]
                for s in scene:
                    if s.object_of_region is None:
                        parser.error(
                            f"scene '{s.name}' has no ground-truth sidecars "
                            "({name}_labels.npy + {name}_objects.npy) — "
                            "multi-scene training derives pairs from them"
                        )
                print(f"training over {len(scene)} scenes: "
                      f"{[s.name for s in scene]}")
                if len(scene) == 1:
                    scene = scene[0]
        pos_pairs = neg_pairs = None
        if args.pos_pairs or args.neg_pairs:
            if not (args.pos_pairs and args.neg_pairs):
                parser.error("--pos-pairs and --neg-pairs go together")
            if scene is None:
                # pair txt files hold PER-SCENE region ids; without the
                # scene they came from, training would index a synthetic
                # scene with foreign ids
                parser.error("--pos-pairs/--neg-pairs need --scene-dir "
                             "(+ --scene-name): pair ids are per-scene")
            from deepmerge_tpu.geodata.pairgen import read_pair_source

            pos_pairs = read_pair_source(args.pos_pairs, args.scene_name)
            neg_pairs = read_pair_source(args.neg_pairs, args.scene_name)
        train(cfg, scene=scene, pos_pairs=pos_pairs, neg_pairs=neg_pairs,
              use_mesh=args.mesh, max_steps_per_epoch=args.max_steps)
        return 0

    if args.cmd == "extract":
        from deepmerge_tpu.geodata.ingest import load_scene
        from deepmerge_tpu.infer.driver import load_params, process_scene

        labels = None
        if args.labels:
            import numpy as np

            labels = np.load(args.labels)
        elif args.out_labels or args.out_png:
            parser.error(
                "--out-labels/--out-png need --labels (the superpixel label "
                "map); without it the merged map would be meaningless"
            )
        scene = load_scene(args.image, args.polygons, args.points, args.lines,
                           deep_pixels=args.deep_pixels,
                           labels=labels)
        model, params, bs = load_params(cfg, args.checkpoint_dir)
        mesh = None
        if args.mesh:
            if args.stream_tiles:
                parser.error("--mesh and --stream-tiles are exclusive: a "
                             "mesh already spreads the scene across chips")
            import jax

            from deepmerge_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        emb, simi, result = process_scene(
            cfg, scene, model, params, bs,
            h5_path=args.h5, lines_path=args.lines, mesh=mesh,
            stream_tiles=args.stream_tiles,
        )
        print(f"embedded {emb.shape[0]} points; scored {len(simi)} edges")
        if result is not None and (args.out_labels or args.out_png):
            label_map = result.label_map(scene)
            if args.out_labels:
                from deepmerge_tpu.infer.merge import write_label_geotiff

                write_label_geotiff(args.out_labels, label_map,
                                    scene.meta.get("geotransform"))
                print(f"merged label map -> {args.out_labels}")
            if args.out_png:
                from deepmerge_tpu.utils.viz import save_label_map

                written = save_label_map(args.out_png, label_map, scene.image)
                print(f"visualization -> {written}")
        return 0

    if args.cmd == "calibrate":
        # The reference stops at scored edges and leaves thresholding to
        # downstream tooling (ExtractFeatures.py:150-225), so the merge
        # threshold is this framework's own deployment surface: sweep it
        # on a labeled validation scene instead of hand-picking.
        import numpy as np

        from deepmerge_tpu.geodata.ingest import load_scene
        from deepmerge_tpu.infer.calibrate import calibrate_threshold
        from deepmerge_tpu.infer.driver import load_params
        from deepmerge_tpu.infer.extract import FeatureExtractor

        labels = np.load(args.labels)
        objects = np.load(args.objects)
        scene = load_scene(args.image, args.polygons, args.points,
                           args.lines, labels=labels,
                           deep_pixels=args.deep_pixels)
        region_objects = _majority_object_per_region(
            labels, objects, scene.regions.num_regions
        )
        model, params, bs = load_params(cfg, args.checkpoint_dir)
        extractor = FeatureExtractor(
            model, params,
            batch_stats=dict(bs) if bs else None,
            batch_size=min(cfg.data.eval_batch_size,
                           scene.regions.num_points),
        )
        emb = extractor.extract_scene(scene, cfg.data)
        cal = calibrate_threshold(
            scene, emb, region_objects=region_objects,
            max_rounds=cfg.merge.max_rounds,
        )
        print(cal)
        print(f"override: merge.threshold={cal.threshold:.6f}")
        return 0

    if args.cmd == "process-folder":
        from deepmerge_tpu.infer.driver import process_folder

        mesh = None
        if args.mesh:
            if args.stream_tiles:
                parser.error("--mesh and --stream-tiles are exclusive: a "
                             "mesh already spreads each scene across chips")
            import jax

            from deepmerge_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        done = process_folder(cfg, args.images, args.shapefiles,
                              args.checkpoint_dir,
                              deep_pixels=args.deep_pixels, mesh=mesh,
                              write_labelmaps=args.write_labelmaps,
                              stream_tiles=args.stream_tiles,
                              watch_seconds=args.watch,
                              watch_iterations=args.watch_iterations)
        print(f"processed {len(done)} scenes")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
