"""End-to-end CLI drives (tiny model, CPU).

The calibrate subcommand is this framework's own deployment surface: the
reference stops at scored edges (``ExtractFeatures.py:150-225``) and the
merge threshold is hand-picked downstream — here it is swept on a labeled
validation scene instead.
"""

import numpy as np

from deepmerge_tpu.__main__ import _majority_object_per_region, main

TINY = [
    "model.embed_dim=64", "model.depth=1,1,1", "model.num_heads=4",
    "model.out_dim=16", "model.dtype=float32",
    "model.input_image_scales=16,32,64", "data.patch_sizes=16,32,64",
    "data.eval_batch_size=16", "data.max_window=256",
]


def test_majority_object_per_region():
    labels = np.array([[0, 0, 1], [0, 1, 1]])
    objects = np.array([[5, 5, 9], [7, 9, 5]])
    out = _majority_object_per_region(labels, objects, 2)
    assert out.tolist() == [5, 9]


def test_majority_object_tie_is_deterministic():
    labels = np.zeros((2, 2), np.int32)
    objects = np.array([[3, 3], [8, 8]])
    out = _majority_object_per_region(labels, objects, 1)
    assert out.shape == (1,) and out[0] in (3, 8)


def test_calibrate_cli(tmp_path, capsys):
    out = tmp_path / "scene"
    assert main([
        "export-synthetic", "--out", str(out), "--size", "96",
        "--regions", "24", "--objects", "6", "--seed", "3",
    ]) == 0
    assert (out / "synthetic_objects.npy").exists()
    assert main([
        "calibrate",
        "--image", str(out / "synthetic.tif"),
        "--polygons", str(out / "synthetic.shp"),
        "--points", str(out / "synthetic" / "PointsGCS.shp"),
        "--lines", str(out / "synthetic" / "lines.shp"),
        "--labels", str(out / "synthetic_labels.npy"),
        "--objects", str(out / "synthetic_objects.npy"),
        *TINY,
    ]) == 0
    text = capsys.readouterr().out
    assert "calibrated threshold" in text
    assert "override: merge.threshold=" in text


def test_train_cli_on_exported_scene_dir(tmp_path):
    """`train --scene-dir` on an export-synthetic layout auto-loads the
    `{name}_labels.npy`/`{name}_objects.npy` sidecars (no pair txts needed)."""
    out = tmp_path / "scene"
    assert main([
        "export-synthetic", "--out", str(out), "--size", "96",
        "--regions", "16", "--objects", "4", "--seed", "5",
    ]) == 0
    assert main([
        "train", "--scene-dir", str(out), "--scene-name", "synthetic",
        "--epochs", "1", "--max-steps", "1",
        *TINY, "data.batch_size=8",
        f"train.checkpoint_dir={tmp_path / 'ckpt'}",
        f"train.log_dir={tmp_path / 'logs'}",
    ]) == 0


def test_train_cli_multi_scene_dir(tmp_path):
    """`train --scene-dir` WITHOUT --scene-name trains over every scene in
    the dir (reference trains across many tiles, MyUtils1.py:236-295)."""
    import os
    import shutil

    out = tmp_path / "scenes"
    for seed, name in ((3, "a_tile"), (4, "b_tile")):
        stage = tmp_path / f"stage{seed}"
        assert main([
            "export-synthetic", "--out", str(stage), "--size", "96",
            "--regions", "12", "--objects", "3", "--seed", str(seed),
        ]) == 0
        os.makedirs(out / name, exist_ok=True)
        os.rename(stage / "synthetic.tif", out / f"{name}.tif")
        for ext in (".shp", ".shx", ".dbf"):
            os.rename(stage / f"synthetic{ext}", out / f"{name}{ext}")
            for base in ("PointsGCS", "lines"):
                src = stage / "synthetic" / f"{base}{ext}"
                if src.exists():
                    os.rename(src, out / name / f"{base}{ext}")
        for sidecar in ("labels", "objects"):
            os.rename(stage / f"synthetic_{sidecar}.npy",
                      out / f"{name}_{sidecar}.npy")
        shutil.rmtree(stage)

    assert main([
        "train", "--scene-dir", str(out),
        "--epochs", "1", "--max-steps", "1",
        *TINY, "data.batch_size=4",
        f"train.checkpoint_dir={tmp_path / 'ckpt'}",
        f"train.log_dir={tmp_path / 'logs'}",
    ]) == 0


def test_extract_cli_stream_tiles(tmp_path, capsys):
    """`extract --stream-tiles N` runs the streamed strip extraction end to
    end (and refuses to combine with --mesh)."""
    import pytest

    out = tmp_path / "scene"
    assert main([
        "export-synthetic", "--out", str(out), "--size", "96",
        "--regions", "16", "--objects", "4", "--seed", "9",
    ]) == 0
    scene_args = [
        "--image", str(out / "synthetic.tif"),
        "--polygons", str(out / "synthetic.shp"),
        "--points", str(out / "synthetic" / "PointsGCS.shp"),
        "--lines", str(out / "synthetic" / "lines.shp"),
    ]
    assert main(["extract", *scene_args, "--stream-tiles", "3", *TINY]) == 0
    assert "embedded" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["extract", *scene_args, "--stream-tiles", "3", "--mesh", *TINY])
