"""Parity metrics + visualization utilities."""

import numpy as np

from deepmerge_tpu.utils.parity import label_disagreement, pair_disagreement
from deepmerge_tpu.utils.viz import colorize_labels, save_label_map


def test_identical_partitions_zero_disagreement():
    a = np.array([[0, 0, 1], [1, 2, 2]])
    b = np.array([[5, 5, 3], [3, 0, 0]])  # same partition, renamed ids
    assert label_disagreement(a, b) == 0.0
    assert pair_disagreement(a, b) == 0.0


def test_disagreement_detects_flips():
    a = np.zeros((10, 10), np.int32)
    b = np.zeros((10, 10), np.int32)
    b[0, :5] = 1  # 5 of 100 pixels split off
    assert abs(label_disagreement(a, b) - 0.05) < 1e-9
    assert 0 < pair_disagreement(a, b) < 0.2


def test_total_disagreement():
    a = np.arange(16).reshape(4, 4)      # all singletons
    b = np.zeros((4, 4), np.int32)       # one cluster
    assert label_disagreement(a, b) == 1.0 - 1.0 / 16
    assert pair_disagreement(a, b) == 1.0


def test_colorize_and_save(tmp_path, rng):
    labels = rng.randint(0, 7, (16, 16))
    rgb = colorize_labels(labels)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    save_label_map(str(tmp_path / "lm.png"), labels, img)
    import os
    assert any(f.startswith("lm") for f in os.listdir(tmp_path))
