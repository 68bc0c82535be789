"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths run on ``--xla_force_host_platform_device_count=8``
CPU devices (SURVEY.md §4 — the "fake backend" the reference never had).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon site package force-sets jax_platforms=axon; env alone won't win
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from deepmerge_tpu.config import Config, DataConfig, ModelConfig  # noqa: E402
from deepmerge_tpu.geodata.synthetic import generate_scene  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute suites (quantize/pipeline/train/sharding/"
        "kernel-parity/DCN/checkpoint/folder-walk/torch-export) — the "
        "inner loop runs `-m 'not slow'` (~6 min), full suite ~26 min",
    )


@pytest.fixture(scope="session")
def tiny_model_cfg() -> ModelConfig:
    """A scaled-down v3 that keeps tests fast but exercises every path."""
    return ModelConfig(
        variant="v3",
        input_image_scales=(16, 32, 64),
        cube=8,
        embed_dim=64,
        depth=(2, 1, 1),
        num_heads=4,
        out_dim=32,
        dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_data_cfg() -> DataConfig:
    return DataConfig(
        patch_sizes=(16, 32, 64), max_window=128, batch_size=8,
        eval_batch_size=16,
    )


@pytest.fixture(scope="session")
def small_scene():
    return generate_scene(h=192, w=192, n_regions=40, n_objects=6, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
