"""Test harness: force an 8-virtual-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).  The env vars
must be set before JAX initializes a backend, and the platform override must
also go through ``jax.config`` because the environment's axon sitecustomize
registers the TPU backend at interpreter start.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mutag():
    from graph_transformer_tpu.data.tu import load_tu_dataset

    return load_tu_dataset("MUTAG")


@pytest.fixture(scope="session")
def ptc():
    from graph_transformer_tpu.data.tu import load_tu_dataset

    return load_tu_dataset("PTC")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
