"""Test configuration: force an 8-device virtual CPU mesh so that sharding
and collective logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon sitecustomize pre-imports jax and pins the platform list, so the
# env var alone is not enough — override the config before first backend use
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from dnascent_tpu.config import DNA_R10  # noqa: E402
from dnascent_tpu.io.poremodel import synthetic_model_set  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return DNA_R10


@pytest.fixture(scope="session")
def models(cfg):
    return synthetic_model_set(cfg)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
