"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/collective tests run anywhere (the JAX-idiomatic fake-mesh pattern;
SURVEY §4).  Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote TPU ("axon") backend and
# pins jax_platforms to it, overriding the env var — force CPU back on before
# any backend is initialized so tests never dispatch over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
