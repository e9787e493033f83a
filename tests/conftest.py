"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's oracle-comparison strategy (SURVEY.md §4): the pure-jnp
reference renderer is the test oracle; sharding tests compare a fake multi-device
mesh against single-device results. Must set env vars before jax initializes.
"""
import os

# NOTE: this environment's sitecustomize registers a remote "axon" TPU backend and
# force-sets jax_platforms via jax.config.update at interpreter start — the env var
# alone is NOT enough; we must update the config after jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
