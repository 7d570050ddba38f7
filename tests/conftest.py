"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths
(jax.sharding.Mesh / pjit / shard_map) are exercised without TPU hardware
(SURVEY.md §4: emulate 8 devices via xla_force_host_platform_device_count).
Environment must be set before the first jax import.
"""
import os

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS to the TPU
# plugin, so setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ('axon') backend
# and force-sets jax_platforms='axon,cpu' programmatically, so the env var
# alone is not enough — override the config again post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
