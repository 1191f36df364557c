"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``xla_force_host_platform_device_count`` (the driver separately dry-runs
the multi-chip path through __graft_entry__.dryrun_multichip).
"""

import os

# In this environment the axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME and jax.config both work, so set all of them.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
