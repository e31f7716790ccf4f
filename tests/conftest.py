"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA host-platform device virtualization so sharded
(multi-chip) code paths are exercised without TPU hardware — the standard JAX
'fake backend' for distributed tests (SURVEY.md §4).

Must set env vars BEFORE jax initializes a backend, hence module-level here.
"""

import os

# Env-var overrides alone are not enough here: the session's site hook
# (PYTHONPATH sitecustomize) pre-sets jax_platforms, so force via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("requires 8 virtual devices")
    return devs
