"""Test harness: force an 8-virtual-device CPU platform so multi-chip sharding
logic is exercised without TPU hardware (the reference has no distributed-test
story at all; see SURVEY.md §4).

Note: this environment preloads a TPU plugin via sitecustomize, which imports
jax before pytest collects anything — env vars alone are too late, so we use
jax.config.update (effective until the backend is first initialized).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(2, 4, 1)
    with Mesh(devices, ("replica", "fsdp", "tensor")) as mesh:
        yield mesh
