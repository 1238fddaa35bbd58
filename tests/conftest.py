"""Test harness: force an 8-virtual-device CPU platform BEFORE jax import so
multi-chip sharding logic is exercised without TPU hardware (the reference has
no distributed-test story at all; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(2, 4)
    with Mesh(devices, ("replica", "fsdp")) as mesh:
        yield mesh
