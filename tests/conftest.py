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


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full tier including @pytest.mark.slow tests (~35 min on "
             "this 1-core box; the default fast tier is ~13 min and still "
             "touches every subsystem)")


def pytest_collection_modifyitems(config, items):
    # Two-tier gate (VERDICT r03 item 2): the suite outgrew its budget on the
    # 1-core box (263 tests = ~35-39 min measured), and an unaffordable gate
    # stops being run. Slow tests are real work (interpret-mode Pallas
    # sweeps, SPMD compiles, e2e lifecycle) — every one still runs under
    # --full, and each subsystem keeps at least one fast representative.
    if config.getoption("--full") or config.getoption("-m"):
        return  # explicit -m selections manage their own scope
    skip = pytest.mark.skip(reason="slow tier: run with --full (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def eight_device_mesh():
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(2, 4, 1)
    with Mesh(devices, ("replica", "fsdp", "tensor")) as mesh:
        yield mesh
