"""The driver entry points must keep working — dryrun compiles the full SPMD
train step over an 8-virtual-device mesh."""

import importlib.util
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


def test_dryrun_multichip_8():
    spec = importlib.util.spec_from_file_location("graft_entry", REPO / "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(8)  # raises on non-finite loss / sharding errors


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Reproduce the driver's EXACT invocation: a fresh process with NO
    conftest platform forcing (round 1 failed here: the sitecustomize axon
    platform leaked through and the mesh saw 1 device, MULTICHIP_r01.json).
    dryrun_multichip must self-provision the virtual CPU devices."""
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "[dryrun] ok: devices=8" in proc.stdout
    # Round-2 regression: GSPMD resolved the projector/embedding seams to
    # conflicting fwd/bwd shardings and fell back to replicating activations
    # ("Involuntary full rematerialization") — the seam constraints in
    # parallel.sharding + the vocab-parallel embed rule must keep the SPMD
    # compile clean.
    assert "Involuntary full rematerialization" not in proc.stderr + proc.stdout
    # The dryrun also proves the tensor-parallel serving path (SERVING_RULES +
    # the pallas kernel's custom_partitioning prefill) against single-device.
    assert "[dryrun] serving-tp ok" in proc.stdout
