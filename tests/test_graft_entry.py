"""The driver entry points must keep working — dryrun compiles the full SPMD
train step over an 8-virtual-device mesh."""

import importlib.util
from pathlib import Path

import pytest


def test_dryrun_multichip_8():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(8)  # raises on non-finite loss / sharding errors
