"""Device mesh construction + distributed bootstrap.

TPU-native replacement for the reference's process-group machinery
(reference: overwatch.py:50-54 boots torch.distributed via torchrun env;
fsdp.py:84-89 picks hybrid sharding strategies). Here topology is explicit:
a `jax.sharding.Mesh` with axes

    ("replica", "fsdp", "tensor")

* `replica` — pure data parallelism; gradients all-reduce over it. Maps to
  DCN across slices (the reference's inter-node replication in
  _HYBRID_SHARD_ZERO2 / HYBRID_SHARD).
* `fsdp`    — parameter/optimizer sharding axis (ZeRO-3 analogue); rides ICI.
* `tensor`  — megatron-style tensor parallelism (a capability the reference
  does NOT have, SURVEY.md §2.10); innermost so its collectives stay on ICI.

Batch is sharded over (replica, fsdp); params over (fsdp, tensor) per the
rules in bridgelang_tpu.parallel.sharding.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES = ("replica", "fsdp", "tensor")


# Environment markers that identify a multi-host TPU pod worker (set by the
# Cloud TPU runtime); their presence means jax.distributed.initialize() can
# auto-detect the full topology with no explicit configuration.
_TPU_POD_ENV_MARKERS = ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID", "MEGASCALE_COORDINATOR_ADDRESS")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (call once per process BEFORE any device use —
    probing jax.process_count() here would initialize the backend and break
    the distributed init). Equivalent of torchrun env-var setup; topology
    comes from args, from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env, or — on a Cloud TPU pod worker — from full
    auto-detection. No-op on a plain single host."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if addr is None and num_processes is None and process_id is None:
        if any(m in os.environ for m in _TPU_POD_ENV_MARKERS):
            jax.distributed.initialize()  # pod runtime auto-detects everything
        return
    jax.distributed.initialize(coordinator_address=addr, num_processes=num_processes, process_id=process_id)


def parse_mesh_shape(spec: Optional[str], n_devices: int) -> Tuple[int, int, int]:
    """Parse "replica=2,fsdp=4,tensor=1" (missing axes default to 1; one axis
    may be -1 to absorb the remainder)."""
    if not spec:
        return (1, n_devices, 1)
    sizes = {"replica": 1, "fsdp": 1, "tensor": 1}
    for part in spec.split(","):
        k, v = part.split("=")
        sizes[k.strip()] = int(v)
    unknowns = [k for k, v in sizes.items() if v == -1]
    known = int(np.prod([v for v in sizes.values() if v != -1]))
    if unknowns:
        assert len(unknowns) == 1, "only one mesh axis may be -1"
        sizes[unknowns[0]] = n_devices // known
    shape = (sizes["replica"], sizes["fsdp"], sizes["tensor"])
    assert int(np.prod(shape)) == n_devices, f"mesh {shape} != {n_devices} devices"
    return shape


def hybrid_mesh_plan(shape: Tuple[int, int, int], n_slices: int):
    """Multi-slice layout: the replica axis rides DCN (slice boundaries),
    fsdp/tensor stay inside a slice on ICI — the reference's hybrid-FSDP
    semantics (shard within node, replicate across nodes; fsdp.py:84-89).
    Returns (ici_shape, dcn_shape) for mesh_utils.create_hybrid_device_mesh,
    or None when the shape cannot split cleanly across slices."""
    if n_slices <= 1:
        return None
    replica, fsdp, tensor = shape
    if replica % n_slices != 0:
        return None
    return (replica // n_slices, fsdp, tensor), (n_slices, 1, 1)


def make_mesh(mesh_shape: Optional[str] = None, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if not mesh_shape and n_slices > 1 and len(devices) % n_slices == 0:
        # Default on a multi-slice pod: one pure-DP replica per slice, fsdp
        # inside each slice — fsdp collectives stay on ICI by construction.
        shape: Tuple[int, int, int] = (n_slices, len(devices) // n_slices, 1)
    else:
        shape = parse_mesh_shape(mesh_shape, len(devices))
    # jax.experimental.mesh_utils lays devices out along ICI when possible;
    # on a multi-slice pod the replica axis is placed across DCN so that the
    # param all-gathers/grad reduce-scatters (fsdp/tensor axes) never leave a
    # slice and only the pure-DP gradient all-reduce crosses slices.
    try:
        from jax.experimental import mesh_utils

        plan = hybrid_mesh_plan(shape, n_slices)
        if plan is not None:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                plan[0], plan[1], devices=devices
            )
        else:
            if n_slices > 1:
                import warnings

                warnings.warn(
                    f"mesh shape {shape} does not split the replica axis across "
                    f"{n_slices} slices; fsdp/tensor collectives will cross DCN — "
                    "expect a large perf hit. Use replica=<n_slices>*k."
                )
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception as e:
        import warnings

        warnings.warn(
            f"mesh_utils device layout failed ({type(e).__name__}: {e}); falling "
            "back to a topology-oblivious reshape — collective performance may "
            "suffer on real hardware."
        )
        dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)


def strategy_mesh_spec(train_strategy: str, n_devices: int, devices_per_slice: Optional[int] = None) -> str:
    """Map the reference's strategy ids to a mesh shape
    (reference: training/materialize.py:16-19 registers the two FSDP flavors).

    fsdp-full-shard    -> shard params over every device in a slice, replicate
                          across slices (HYBRID_SHARD analogue).
    fsdp-shard-grad-op -> params effectively gathered for compute; we express
                          ZeRO-2 as fsdp sharding of optimizer state only
                          (see sharding.opt_state_sharding).
    ddp                -> pure replication.
    """
    per_slice = devices_per_slice or n_devices
    if train_strategy in ("fsdp-full-shard", "fsdp-shard-grad-op"):
        return f"replica={n_devices // per_slice},fsdp={per_slice},tensor=1"
    if train_strategy == "ddp":
        return f"replica={n_devices},fsdp=1,tensor=1"
    raise ValueError(f"Unknown train strategy {train_strategy!r}")
