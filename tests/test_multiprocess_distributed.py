"""2-process jax.distributed integration test (VERDICT round 1, Next #9).

Spawns two REAL processes that bootstrap through
parallel.mesh.initialize_distributed, build a shared 4-device mesh (2 local
CPU devices each), and exercise the multi-host code paths no single-process
test can reach:

  * make_array_from_process_local: per-host batches -> one global array
  * a jitted SPMD reduction whose result needs cross-process data
  * per-process dataset sharding (rlds dataset.shard(process_count, index))

The reference has no multi-node test story at all (SURVEY.md §4: gang-
scheduled torchrun, zero fakes); this is runnable on any CPU box.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from bridgelang_tpu.parallel.mesh import initialize_distributed, make_mesh

pid = int(sys.argv[1]); addr = sys.argv[2]
initialize_distributed(coordinator_address=addr, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from bridgelang_tpu.parallel.sharding import batch_sharding, make_array_from_process_local

mesh = make_mesh("replica=1,fsdp=4,tensor=1")

# Each process contributes DIFFERENT rows; the global mean needs both.
local = {"x": np.full((2, 4), float(pid), np.float32)}
global_batch = make_array_from_process_local(mesh, local)
assert global_batch["x"].shape == (4, 4), global_batch["x"].shape

@jax.jit
def mean_all(b):
    return jnp.mean(b["x"])

m = float(mean_all(global_batch))
assert abs(m - 0.5) < 1e-6, m  # (0*2 + 1*2 rows) / 4

# Per-process dataset sharding: the rlds loader shards episodes by process.
import tensorflow as tf
tf.config.set_visible_devices([], "GPU")
ds = tf.data.Dataset.range(10)
mine = list(ds.shard(jax.process_count(), jax.process_index()).as_numpy_iterator())
expect = list(range(pid, 10, 2))
assert mine == expect, (mine, expect)

print(f"WORKER_OK {pid} mean={m}")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), addr],
            cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{err[-3000:]}"
        assert f"WORKER_OK {pid}" in out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
