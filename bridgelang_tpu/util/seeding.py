"""Deterministic seeding utilities.

Counterpart of the reference's `set_global_seed` + per-worker SeedSequence
(reference: prismatic/util/torch_utils.py:31-75). JAX is functional — there is
no global RNG to set — so the TPU-native contract is: derive one root
`jax.random.key` per run, fold in process index / named purposes, and seed the
host-side libraries (numpy / python / tf.data) that feed the input pipeline.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def set_global_seed(seed: int, get_worker_init_fn: bool = False):
    """Seed all host-side RNGs; return a worker-init fn if requested (parity
    with reference torch DataLoader workers, harmless under tf.data)."""
    assert np.iinfo(np.uint32).max > seed >= 0, f"Seed {seed} out of range"
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    try:  # seed TF's global generator if TF is loaded (host data pipeline only)
        import sys

        if "tensorflow" in sys.modules:
            sys.modules["tensorflow"].random.set_seed(seed)
    except Exception:
        pass
    return (lambda worker_id: _worker_init_fn(seed, worker_id)) if get_worker_init_fn else None


def _worker_init_fn(seed: int, worker_id: int) -> None:
    process = int(os.environ.get("JAX_PROCESS_INDEX", "0"))
    ss = np.random.SeedSequence([seed, process, worker_id])
    np.random.seed(ss.generate_state(4))
    random.seed(int(ss.generate_state(1)[0]))


def root_key(seed: int, process_unique: bool = False):
    """Root jax.random key for a run; optionally folded with process index so
    each host draws distinct streams (e.g. data augmentation)."""
    import jax

    key = jax.random.key(seed)
    if process_unique:
        key = jax.random.fold_in(key, jax.process_index())
    return key
