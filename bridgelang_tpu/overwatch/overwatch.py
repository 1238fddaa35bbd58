"""Rank-aware logging ("overwatch") for multi-host TPU runs.

TPU-native counterpart of the reference's Overwatch
(reference: prismatic/overwatch/overwatch.py:47-147). Differences by design:
the reference couples logger construction to torch.distributed process-group
initialization (via accelerate.PartialState); on TPU, process topology comes
from `jax.process_index()/process_count()` and `jax.distributed.initialize()`
is an explicit call (`bridgelang_tpu.parallel.mesh.initialize_distributed`),
so logging stays side-effect free.
"""

from __future__ import annotations

import logging
import os
import sys
from contextlib import contextmanager
from functools import wraps
from typing import Any, Callable, Iterator

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s >> %(message)s"
_DATEFMT = "%m/%d %H:%M:%S"


def _backend_ready() -> bool:
    """True only if a jax backend is ALREADY initialized. Querying rank must
    never TRIGGER initialization: overwatch is created at script import time,
    and backend init that early (a) hangs for the whole relay outage when the
    TPU tunnel is down and (b) defeats any later jax.config platform override
    (scripts/deploy.py --force_cpu)."""
    jax_mod = sys.modules.get("jax")
    if jax_mod is None:
        return False
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def _process_index() -> int:
    # Cheap path first: honor env before jax is imported/initialized.
    if "JAX_PROCESS_INDEX" in os.environ:
        return int(os.environ["JAX_PROCESS_INDEX"])
    if _backend_ready():
        try:
            return sys.modules["jax"].process_index()
        except Exception:
            return 0
    return 0


def _process_count() -> int:
    if "JAX_PROCESS_COUNT" in os.environ:
        return int(os.environ["JAX_PROCESS_COUNT"])
    if _backend_ready():
        try:
            return sys.modules["jax"].process_count()
        except Exception:
            return 1
    return 1


class Overwatch:
    """Logger facade: INFO on process 0, ERROR elsewhere; rank helpers included."""

    def __init__(self, name: str) -> None:
        self.logger = logging.getLogger(name)
        if not logging.getLogger().handlers and not self.logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
            self.logger.addHandler(handler)
            self.logger.propagate = False
        self.logger.setLevel(logging.INFO)
        # Rank gating is a per-record FILTER, not a frozen level: overwatch is
        # built at import time, before jax.distributed (or any backend)
        # exists, and asking for the rank then would initialize a backend —
        # see _backend_ready. Once distributed init lands, non-zero ranks
        # drop below ERROR automatically.
        self.logger.addFilter(lambda rec: _process_index() == 0 or rec.levelno >= logging.ERROR)

        for lvl in ("debug", "info", "warning", "error", "critical"):
            setattr(self, lvl, getattr(self.logger, lvl))

    # --- rank utilities (reference: overwatch.py:56-92) ---
    def rank(self) -> int:
        return _process_index()

    def world_size(self) -> int:
        return _process_count()

    def is_rank_zero(self) -> bool:
        return _process_index() == 0

    def rank_zero_only(self, fn: Callable[..., Any]) -> Callable[..., Any]:
        @wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            if self.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper

    @contextmanager
    def local_zero_first(self) -> Iterator[None]:
        """Context manager analogue of the reference's `local_zero_first` decorator
        (reference: overwatch.py:78-80): process 0 runs the body first (e.g. a
        download), others proceed after. On JAX the sync point is a tiny psum.
        """
        import jax
        import jax.numpy as jnp

        if self.is_rank_zero() or jax.process_count() == 1:
            yield
            if jax.process_count() > 1:
                _cross_host_barrier()
        else:
            _cross_host_barrier()
            yield

    def rank_zero_info(self, msg: str, *args: Any) -> None:
        if self.is_rank_zero():
            self.logger.info(msg, *args)


def _cross_host_barrier() -> None:
    import jax
    import numpy as np

    # All-reduce of a scalar across processes acts as a barrier.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("overwatch_barrier")
    del jax, np


def initialize_overwatch(name: str) -> Overwatch:
    """Reference parity: prismatic/overwatch/overwatch.py:146-147 — but with no
    hidden process-group side effects (see module docstring)."""
    return Overwatch(name)
