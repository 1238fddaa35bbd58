"""Persistent XLA compilation cache + serving warm-up.

The 7B serving graph is a multi-minute one-time compile on this backend
(remote compile service); restarts must not pay it again. Two pieces:

  * `enable_persistent_cache()` — point jax at an on-disk compilation cache
    (env JAX_COMPILATION_CACHE_DIR, default /tmp/bridgelang_jax_cache). With
    a warm cache the full serving graph loads in seconds.
  * `warmup_predict()` — trace+compile (or cache-load) the jitted
    predict_action program at server startup with a dummy frame, so the
    first robot request gets steady-state latency instead of the compile.

The reference has no analogue (HF eager mode has no compile step; its cost
shows up as slow per-call latency instead).
"""

from __future__ import annotations

import os
import sys
import time


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/bridgelang_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization, never fatal
        print(f"[compile-cache] unavailable: {e}", file=sys.stderr)
    return cache_dir


def warmup_predict(model, params, max_batch: int = 1, unnorm_key: str | None = None,
                   speculative: bool = False, margin_threshold: float = 0.25) -> float:
    """Compile (or cache-load) the jitted predict program for every batch
    bucket the server can hit (serving.server.batch_buckets — the shared
    list, so a non-power-of-two max_batch is warmed too) — no live request
    ever stalls behind a 7B compile. Uses the model's own transform
    resolution. With `speculative`, also warms the batch-1 speculative
    program (the server's default serving mode). `margin_threshold` is
    accepted for callers that serve a non-default margin, but since r05 the
    margin is a traced operand of ONE compiled program (vla.py
    _jitted_predict_frames_speculative) — warming any margin warms them all,
    so no served margin can stall behind a fresh 7B compile. Returns seconds."""
    import numpy as np

    from bridgelang_tpu.serving.server import batch_buckets

    if unnorm_key is None:
        unnorm_key = next(iter(model.norm_stats))
    size = model.image_transform.towers[0].size
    frame = np.zeros((size, size, 3), np.uint8)

    buckets = batch_buckets(max_batch)
    t0 = time.time()
    for n in buckets:
        model.predict_action_batch(params, [frame] * n, ["warmup"] * n, unnorm_key=unnorm_key)
    if speculative:
        draft = np.zeros(model.get_action_dim(unnorm_key), np.int32)
        model.predict_action_speculative(params, frame, "warmup", draft, unnorm_key=unnorm_key,
                                         margin_threshold=margin_threshold)
    return time.time() - t0
