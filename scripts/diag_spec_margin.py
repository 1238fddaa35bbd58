"""Diagnose replayed-speculative acceptance truncation by the margin gate.

Context (r05): the closedloop bench's replayed-trajectory mode injects accept
counts k_t via crafted drafts, but runs at the CALIBRATED margin, while the
latency(k) curve that predicts its rate is measured at margin 0.0
(bench.py:352). On random weights the gate may reject crafted-matching
positions whose top-1/top-2 gap falls under the calibrated threshold,
truncating the injected run — this script measures true accepted counts vs
injected at a sweep of margins, directly (no REST), plus per-call latency.

Usage: python scripts/diag_spec_margin.py [--ticks 24]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(ticks: int = 24):
    import jax.numpy as jnp

    import bench
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    norm_stats = bench.BENCH_NORM_STATS
    model, params = bench._build_flagship_int8(norm_stats)
    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer

    model.tokenizer = get_tokenizer(None)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(256, 256, 3)).astype(np.int16)

    def frame(t):
        drift = (10 * np.sin(t / 7.0)).astype(np.int16)
        noise = rng.integers(-3, 4, size=base.shape).astype(np.int16)
        return np.clip(base + drift + noise, 0, 255).astype(np.uint8)

    stats = norm_stats["bridge_orig"]["action"]
    q01 = jnp.asarray(stats["q01"], jnp.float32)
    q99 = jnp.asarray(stats["q99"], jnp.float32)
    smask = jnp.asarray(stats["mask"])
    ids, mask = model.pad_prompt([model.prepare_prompt_ids("push the block")])
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

    frames = [bench._np_center_crop_resize(frame(100 + t)) for t in range(ticks)]
    tok_stream = bench._smooth_stream_tokens(0.30, 1.5, 3.0, 0.5, n_ticks=ticks + 10, seed=17)
    k_stream = bench._accept_stream(tok_stream, "hybrid")

    # Record greedy tokens at margin 0 (greedy-equivalent output).
    fn0 = model._jitted_predict_frames_speculative(0.0, return_accept_count=True)
    greedy = []
    for f in frames:
        _, toks, _ = fn0(params, ids_d, mask_d, jnp.asarray(f[None]), q01, q99, smask,
                         jnp.zeros((1, 7), jnp.int32))
        greedy.append(np.asarray(toks)[0].astype(np.int32))

    cal = model.calibrate_speculative_margin(params, frames[:3], "push the block",
                                             unnorm_key="bridge_orig")
    print(f"[diag] calibrated margin: {cal}")

    for margin in (0.0, 0.02, 0.05, cal, 0.25):
        fn = model._jitted_predict_frames_speculative(float(margin), return_accept_count=True)
        true_k, lat = [], []
        for t in range(ticks):
            g = greedy[t]
            k = int(k_stream[t])
            draft = g.copy()
            if k < 7:
                draft[k:] = g[k:] + 1
            t0 = time.perf_counter()
            _, toks, acc = fn(params, ids_d, mask_d, jnp.asarray(frames[t][None]),
                              q01, q99, smask, jnp.asarray(draft[None]))
            acc = int(np.asarray(acc)[0])  # sync fetch
            lat.append(time.perf_counter() - t0)
            true_k.append(acc)
            if not np.array_equal(np.asarray(toks)[0], g):
                print(f"[diag]   WARNING tick {t}: output tokens != greedy at margin {margin}")
        inj = np.minimum(k_stream[:ticks], 7)
        print(f"[diag] margin={margin}: injected mean k={np.mean(inj):.2f} "
              f"TRUE mean k={np.mean(true_k):.2f} p50 lat={np.percentile(lat, 50)*1e3:.0f}ms "
              f"-> {1.0/np.percentile(lat, 50):.2f} a/s direct")


if __name__ == "__main__":
    t = 24
    if "--ticks" in sys.argv:
        t = int(sys.argv[sys.argv.index("--ticks") + 1])
    main(t)
