"""Per-call REST-vs-direct overhead probe for the serving paths.

Times, on the real chip: (a) direct predict_action_batch (the sequential
serving path), (b) direct predict_action_speculative with a high-acceptance
crafted draft, (c) REST /act without draft (micro-batched path), (d) REST
/act with the same crafted draft (bypass path). Isolates where the closed
loop's speculative ticks spend the extra ~40 ms the latency(k) curve does
not predict (r05 investigation).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def p50(xs):
    return float(np.percentile(xs, 50)) * 1e3


def main(n: int = 15):
    import bench
    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    model, params = bench._build_flagship_int8(bench.BENCH_NORM_STATS)
    model.tokenizer = get_tokenizer(None)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8) for _ in range(n)]

    # Warm + record greedy tokens per frame at margin 0.
    greedy = []
    for f in frames:
        _, toks = model.predict_action_speculative(params, f, "push the block",
                                                   np.zeros(7, np.int32),
                                                   unnorm_key="bridge_orig",
                                                   margin_threshold=0.0)
        greedy.append(np.asarray(toks, np.int32))
    model.predict_action(params, frames[0], "push the block", unnorm_key="bridge_orig")

    lat = []
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        model.predict_action(params, f, "push the block", unnorm_key="bridge_orig")
        lat.append(time.perf_counter() - t0)
    print(f"[diag] direct sequential (predict_action):    p50={p50(lat):.0f}ms")

    lat = []
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        model.predict_action_speculative(params, f, "push the block", greedy[i],
                                         unnorm_key="bridge_orig", margin_threshold=0.0)
        lat.append(time.perf_counter() - t0)
    print(f"[diag] direct speculative (self-draft, m=0):  p50={p50(lat):.0f}ms")

    server = VLAServer(model, params, default_unnorm_key="bridge_orig",
                       speculative_default=False, speculative_margin=0.0)
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        for f in frames[:3]:
            client_act("127.0.0.1", port, f, "push the block")
            client_act("127.0.0.1", port, f, "push the block",
                       draft_tokens=np.zeros(7, np.int32), return_tokens=True)
        lat = []
        for f in frames:
            t0 = time.perf_counter()
            client_act("127.0.0.1", port, f, "push the block")
            lat.append(time.perf_counter() - t0)
        print(f"[diag] REST sequential (micro-batch path):    p50={p50(lat):.0f}ms")
        lat = []
        for i, f in enumerate(frames):
            t0 = time.perf_counter()
            client_act("127.0.0.1", port, f, "push the block",
                       draft_tokens=greedy[i], return_tokens=True)
            lat.append(time.perf_counter() - t0)
        print(f"[diag] REST speculative bypass (self-draft):  p50={p50(lat):.0f}ms")
    finally:
        httpd.shutdown()


if __name__ == "__main__":
    main()
