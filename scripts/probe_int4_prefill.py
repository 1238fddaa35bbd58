"""Cross-check the int4 prefill anomaly (round 4).

sweep_int4_groups measured w4a8 prefill (M=560, scanned distinct stacked
weights) at 2-10 ms/matmul — rates that would put a 7B int4 prefill at
hundreds of ms, while bench.py 7b4 measured 127 ms per WHOLE predict call.
This probe times the SAME matmul three ways at serving-exact shapes to
locate the discrepancy:

  a. one matmul, isolated jit, fetch-timed (what serving's prefill does once
     per layer, no scan slicing in the way)
  b. scanned over distinct stacked weights (the sweep harness)
  c. dequant-then-dot (transient bf16 [K, N] per layer) — the candidate
     prefill route if the kernel really is this slow at prefill M

plus the int8 w8a8 dot at the same shape for a floor reference.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from bridgelang_tpu.ops.int4_matmul import matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4, quantize_activations_per_token

    rng = np.random.default_rng(0)
    # Measure the relay RTT per capture (varies 24-37 ms by day, CLAUDE.md);
    # a stale constant biases these small per-call numbers materially.
    tiny = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    np.asarray(triv(tiny))
    _rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(triv(tiny))
        _rtts.append(time.perf_counter() - t0)
    RTT = float(np.min(_rtts))
    print(f"[probe] measured relay RTT: {RTT*1e3:.1f} ms", flush=True)

    def fetch_time(fn, *args, reps=12):
        # fn must return a SCALAR: fetching the full [1, M, N] output moves
        # multiple MB over the relay (~40 MB/s measured) and swamps the
        # kernel time — the original source of the "prefill anomaly".
        np.asarray(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) - RTT

    for (K, N) in ((4096, 11008), (11008, 4096), (4096, 4096)):
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
        scale8 = np.abs(w).max(0) / 127.0
        w8 = jnp.asarray(np.clip(np.round(w / scale8), -127, 127).astype(np.int8))
        s8 = jnp.asarray(scale8.astype(np.float32))
        for M in (304, 560):
            x = jnp.asarray(rng.normal(size=(1, M, K)), jnp.bfloat16)

            def scal(out):
                # abs-sum (not a slice): keeps the whole computation live and
                # blocks XLA from narrowing a dot to the sliced column
                return jnp.abs(out.astype(jnp.float32)).sum()

            # a) isolated
            iso = jax.jit(lambda a, b, c: scal(matmul_int4_a8(a, b, c)))
            t_iso = fetch_time(iso, x, q4, s4)

            # b) scanned over 8 distinct stacked weights
            L = 8
            q4_l = jnp.asarray(np.broadcast_to(np.asarray(q4), (L,) + q4.shape).copy())
            s4_l = jnp.asarray(np.broadcast_to(np.asarray(s4), (L,) + s4.shape).copy())

            @jax.jit
            def scanned(a, ql, sl):
                def body(y, wargs):
                    out = matmul_int4_a8(y, *wargs)
                    return (y + out[:, :1, :1] * 1e-6).astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, a, (ql, sl))
                return scal(y)

            t_scan = fetch_time(scanned, x, q4_l, s4_l) / L

            # c) dequant-then-dot (one transient bf16 [K, N])
            @jax.jit
            def deq_dot(a, q, s):
                wbf = dequant_int4(q, s, jnp.bfloat16)
                return scal(a @ wbf)

            t_deq = fetch_time(deq_dot, x, q4, s4)

            # int8 w8a8 floor
            @jax.jit
            def w8a8(a, wq, ws):
                qa, xs = quantize_activations_per_token(a)
                acc = jax.lax.dot_general(qa, wq, (((2,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                return scal((acc.astype(jnp.float32) * xs * ws).astype(a.dtype))

            t_8 = fetch_time(w8a8, x, w8, s8)

            print(f"[{K}x{N}] M={M}: kernel-iso {t_iso*1e3:.2f} ms | kernel-scanned "
                  f"{t_scan*1e3:.2f} ms | dequant+dot {t_deq*1e3:.2f} ms | int8-w8a8 "
                  f"{t_8*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
