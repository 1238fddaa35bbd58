"""Quantized-matmul microbenchmark: packed-int4 kernels vs the int8 dot.

Times the three decode-shape matmul modes at flagship geometry (M=16 rows —
the LM-head/projection batch during decode) and prints achieved HBM
bandwidth per mode:

  * ``int4v2-bf16`` — `ops/int4_matmul.matmul_int4` (v2 out-paired layout,
    two bf16 MXU dots recover both nibbles without VPU unpacking)
  * ``int4v2-a8``   — `ops/int4_matmul.matmul_int4_a8` (w4a8: per-token int8
    activation quant, int8xint8->int32 dots, exact nibble recovery)
  * ``int8``        — XLA weight-only int8 dot (the serving default)

This is the decision tool behind the int8-vs-int4 serving-mode choice
(README "Measured performance"; reference analogue: the load_in_8bit /
load_in_4bit trade at vla-scripts/extern/verify_openvla.py:49,60).

Methodology: each mode scans over ``--layers`` DISTINCT stacked weights
(exactly the decode workload — every step streams a different layer's
weights from HBM), repeated ``--repeats`` times inside one jitted program so
the relay round trip (~27 ms, measured in bench.py) amortizes; the reported
time is the median of ``--samples`` fetch-timed runs. An earlier version
chained one weight 100x — reuse let the measurement float above the 820 GB/s
physical peak (5.7 TB/s "measured"), so reuse-chain numbers are not
trustworthy and were replaced by this design.

  python scripts/bench_quant_matmul.py [--m 16] [--layers 40] [--repeats 8]
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class QuantBenchConfig:
    m: int = 16  # decode-rows per matmul (B * new-token count)
    layers: int = 40  # distinct stacked weights scanned per repeat
    repeats: int = 8  # scan passes per jitted program
    samples: int = 5  # fetch-timed runs; median reported
    rtt_s: float = 0.027  # relay round trip to subtract (bench.py measures it)
    group: int = 128  # int4 quantization group size


SHAPES = {
    "7b wq/wk/wv/wo": (4096, 4096),
    "7b w_gate/w_up": (4096, 11008),
    "7b w_down": (11008, 4096),
    "13b wq/wk/wv/wo": (5120, 5120),
    "13b w_gate/w_up": (5120, 13824),
    "13b w_down": (13824, 5120),
}


def main(cfg: QuantBenchConfig) -> None:
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from bridgelang_tpu.ops.int4_matmul import matmul_int4, matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    n_mm = cfg.layers * cfg.repeats

    def timed(fn, *args):
        np.asarray(fn(*args))  # compile + warm
        times = []
        for _ in range(cfg.samples):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - t0)
        return (float(np.median(times)) - cfg.rtt_s) / n_mm

    def scanned(one_matmul):
        # Scan over DISTINCT stacked weights (the decode workload: every step
        # streams a different layer from HBM — no reuse to hide behind), with
        # a scalar feedback so XLA cannot parallelize or elide iterations.
        @jax.jit
        def run(x, *stacked):
            def body(y, wargs):
                out = one_matmul(y, *wargs)
                return (y + out[:1, :1] * 1e-6).astype(jnp.bfloat16), None

            def rep(_, y):
                y, _unused = jax.lax.scan(body, y, stacked)
                return y

            return jax.lax.fori_loop(0, cfg.repeats, rep, x)

        return run

    rng = np.random.default_rng(0)
    for name, (K, N) in SHAPES.items():
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=cfg.group)
        scale8 = np.abs(w).max(0) / 127.0
        w8 = np.clip(np.round(w / scale8), -127, 127).astype(np.int8)
        x0 = jnp.asarray(rng.normal(size=(cfg.m, K)), jnp.bfloat16)

        ref = np.asarray(x0, np.float32) @ np.asarray(dequant_int4(q4, s4, jnp.float32))
        got = np.asarray(matmul_int4(x0, q4, s4), np.float32)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)

        # L distinct layers: same quantized values, per-layer jittered scales
        # (cheap to build; the bytes streamed are what the timing measures).
        def stack(a):
            a = np.asarray(a)
            jit_s = (1.0 + 1e-3 * np.arange(cfg.layers, dtype=np.float32))
            out = np.broadcast_to(a, (cfg.layers,) + a.shape).copy()
            if a.dtype in (np.float32, np.float16):
                out *= jit_s.reshape((-1,) + (1,) * a.ndim)
            return jnp.asarray(out)

        q4_l, s4_l = stack(q4), stack(s4)
        w8_l = stack(w8)
        s8_l = stack(scale8.astype(np.float32))

        dt4 = timed(scanned(matmul_int4), x0, q4_l, s4_l)
        dta8 = timed(scanned(matmul_int4_a8), x0, q4_l, s4_l)
        dt8 = timed(
            scanned(lambda y, w_, s_: jnp.dot(y, w_.astype(jnp.bfloat16)) * s_.astype(jnp.bfloat16)),
            x0, w8_l, s8_l,
        )
        bw4 = (K * N / 2) / dt4 / 1e9
        bwa8 = (K * N / 2) / dta8 / 1e9
        bw8 = (K * N) / dt8 / 1e9
        print(
            f"{name} [{K}x{N}]: int4v2-bf16 {dt4*1e3:.3f} ms ({bw4:.0f} GB/s packed)  "
            f"int4v2-a8 {dta8*1e3:.3f} ms ({bwa8:.0f} GB/s packed)  "
            f"int8 {dt8*1e3:.3f} ms ({bw8:.0f} GB/s)  rel_err={rel:.2e}  "
            f"a8_speedup_vs_int8={dt8/dta8:.2f}x"
        )


if __name__ == "__main__":
    main(parse_cli(QuantBenchConfig))
