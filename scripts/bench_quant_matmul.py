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
load_in_4bit trade at vla-scripts/extern/verify_openvla.py:49,60). Each
mode runs a 100-deep dependent chain inside one jit so the relay round trip
(~27 ms, measured in bench.py) amortizes to noise; the per-matmul time
subtracts it explicitly.

  python scripts/bench_quant_matmul.py [--m 16] [--chain 100] [--rtt_s 0.027]
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
    chain: int = 100  # dependent matmuls per jitted program
    rtt_s: float = 0.027  # relay round trip to subtract (bench.py measures it)
    group: int = 128  # int4 quantization group size


SHAPES = {
    "7b wq/wk/wv/wo": (4096, 4096),
    "7b w_gate/w_up": (4096, 11008),
    "7b w_down": (11008, 4096),
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

    def timed(fn, *args):
        np.asarray(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        t1 = time.perf_counter()
        return (t1 - t0 - cfg.rtt_s) / cfg.chain

    def chained(one_matmul):
        # A dependent chain: each step feeds a scalar of the output back into
        # the activations so XLA cannot parallelize or elide iterations.
        @jax.jit
        def run(x, *wargs):
            y = x
            for _ in range(cfg.chain):
                out = one_matmul(y, *wargs)
                y = (y + out[:1, :1] * 1e-6).astype(jnp.bfloat16)
            return y

        return run

    rng = np.random.default_rng(0)
    for name, (K, N) in SHAPES.items():
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=cfg.group)
        scale8 = np.abs(w).max(0) / 127.0
        w8 = jnp.asarray(np.clip(np.round(w / scale8), -127, 127).astype(np.int8))
        s8 = jnp.asarray(scale8.astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(cfg.m, K)), jnp.bfloat16)

        ref = np.asarray(x0, np.float32) @ np.asarray(dequant_int4(q4, s4, jnp.float32))
        got = np.asarray(matmul_int4(x0, q4, s4), np.float32)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)

        dt4 = timed(chained(matmul_int4), x0, q4, s4)
        dta8 = timed(chained(matmul_int4_a8), x0, q4, s4)
        dt8 = timed(
            chained(lambda y, w_, s_: jnp.dot(y, w_.astype(jnp.bfloat16)) * s_.astype(jnp.bfloat16)),
            x0, w8, s8,
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
