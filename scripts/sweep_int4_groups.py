"""Measure the int4 pack-time group-size lever (VERDICT r03 item 7).

README calls pack-time group size "the only remaining lever" on w4a8 prefill
speed — the per-group scale fixups (~10 VPU ops per group x output element)
scale as 1/group, but bigger groups share one absmax scale across more input
rows, costing quantization quality. This script measures BOTH sides on the
real chip and writes the table recorded in docs/int4.md:

  speed    per-matmul time of matmul_int4_a8 at prefill M (and decode M=16)
           over the flagship shapes, scanning DISTINCT stacked weights (the
           honest methodology of scripts/bench_quant_matmul.py — reuse
           chains overstate; see CLAUDE.md).
  quality  per-matmul relative dequantization error ||deq(W_g) - W|| / ||W||
           at each group size over the flagship shapes, plus the end-to-end
           action check (greedy tokens + max |Δaction| vs bf16 on a
           depth-trimmed full-dim flagship). MEASURED CAVEAT (first run,
           docs/int4.md): random-weight token agreement is UNINFORMATIVE —
           random logits are knife-edge so tokens flip on sub-quantization
           noise, while every flipped token still lands in the same clipped
           action bin (max |Δaction| = 0). The rel-err column is the real
           quality signal until real weights are staged.

  python scripts/sweep_int4_groups.py [--groups 128,256,512] [--frames 12]
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
class GroupSweepConfig:
    groups: str = "128,256,512"
    frames: int = 12
    m_prefill: int = 560  # serving prefill rows: 48-token prompt bucket + 512 patches
    m_decode: int = 16
    layers: int = 16  # distinct stacked weights per scan
    repeats: int = 4
    samples: int = 5
    # Relay round trip subtracted from every synchronous fetch. The RTT
    # varies 24-37 ms BY DAY (CLAUDE.md), so the default (<0) MEASURES it at
    # capture time the way bench.py does — a stale constant biases the small
    # decode numbers by up to ~3x. Pass a value only to reproduce an old run.
    rtt_s: float = -1.0
    vit_depth: int = 8
    llm_layers: int = 8  # full-dim, depth-trimmed: quality is per-matmul


SHAPES = {
    "7b wq/wk/wv/wo": (4096, 4096),
    "7b w_gate/w_up": (4096, 11008),
    "7b w_down": (11008, 4096),
}


def _measure_rtt() -> float:
    """Per-capture relay RTT: trivial jitted op + scalar fetch, MIN of 15 —
    this value is SUBTRACTED from fetch times, so it must estimate the floor
    (a p50 inflated by host contention or outage recovery can exceed the
    true per-fetch overhead and produce negative compute times)."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    np.asarray(triv(tiny))
    samples = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(triv(tiny))
        samples.append(time.perf_counter() - t0)
    return float(np.min(samples))


def _speed(cfg, groups):
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.ops.int4_matmul import matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d

    if cfg.rtt_s < 0:
        cfg.rtt_s = _measure_rtt()
        print(f"[sweep] measured relay RTT: {cfg.rtt_s*1e3:.1f} ms", flush=True)
    n_mm = cfg.layers * cfg.repeats

    def timed(fn, *args):
        np.asarray(fn(*args))
        times = []
        for _ in range(cfg.samples):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - t0)
        return (float(np.median(times)) - cfg.rtt_s) / n_mm

    def scanned(one_matmul):
        # Return a SCALAR: the first harness fetched the full [M, K] carry and
        # the relay transfer (~2.5 MB ≈ 60 ms, measured by
        # scripts/probe_int4_prefill.py) dominated the per-matmul number.
        # abs().sum() (not a slice) keeps every kernel invocation live without
        # letting XLA reassociate the reduction into the dot; bf16 *1e-6
        # feedback is fold-safe per the CLAUDE.md methodology notes.
        @jax.jit
        def run(x, *stacked):
            def body(y, wargs):
                out = one_matmul(y, *wargs)
                return (y + out[:1, :1] * 1e-6).astype(jnp.bfloat16), None

            def rep(_, y):
                y, _unused = jax.lax.scan(body, y, stacked)
                return y

            y = jax.lax.fori_loop(0, cfg.repeats, rep, x)
            return jnp.abs(y.astype(jnp.float32)).sum()

        return run

    from bridgelang_tpu.ops.int4_matmul import matmul_int4

    rng = np.random.default_rng(0)
    rows = {}
    for name, (K, N) in SHAPES.items():
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        for m_label, m in (("prefill", cfg.m_prefill), ("decode", cfg.m_decode)):
            x0 = jnp.asarray(rng.normal(size=(m, K)), jnp.bfloat16)
            for g in groups:
                if K % g:
                    print(f"[speed] {name} group={g}: skipped (K={K} % {g} != 0)", flush=True)
                    rows[(name, m_label, g)] = None
                    continue
                q4, s4 = _quantize4_2d(jnp.asarray(w), group=g)

                def stack(a):
                    a = np.asarray(a)
                    return jnp.asarray(np.broadcast_to(a, (cfg.layers,) + a.shape).copy())

                if m_label == "prefill":  # rel err is M-independent; print once
                    from bridgelang_tpu.ops.quant import dequant_int4

                    deq = np.asarray(dequant_int4(q4, s4, jnp.float32))
                    rel = float(np.linalg.norm(deq - w) / np.linalg.norm(w))
                    print(f"[quality] {name} group={g}: rel dequant err {rel:.4f}", flush=True)
                q4_l, s4_l = stack(q4), stack(s4)
                dt = timed(scanned(matmul_int4_a8), x0, q4_l, s4_l)
                # the bf16-dot kernel at the same shape: if it wins at
                # prefill M, the serving int4 path needs a min-chunk a8
                # gate like the int8 one (llama.py::proj)
                dt_bf = timed(scanned(matmul_int4), x0, q4_l, s4_l)
                rows[(name, m_label, g)] = (dt, dt_bf)
                print(f"[speed] {name} [{K}x{N}] {m_label} M={m} group={g}: "
                      f"a8 {dt*1e3:.3f} ms/matmul ({(K*N/2)/dt/1e9:.0f} GB/s packed) | "
                      f"bf16-dot {dt_bf*1e3:.3f} ms ({(K*N/2)/dt_bf/1e9:.0f} GB/s)",
                      flush=True)
    return rows


def _quality(cfg, groups):
    import dataclasses

    import jax
    import jax.numpy as jnp

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", Path(__file__).parent.parent / "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from bridgelang_tpu.ops.quant import quantize_llm_int4

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer

    model = graft._flagship_model(llm_layers=cfg.llm_layers, vit_depth=cfg.vit_depth)
    model.tokenizer = get_tokenizer(None)
    model.cfg = dataclasses.replace(model.cfg, llm=dataclasses.replace(model.cfg.llm, w8a8=True))
    params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8) for _ in range(cfg.frames)]
    unnorm_key = next(iter(model.norm_stats))

    def tokens_actions(p):
        toks, acts = [], []
        for f in frames:
            a, t = model.predict_action_speculative(
                p, f, "pick up the red block", np.zeros(7, np.int32), unnorm_key=unnorm_key)
            toks.append(np.asarray(t))
            acts.append(np.asarray(a))
        return np.stack(toks), np.stack(acts)

    t_ref, a_ref = tokens_actions(params)
    out = {}
    for g in groups:
        if any(int(np.asarray(v).shape[-2]) % g for n, v in params["llm"]["layers"].items()
               if not n.endswith("_scale4") and hasattr(v, "shape") and v.ndim == 3):
            print(f"[quality] group={g}: skipped (not all layer K divisible)", flush=True)
            continue
        p4 = dict(params)
        p4["llm"] = quantize_llm_int4(params["llm"], group=g)
        t_g, a_g = tokens_actions(p4)
        agree = float((t_g == t_ref).mean())
        max_da = float(np.abs(a_g - a_ref).max())
        out[g] = (agree, max_da)
        print(f"[quality] group={g}: token agreement {agree*100:.1f}% "
              f"({cfg.frames} frames x 7 dims), max |Δaction| = {max_da:.4g} "
              f"vs bf16 ({cfg.llm_layers}-layer full-dim, random weights)", flush=True)
        del p4
    return out


def main(cfg: GroupSweepConfig):
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    groups = [int(g) for g in cfg.groups.split(",")]
    speed = _speed(cfg, groups)
    quality = _quality(cfg, groups)

    print("\n| group | a8 prefill ms (wq/gate/down) | bf16 prefill ms | a8 decode ms | token agree | max dA |")
    print("|---|---|---|---|---|---|")
    for g in groups:
        def fmt(m_label, idx):
            vals = [speed[(n, m_label, g)] for n in SHAPES]
            return " / ".join("-" if v is None else f"{v[idx]*1e3:.2f}" for v in vals)
        agree, max_da = quality.get(g, (float("nan"), float("nan")))
        print(f"| {g} | {fmt('prefill', 0)} | {fmt('prefill', 1)} | {fmt('decode', 0)} | "
              f"{agree*100:.1f}% | {max_da:.3g} |")


if __name__ == "__main__":
    main(parse_cli(GroupSweepConfig))
