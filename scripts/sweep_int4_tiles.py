"""Honest tile sweep for the fused int4 kernel: which (block_n, kg) actually
streams fastest at decode shapes?

Methodology matches scripts/bench_quant_matmul.py: lax.scan over --layers
DISTINCT stacked weights (the decode workload — no HBM reuse to hide behind),
--repeats passes per jitted program, median of --samples fetch-timed runs.
An earlier sweep chained ONE weight and reported rates above the 820 GB/s
physical peak; its numbers (and the cost-model constants tuned against them)
are superseded by this tool.

Also probes a native jnp.int4 dot (XLA, no kernel) as a baseline: if XLA ever
learns to stream packed int4 natively, the Pallas kernel is obsolete.

  python scripts/sweep_int4_tiles.py [--shape 13b_gateup] [--a8 true]
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
class SweepConfig:
    shape: str = "all"  # a key of SHAPES, or "all"
    a8: bool = True
    m: int = 1  # pre-pad decode rows (the kernel pads to its sublane minimum)
    block_m: int = 0  # 0 = one m-block of the padded m; else tile rows by this
    group: int = 128  # pack-time scale-group size (256 = the serving default)
    layers: int = 40
    repeats: int = 8
    samples: int = 5
    # <0 = measure the relay RTT at capture time (varies 24-37 ms by day).
    # n_mm here is large (320), so the per-matmul sensitivity is small, but
    # a measured value keeps the absolute ms comparable across days.
    rtt_s: float = -1.0
    max_combos: int = 24
    native_int4: bool = True  # also probe the jnp.int4 XLA dot


SHAPES = {
    "7b_attn": (4096, 4096),
    "7b_gateup": (4096, 11008),
    "7b_down": (11008, 4096),
    "13b_attn": (5120, 5120),
    "13b_gateup": (5120, 13824),
    "13b_down": (13824, 5120),
}


def main(cfg: SweepConfig) -> None:
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.ops.int4_matmul import (
        _VMEM_BUDGET,
        _choose_tiles,
        _divisors,
        _int4_2d,
        _tile_vmem_bytes,
    )
    from bridgelang_tpu.ops.quant import _quantize4_2d
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    n_mm = cfg.layers * cfg.repeats
    rng = np.random.default_rng(0)

    if cfg.rtt_s < 0:
        tiny = jnp.zeros((8,), jnp.float32)
        triv = jax.jit(lambda t: t + 1.0)
        np.asarray(triv(tiny))
        rtts = []
        for _ in range(15):
            t0 = time.perf_counter()
            np.asarray(triv(tiny))
            rtts.append(time.perf_counter() - t0)
        cfg.rtt_s = float(np.min(rtts))
        print(f"[sweep] measured relay RTT: {cfg.rtt_s*1e3:.1f} ms", flush=True)

    def timed(fn, *args):
        np.asarray(fn(*args))
        times = []
        for _ in range(cfg.samples):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - t0)
        return (float(np.median(times)) - cfg.rtt_s) / n_mm

    names = list(SHAPES) if cfg.shape == "all" else [cfg.shape]
    for name in names:
        K, N = SHAPES[name]
        n_g = K // cfg.group
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=cfg.group)
        q4_l = jnp.asarray(np.broadcast_to(np.asarray(q4), (cfg.layers,) + q4.shape).copy())
        s4_l = jnp.asarray(np.broadcast_to(np.asarray(s4), (cfg.layers,) + s4.shape).copy())

        min_sub = 8  # matches _int4_route's block minimum
        m_pad = max(cfg.m, min_sub)
        bm_tile = cfg.block_m or m_pad
        m_pad = -(-m_pad // bm_tile) * bm_tile  # block_m must divide the grid rows
        if cfg.a8:
            x0 = jnp.asarray(rng.integers(-127, 128, size=(m_pad, K)), jnp.int8)
        else:
            x0 = jnp.asarray(rng.normal(size=(m_pad, K)), jnp.bfloat16)

        def harness(block_n, kg, block_m=bm_tile):
            @jax.jit
            def run(x, pl_, sl_):
                def body(y, args):
                    p_i, s_i = args
                    out = _int4_2d(y, p_i, s_i, block_m, block_n, kg, cfg.a8, group=cfg.group)
                    # scalar feedback keeps the chain dependent without
                    # changing y's values (out * 0 cannot be const-folded:
                    # out is data-dependent)
                    bump = (out[:1, :1] * 0).astype(y.dtype)
                    return y + bump, None

                def rep(_, y):
                    y, _unused = jax.lax.scan(body, y, (pl_, sl_))
                    return y

                return jax.lax.fori_loop(0, cfg.repeats, rep, x)

            return run

        # enumerate the same space the chooser searches
        combos = []
        out_item = 4 if cfg.a8 else 2
        for bn in _divisors(N // 2, 128):
            for kg in _divisors(n_g, 1):
                tile_b = kg * cfg.group * bn
                # the chooser's own VMEM model — sharing it keeps the sweep
                # enumerating exactly the space production can pick from
                if (_tile_vmem_bytes(bm_tile, bn, kg, out_item, cfg.a8, group=cfg.group) > _VMEM_BUDGET
                        or tile_b < 64 * 1024):
                    continue
                combos.append((bn, kg, tile_b))
        combos.sort(key=lambda c: c[2])
        if len(combos) > cfg.max_combos:  # thin evenly, keep extremes
            idx = np.linspace(0, len(combos) - 1, cfg.max_combos).round().astype(int)
            combos = [combos[i] for i in sorted(set(idx))]

        pick = _choose_tiles(m_pad, N // 2, n_g, min_sub, 4 if cfg.a8 else 2, cfg.a8, group=cfg.group)
        print(f"=== {name} K={K} N={N} a8={cfg.a8} group={cfg.group} ({len(combos)} combos; "
              f"chooser pick: bn={pick[1]} kg={pick[2]}) ===", flush=True)
        best = None
        for bn, kg, tile_b in combos:
            steps = (N // 2 // bn) * (n_g // kg)
            try:
                dt = timed(harness(bn, kg), x0, q4_l, s4_l)
            except Exception as e:  # Mosaic tiling rejections etc.
                print(f"  bn={bn:5d} kg={kg:3d} FAILED: {type(e).__name__}", flush=True)
                continue
            bw = (K * N / 2) / dt / 1e9
            tag = " <= chooser" if (bn, kg) == (pick[1], pick[2]) else ""
            if best is None or dt < best[0]:
                best = (dt, bn, kg)
                tag += " *best"
            print(f"  bn={bn:5d} kg={kg:3d} tile={tile_b/2**20:4.2f}MB steps={steps:4d} "
                  f"{dt*1e3:7.3f} ms {bw:6.0f} GB/s packed{tag}", flush=True)
        if best:
            print(f"  BEST: bn={best[1]} kg={best[2]} {best[0]*1e3:.3f} ms "
                  f"({(K*N/2)/best[0]/1e9:.0f} GB/s packed)", flush=True)

        if cfg.native_int4:
            # XLA-native int4 baseline: same honest scan over stacked jnp.int4
            codes = np.asarray(rng.integers(-8, 8, size=(K, N)), np.int8)
            w4_l = jnp.asarray(np.broadcast_to(codes, (cfg.layers,) + codes.shape).copy()).astype(jnp.int4)
            xq = x0 if cfg.a8 else jnp.asarray(rng.integers(-127, 128, size=(m_pad, K)), jnp.int8)

            @jax.jit
            def run_native(x, wl):
                def body(y, w4):
                    out = jax.lax.dot_general(
                        y, w4, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    # int32 output: `* 0` would be algebraically folded and
                    # the whole dot DCEd (ints have no NaN semantics) — the
                    # sign shift keeps the chain data-dependent.
                    return y + (out[:1, :1] >> 31).astype(y.dtype), None

                def rep(_, y):
                    y, _unused = jax.lax.scan(body, y, wl)
                    return y

                return jax.lax.fori_loop(0, cfg.repeats, rep, x)

            try:
                dt = timed(run_native, xq, w4_l)
                print(f"  native jnp.int4 dot: {dt*1e3:.3f} ms "
                      f"({(K*N/2)/dt/1e9:.0f} GB/s packed-equivalent)", flush=True)
            except Exception as e:
                print(f"  native jnp.int4 dot: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main(parse_cli(SweepConfig))
