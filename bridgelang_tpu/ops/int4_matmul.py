"""Fused packed-int4 weight-only matmul (Pallas TPU kernel).

Why a kernel at all: XLA cannot fuse 4-bit unpacking into a dot — every
XLA-level formulation (dequant-then-dot, s4-bitcast, group-reassociated
partial sums) was measured to materialize full-width weights in HBM, running
at 13–28 GB/s effective against int8's 444 GB/s at 13B MLP dims. This kernel
streams the PACKED bytes from HBM to VMEM, so HBM traffic is the int4
bytes — the whole point of the capacity mode (13B on one 16 GB chip;
counterpart of the reference's bitsandbytes 4-bit,
vla-scripts/extern/verify_openvla.py:60).

Layout contract (ops/quant.py::pack_int4, "out-paired-lobias/v2"): for a
weight [K, N], byte [r, c] holds code[r, c] + 8 (biased to [0, 15]) in the
LOW nibble and code[r, N//2 + c] (signed) in the HIGH nibble. Both nibbles
of a byte therefore multiply the SAME activation row, which lets the kernel
skip per-element unpacking entirely: the byte value as a signed int8 IS
16*hi + (lo + 8), so

    y_all  = x @ bytes          ( = 16*y_hi + y_lo + 8*s,  s = rowsum(x) )
    y_lo_b = x @ (bytes & 0xF)  ( = y_lo + 8*s )
    y_hi   = (y_all - y_lo_b) / 16          (exact: integers in f32)
    y_lo   = y_lo_b - 8*s

— two MXU dots of raw/masked bytes plus two cheap linear fixups replace the
shift-heavy VPU unpack of the previous split-half layout. The bytes convert
to bf16 exactly (|values| <= 255 < 2^8 mantissa). Honest streaming rates
(scan over DISTINCT stacked weights, scripts/sweep_int4_tiles.py; reuse-
chain microbenches overstate by >2x and are not trusted here): 460-720 GB/s
of packed bytes at the tuned 13B decode tiles vs int8's ~650-770 of full
bytes — int4 decode moves half the bytes at a somewhat lower rate, which is
why it is a CAPACITY mode (13B runs at all), not a speed mode (7B end-to-end
measured 7.87 a/s int4 vs 8.8 int8, bench.py 7b4). At prefill M the w4a8
path is bound by the per-group scale fixups (~10 VPU ops per group x output
element — inherent to group-128 quantization, not tiling).
Scales are per (128-input-row group, out-channel);
since a grid step's reduction tile is exactly one group, scales apply to
the f32 PARTIAL sums (exact reassociation: x @ (c * s) == (x @ c) * s when
s is constant over the tile's rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # default input rows per scale group (pack-time default; the
# kernel derives the actual group size from the scales shape, so pack-time
# group=256/512 — the only lever on the per-group w4a8 prefill fixup cost,
# see docs/int4.md — runs through the same kernel)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, p_ref, s_lo_ref, s_hi_ref, o_lo_ref, o_hi_ref, acc_lo_ref, acc_hi_ref, *, n_go: int, kg: int, out_dtype, fullx: bool, group: int = GROUP):
    # Scales arrive as a free [G, 1, N] view with the group rows AND column
    # half selected by the BlockSpec index maps — block (kg, 1, block_n)
    # satisfies Mosaic tiling (middle dim equals the overall dim), and an
    # in-kernel dynamic sublane load of bf16 rows would not ("index in
    # dimension 0 is a multiple of 4" failure).
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _zero():
        acc_lo_ref[:] = jnp.zeros_like(acc_lo_ref)
        acc_hi_ref[:] = jnp.zeros_like(acc_hi_ref)

    # bf16 holds the byte values (|v| <= 255) exactly. The low-nibble mask
    # uses the i32-word bitcast trick (see _kernel_a8) — Mosaic legalizes no
    # i8 vector bitwise ops, and the widen(i32)->mask->narrow alternative
    # measured as a VPU cap on the whole kernel.
    p8 = p_ref[:]
    if _interpret():
        p8_lo = (p8.astype(jnp.int32) & 0xF).astype(jnp.int8)
    else:
        p8_lo = pltpu.bitcast(pltpu.bitcast(p8, jnp.int32) & 0x0F0F0F0F, jnp.int8)
    all_bf = p8.astype(jnp.bfloat16)           # 16*hi + (lo + 8)
    lo_bf = p8_lo.astype(jnp.bfloat16)         # lo + 8
    # fullx: x is RESIDENT in VMEM ([block_m, K], index map pinned to 0) so
    # only the weight bytes DMA per grid step — the per-step x re-fetch
    # measured as a pipeline break at decode shapes (probe: 430 -> 553 GB/s).
    x = x_ref[:, pl.dslice(g * kg * group, kg * group)] if fullx else x_ref[:]
    # kg quantization groups per grid step (static unroll): one step streams
    # a (kg*GROUP, block_n) byte tile so the per-step DMA is big enough to
    # amortize grid overhead — 128-row tiles measured DMA-latency-bound at
    # 7B decode widths. Scales differ per group, so each group still gets
    # its own dot pair + scale-accumulate.
    acc_lo = jnp.zeros(acc_lo_ref.shape, jnp.float32)
    acc_hi = jnp.zeros(acc_hi_ref.shape, jnp.float32)
    for gi in range(kg):
        rows = slice(gi * group, (gi + 1) * group)
        xg = x[:, rows]
        y_all = jnp.dot(xg, all_bf[rows], preferred_element_type=jnp.float32)
        y_lo_b = jnp.dot(xg, lo_bf[rows], preferred_element_type=jnp.float32)
        s = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # per-group rowsum
        y_hi = (y_all - y_lo_b) * (1.0 / 16.0)
        y_lo = y_lo_b - 8.0 * s
        acc_lo = acc_lo + y_lo * s_lo_ref[gi].astype(jnp.float32)
        acc_hi = acc_hi + y_hi * s_hi_ref[gi].astype(jnp.float32)
    acc_lo_ref[:] += acc_lo
    acc_hi_ref[:] += acc_hi

    @pl.when(g == n_go - 1)
    def _emit():
        o_lo_ref[:] = acc_lo_ref[:].astype(out_dtype)
        o_hi_ref[:] = acc_hi_ref[:].astype(out_dtype)


def _kernel_a8(q_ref, p_ref, s_lo_ref, s_hi_ref, o_lo_ref, o_hi_ref, acc_lo_ref, acc_hi_ref, *, n_go: int, kg: int, fullx: bool, group: int = GROUP):
    """w4a8 variant: activations arrive pre-quantized to int8 (per-token
    scale applied OUTSIDE the kernel), so both dots ride the MXU's int8 path
    (394 TOPS on v5e, 2x the bf16 rate) and the nibble-recovery fixups are
    EXACT int32 arithmetic. At decode M the int8 dots also skip the two
    full-tile int8->bf16 converts the bf16 kernel pays per streamed byte."""
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _zero():
        acc_lo_ref[:] = jnp.zeros_like(acc_lo_ref)
        acc_hi_ref[:] = jnp.zeros_like(acc_hi_ref)

    q = None if fullx else q_ref[:]  # fullx: slice the resident ref per group
    p = p_ref[:]
    # Low-nibble extraction. Mosaic legalizes no i8 vector bitwise ops, and
    # the obvious widen(i32) -> mask -> narrow costs ~3 full-tile VPU passes
    # per streamed byte — measured as a hard ~330 GB/s-of-packed-bytes cap on
    # the whole kernel at every tile shape (scripts/sweep_int4_tiles.py),
    # while the DMA could do ~800. Instead, BITCAST the byte tile to i32
    # words (4 bytes/lane, rows pack 4-to-1 — pure reinterpretation, no data
    # movement) and mask all four bytes with ONE i32 AND: 0x0F clears each
    # byte's high bits regardless of byte order within the word, and the
    # masked bytes are their own unsigned low nibbles ([0, 15] fits int8).
    # ~12x less VPU work; the kernel becomes DMA-bound. Interpret mode (CPU
    # tests) keeps the portable widen path — bitcast_p is TPU-only.
    if _interpret():
        p_lo = (p.astype(jnp.int32) & 0xF).astype(jnp.int8)
    else:
        p_lo = pltpu.bitcast(pltpu.bitcast(p, jnp.int32) & 0x0F0F0F0F, jnp.int8)
    acc_lo = jnp.zeros(acc_lo_ref.shape, jnp.float32)
    acc_hi = jnp.zeros(acc_hi_ref.shape, jnp.float32)
    for gi in range(kg):  # static unroll — see _kernel
        rows = slice(gi * group, (gi + 1) * group)
        qg = q_ref[:, pl.dslice(g * kg * group + gi * group, group)] if fullx else q[:, rows]
        y_all = jnp.dot(qg, p[rows], preferred_element_type=jnp.int32)    # 16*y_hi + y_lo_b
        y_lo_b = jnp.dot(qg, p_lo[rows], preferred_element_type=jnp.int32)
        s = jnp.sum(qg.astype(jnp.int32), axis=1, keepdims=True)    # per-group rowsum
        y_hi = (y_all - y_lo_b) >> 4        # exact: the difference is 16*y_hi
        y_lo = y_lo_b - 8 * s
        acc_lo = acc_lo + y_lo.astype(jnp.float32) * s_lo_ref[gi].astype(jnp.float32)
        acc_hi = acc_hi + y_hi.astype(jnp.float32) * s_hi_ref[gi].astype(jnp.float32)
    acc_lo_ref[:] += acc_lo
    acc_hi_ref[:] += acc_hi

    @pl.when(g == n_go - 1)
    def _emit():
        o_lo_ref[:] = acc_lo_ref[:]
        o_hi_ref[:] = acc_hi_ref[:]


def _divisors(n: int, multiple: int) -> list:
    """Divisors of `n` that are multiples of `multiple`, ascending."""
    return [t for t in range(multiple, n + 1, multiple) if n % t == 0]


# Tile-chooser cost-model constants (v5e). Crude on purpose: the model only
# has to rank divisor choices, not predict wall time. Validated against the
# measured pathologies it exists to avoid (see _choose_tiles).
_HBM_BPS = 8.2e11          # paper peak HBM stream
_MXU_INT8_OPS = 3.94e14    # int8 MACs/s
_MXU_BF16_OPS = 1.97e14
_VPU_OPS = 7e12            # f32 elementwise
_STEP_OVERHEAD_S = 1.0e-6  # per-grid-step fixed cost (DMA issue, semaphores)
_VMEM_BUDGET = 12 * 1024 * 1024  # of ~16 MB/core: leave room for double-buffering slack


# Measured-best decode tiles (v5e, block_m=8, a8): keyed by
# (group, n_g, packed_w). From scripts/sweep_int4_tiles.py's honest
# scan-over-distinct-weights runs — the cost model ranks the rest of the
# space, but at the flagship shapes the measured winner beats the modeled
# one by 10-40% (the model cannot see Mosaic's pipeline behavior), so
# serving uses the table directly.
_TUNED_DECODE_TILES = {
    (128, 40, 2560): (2560, 5),    # 13B wq/wk/wv/wo [5120x5120] — 720 GB/s packed
    (128, 40, 6912): (2304, 20),   # 13B w_gate/w_up [5120x13824] — 477
    (128, 108, 2560): (2560, 18),  # 13B w_down [13824x5120] — 462
    (128, 32, 2048): (2048, 16),   # 7B wq/wk/wv/wo [4096x4096]
    (128, 32, 5504): (5504, 8),    # 7B w_gate/w_up [4096x11008] — 654
    (128, 86, 2048): (2048, 2),    # 7B w_down [11008x4096] — 580
    # group=256: tuned entries are a MEASURED END-TO-END DEAD END
    # (2026-08-19/20, don't retry). The isolated sweep's winners beat the
    # chooser's modeled picks by 4-20% per shape (sweep_int4_tiles
    # --group 256, 28.7 ms RTT), but installing them moved 7B serving
    # nowhere: sequential p50 8.22 a/s tuned vs 8.30/8.66 untuned across
    # three same-night captures (relay-condition spread), and the
    # speculative latency(k) curve landed inside the untuned runs' range
    # at every k. Single-weight microbench wins don't transfer to the
    # production layer scan, where seven interleaved weight streams set
    # the DMA pipeline. group=256 serving uses the chooser's modeled picks.
}


def _tile_vmem_bytes(block_m: int, block_n: int, kg: int, out_itemsize: int, a8: bool, group: int = GROUP) -> int:
    """Modeled VMEM bytes for one kernel step: double-buffered inputs, f32
    accumulators, buffered output halves, and the in-kernel stack (the byte
    tile materializes as bf16 twice in the bf16 kernel, once masked-i8 in a8,
    plus ~4 live [block_m, block_n] f32 intermediates — omitting these made
    the chooser pick tiles Mosaic rejects with a scoped-vmem OOM at prefill M;
    measured 16.39M actual vs 12M modeled).

    Shared with scripts/sweep_int4_tiles.py so the sweep enumerates EXACTLY
    the space the chooser searches — an inlined copy would silently drift the
    next time the kernel's stack accounting changes."""
    tile_b = kg * group * block_n              # packed weight bytes per step
    x_tile_b = block_m * kg * group * (1 if a8 else 2)
    stack_b = tile_b * (1 if a8 else 4) + 4 * 4 * block_m * block_n
    return (2 * tile_b + 2 * x_tile_b                    # double-buffered ins
            + 8 * block_m * block_n                      # f32 accumulators
            + 2 * 2 * out_itemsize * block_m * block_n   # two out halves, buffered
            + stack_b)


def _choose_tiles(m_pad: int, packed_w: int, n_g: int, min_sublane: int, out_itemsize: int, a8: bool, group: int = GROUP):
    """Search the divisor space for (block_m, block_n, kg) minimizing modeled
    step cost under a VMEM budget. Returns (block_m, block_n, kg, m_padded).

    Why a search instead of the previous fix-block_m-then-cap-block_n rule:
    7B's MLP half-width is 5504 = 128*43, whose ONLY tileable sizes are 128
    and 5504 — at prefill M the old rule's VMEM cap forced block_n=128, a
    (2, 43, 32) grid of 16 KB DMA steps measured at +49 ms per predict call
    vs int8. And at decode M the one-group-per-step reduction made 256 KB
    steps that were DMA-latency-bound (11.5 ms/step vs int8's 10.2 despite
    streaming HALF the bytes). The search weighs DMA size, MXU occupancy
    (128-row systolic granularity), VPU accumulate traffic, and per-step
    overhead jointly; `kg` (quantization groups per step) is the new lever
    that fattens the reduction dimension without changing scale math.

    block_m need not divide m: the caller pads rows (padding cost is modeled
    via the rounded-up block count)."""
    if a8 and m_pad <= 8:
        tuned = _TUNED_DECODE_TILES.get((group, n_g, packed_w))
        if tuned is not None:
            return (m_pad, tuned[0], tuned[1], m_pad)
    mxu = _MXU_INT8_OPS if a8 else _MXU_BF16_OPS
    best, best_cost = None, None
    # descending block_n: ties (same tile size => same modeled cost) resolve
    # to the widest tile, which the honest sweep consistently favors
    bm_cands = sorted({bm for bm in (8, 16, 32, 64, 128, 256) if bm >= min_sublane} | {max(min_sublane, m_pad if m_pad <= 256 else 256)})
    for block_n in reversed(_divisors(packed_w, 128)):
        for kg in _divisors(n_g, 1):
          for bm in bm_cands:
            # block_m is searched too: at prefill M a wide block_n only fits
            # VMEM with a SHORT row block (the f32 intermediates scale with
            # block_m*block_n), and a narrow-bn tall-bm tile measured much
            # worse than wide-bn short-bm at the same VMEM.
            if m_pad <= bm:
                block_m, m_blocks = -(-m_pad // min_sublane) * min_sublane, 1
            else:
                m_blocks = -(-m_pad // bm)
                rows = -(-m_pad // m_blocks)
                block_m = -(-rows // min_sublane) * min_sublane
            m_eff = m_blocks * block_m
            tile_b = kg * group * block_n          # packed bytes per step
            x_tile_b = block_m * kg * group * (1 if a8 else 2)
            if _tile_vmem_bytes(block_m, block_n, kg, out_itemsize, a8, group) > _VMEM_BUDGET:
                continue
            steps = m_blocks * (packed_w // block_n) * (n_g // kg)
            # resident-x blocks (see _int4_2d fullx) stream no x per step
            x_stream_b = 0 if block_m * n_g * group * (1 if a8 else 2) <= 512 * 1024 else x_tile_b
            dma_s = (tile_b + x_stream_b) / _HBM_BPS
            # MXU: two dots/group over 128-row systolic passes (row padding wasted)
            mxu_s = 2 * (-(-block_m // 128) * 128) * kg * group * block_n / mxu
            # VPU: nibble mask + two widen-converts on the byte tile, plus
            # per-group scale-multiply-accumulate on the f32 accumulators
            vpu_s = (3 * tile_b + 4 * kg * block_m * block_n) / _VPU_OPS
            cost = steps * (max(dma_s, mxu_s + vpu_s) + _STEP_OVERHEAD_S)
            if best_cost is None or cost < best_cost:
                best, best_cost = (block_m, block_n, kg, m_eff), cost
    return best


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "kg", "a8", "group"))
def _int4_2d(x, packed, scales, block_m: int, block_n: int, kg: int, a8: bool, group: int = GROUP):
    """Shared pallas_call plumbing for both kernels. a8=False: bf16 dots,
    output in x.dtype. a8=True: x is pre-quantized int8, int8 MXU dots,
    f32 output with the per-token scale applied by the caller."""
    m, k = x.shape
    n2 = packed.shape[1]  # = N // 2
    n_g = k // group
    n_go = n_g // kg  # grid steps along the reduction (kg groups per step)
    grid = (m // block_m, n2 // block_n, n_go)
    # Small-M (decode) blocks keep the WHOLE x row-block resident in VMEM so
    # only weight bytes DMA per grid step: the per-step x re-fetch broke the
    # DMA pipeline (probe: one-dot 430 -> 553 GB/s at 13B gate/up dims).
    fullx = block_m * k * x.dtype.itemsize <= 512 * 1024
    # [G, 1, N] view (free reshape — no copy): the lo/hi column halves are
    # selected by the two BlockSpec index maps below. An earlier version
    # materialized a [2G, 1, N//2] concat here — inside the decoder's layer
    # scan that re-copied EVERY scale every step (~210 MB/step at 7B).
    scales3 = scales.reshape(n_g, 1, 2 * n2)
    nb_hi = n2 // block_n  # column-block offset of the high half

    out_dtype = jnp.float32 if a8 else x.dtype
    kernel = (functools.partial(_kernel_a8, n_go=n_go, kg=kg, fullx=fullx, group=group) if a8
              else functools.partial(_kernel, n_go=n_go, kg=kg, out_dtype=out_dtype, fullx=fullx, group=group))
    x_spec = (pl.BlockSpec((block_m, k), lambda mi, ni, g: (mi, 0)) if fullx
              else pl.BlockSpec((block_m, kg * group), lambda mi, ni, g: (mi, g)))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((m, n2), out_dtype),) * 2,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((kg * group, block_n), lambda mi, ni, g: (g, ni)),
            pl.BlockSpec((kg, 1, block_n), lambda mi, ni, g: (g, 0, ni)),
            pl.BlockSpec((kg, 1, block_n), lambda mi, ni, g, _nb=nb_hi: (g, 0, _nb + ni)),
        ],
        out_specs=(pl.BlockSpec((block_m, block_n), lambda mi, ni, g: (mi, ni)),) * 2,
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, packed, scales3, scales3)
    # the halves are the output's column halves; the concat is tiny next to
    # the streamed weights (decode: 0.4 MB vs 35 MB at 13B dims)
    return jnp.concatenate([out_lo, out_hi], axis=1)


def int4_kernel_eligible(k: int, n: int, n_groups: int) -> bool:
    """The kernel requires scale groups that are a multiple of 128 input
    rows (MXU-aligned reduction tiles) and lane-tileable column halves.
    Pack-time group sizes 128/256/512 (quantize_llm_int4(group=...)) all
    qualify; the kernel derives the group from the scales shape."""
    if n % 256 != 0 or n_groups <= 0 or k % n_groups != 0:
        return False
    group = k // n_groups
    return group % GROUP == 0


def int4_tp_fallback_matmuls(cfg, group: int, tensor: int) -> list:
    """Projections whose SHARD-LOCAL geometry loses the fused kernel under a
    tensor=`tensor` mesh — the custom_partitioning lowering re-runs the shape
    dispatch per shard (_int4_route), and an ineligible local shape silently
    takes the XLA dequant fallback, measured 10x slower (module docstring).

    The structural constraint is the paired-halves layout x 128-lane tiles:
    a column-parallel shard needs local_n % 256 == 0. 7B's MLP width
    11008 = 256 x 43 (43 odd) breaks at ANY tensor >= 2 — 7B TP serving
    should stay int8. 13B's 13824 = 256 x 54 survives tensor=2 only.
    Row-parallel shards (wo/w_down) need local_k % group == 0, which every
    flagship geometry satisfies. deploy.py runs this audit and refuses a
    deploy that would serve off the advertised path (finding: silent cliff)."""
    head_dim = cfg.dim // cfg.n_heads
    geoms = {
        "wq": (cfg.dim, cfg.n_heads * head_dim // tensor),
        "wk": (cfg.dim, cfg.n_kv_heads * head_dim // tensor),
        "wv": (cfg.dim, cfg.n_kv_heads * head_dim // tensor),
        "w_gate": (cfg.dim, cfg.intermediate_size // tensor),
        "w_up": (cfg.dim, cfg.intermediate_size // tensor),
        "wo": (cfg.n_heads * head_dim // tensor, cfg.dim),
        "w_down": (cfg.intermediate_size // tensor, cfg.dim),
    }
    bad = []
    for name, (k, n) in geoms.items():
        if k % group or not int4_kernel_eligible(k, n, k // group):
            bad.append(name)
    return bad


def _int4_route(x3, packed, scales, a8: bool):
    """[B, T, K] @ packed — the shape-dispatch body for both kernel modes.
    Also the per-shard lowering under SPMD (shard-local shapes re-run the
    tile selection). a8=True takes int8 activations and returns f32 with the
    per-token scale applied by the caller (a rank-broadcast multiply XLA
    fuses into the consumer); its fallback keeps the kernel's exact integer
    semantics."""
    B, T, k = x3.shape
    n = 2 * packed.shape[-1]

    def fallback():
        from bridgelang_tpu.ops.quant import dequant_int4

        if a8:
            return x3.astype(jnp.float32) @ dequant_int4(packed, scales, dtype=jnp.float32)
        return x3 @ dequant_int4(packed, scales, dtype=x3.dtype)

    if not int4_kernel_eligible(k, n, scales.shape[-2]):
        return fallback()

    group = k // scales.shape[-2]
    x2 = x3.reshape(-1, k)
    m = x2.shape[0]
    # decode/verify chunks: pad to the Pallas block minimum (8 rows). An
    # earlier version padded to the NATIVE sublane tile (int8: 32) — but
    # Mosaic accepts 8-row blocks for both dtypes, and every per-output-tile
    # cost (f32 fixups, accumulator traffic, dot row-padding) scales with
    # block_m: the production kernel measured 333 -> 474 GB/s of packed
    # bytes at 13B gate/up dims from this change alone (M=32 -> 8).
    min_sublane = 8
    if m < min_sublane:
        x2 = jnp.pad(x2, ((0, min_sublane - m), (0, 0)))
    m_pad = x2.shape[0]
    out_itemsize = 4 if a8 else x3.dtype.itemsize
    if m_pad * n * out_itemsize > 64 * 1024 * 1024:
        # an output too big to be a serving shape
        return fallback()
    tiles = _choose_tiles(m_pad, packed.shape[-1], scales.shape[-2], min_sublane, out_itemsize, a8, group)
    if tiles is None:  # no tiling fits VMEM (enormous N) — not a serving shape
        return fallback()
    block_m, block_n, kg, m_eff = tiles
    if m_eff > m_pad:  # prefill M rarely divides the chosen block_m: pad rows
        x2 = jnp.pad(x2, ((0, m_eff - m_pad), (0, 0)))
    out = _int4_2d(x2, packed, scales, block_m, block_n, kg, a8, group)
    return out[:m].reshape(B, T, n)


def _matmul_int4_route(x3, packed, scales):
    return _int4_route(x3, packed, scales, a8=False)


def _matmul_int4_a8_route(q3, packed, scales):
    return _int4_route(q3, packed, scales, a8=True)


# --- SPMD partitioning --------------------------------------------------------
#
# Like the flash kernels (ops/flash_attention.py:206-290), a pallas_call is an
# XLA custom call the GSPMD/Shardy partitioner cannot shard on its own —
# unwrapped, a mesh context would force full replication of every operand
# (all-gathering batch-sharded activations on the serving replica axis, or
# fsdp-sharded QLoRA bases, every layer). The matmul is embarrassingly
# parallel over x's leading (batch/time) dims, so the wrapper declares
# exactly that: batch/time propagate from x; the weight operands always
# replicate (the out-paired byte layout couples output columns c and N/2+c
# inside one byte, so no contiguous column shard of the packed tensor maps
# to a contiguous shard of the result — a sharded weight, e.g. an
# fsdp-sharded QLoRA base, is all-gathered before the shard-local call:
# standard FSDP semantics; tensor parallelism stays int8's job).


def _axis_size(mesh, axes) -> int:
    if axes is None:
        return 1
    import math

    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    return math.prod(int(mesh.shape[a]) for a in axes)


def _pick_int4_specs(mesh, arg_shapes):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_of(s):
        sh = getattr(s, "sharding", None)
        return sh.spec if isinstance(sh, NamedSharding) else P()

    x_s = arg_shapes[0]
    xspec = spec_of(x_s)
    b = xspec[0] if len(xspec) > 0 else None
    t = xspec[1] if len(xspec) > 1 else None
    if b is not None and x_s.shape[0] % _axis_size(mesh, b) != 0:
        b = None
    if t is not None and x_s.shape[1] % _axis_size(mesh, t) != 0:
        t = None
    args = (
        NamedSharding(mesh, P(b, t, None)),
        NamedSharding(mesh, P(None, None)),
        NamedSharding(mesh, P(None, None)),
    )
    return args, NamedSharding(mesh, P(b, t, None))


def _int4_infer(mesh, arg_shapes, result_shape):
    return _pick_int4_specs(mesh, arg_shapes)[1]


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402


def _make_int4_spmd(route):
    cp = custom_partitioning(route)

    def _partition(mesh, arg_shapes, result_shape):
        arg_sh, result_sh = _pick_int4_specs(mesh, arg_shapes)
        return mesh, route, result_sh, arg_sh

    cp.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_int4_infer,  # GSPMD propagation
        sharding_rule="b t k, k p, g n -> b t n",  # Shardy propagation
        # sorted by factor index (order of first appearance in the rule)
        need_replication_factors=("k", "p", "g", "n"),
    )
    return cp


_matmul_int4_spmd = _make_int4_spmd(_matmul_int4_route)
_matmul_int4_a8_spmd = _make_int4_spmd(_matmul_int4_a8_route)


# --- tensor-parallel int4 (round-4) -------------------------------------------
#
# The blanket weight-replication above was round-3's honest rejection: with
# GLOBAL out-pairing (columns c and N/2+c share a byte) no contiguous column
# shard of the packed tensor maps to a contiguous result shard. Per-shard
# packing dissolves it (ops/quant.py::pack_int4 n_shards>1): pairing is
# applied within each of n_shards contiguous column blocks, so a contiguous
# 1/n_shards column shard of the packed tensor IS a standard v2-packed
# matrix over its own output columns, and the fused kernel runs shard-local
# with zero layout surgery. Column-parallel leaves (wq/wk/wv/w_gate/w_up)
# use exactly that. Row-parallel leaves (wo/w_down) never needed layout
# surgery — their sharded dim is the CONTRACTION dim K, pairing is along the
# un-sharded output — but they need reduction semantics: shard-local partial
# sums (scale groups are contained per shard when (K/D) % group == 0, so the
# per-group scale application reassociates exactly) joined by one psum.
# Together these give full megatron int4 serving (scripts/deploy.py
# --quantize_int4 --int4_shards N --mesh_spec tensor=N); parity vs single
# device is pinned in tests/test_int4_spmd.py + test_serving_tp.py.


def _int4_route_blocked(x3, packed, scales, a8: bool, n_shards: int):
    """Unsharded execution of a shard-blocked packing: each of the n_shards
    contiguous packed column blocks is a standard v2 matrix over its own
    output columns — run the kernel per block and concat. Used off-mesh
    (e.g. exporting or smoke-testing a TP-deployed artifact on one chip)."""
    if n_shards == 1:
        return _int4_route(x3, packed, scales, a8)
    w2 = packed.shape[-1] // n_shards
    ns = scales.shape[-1] // n_shards
    outs = [
        _int4_route(x3, packed[:, d * w2:(d + 1) * w2],
                    scales[:, d * ns:(d + 1) * ns], a8)
        for d in range(n_shards)
    ]
    return jnp.concatenate(outs, axis=-1)


@functools.lru_cache(maxsize=None)
def _make_int4_spmd_colsharded(a8: bool, n_shards: int, p_local: int):
    """custom_partitioning for COLUMN-parallel shard-blocked int4: packed and
    scales shard together on their last dim over an axis of size n_shards;
    each device's block is plain v2, so the shard-local lowering is the
    ordinary route. Off-mesh (or mismatched axis) falls back to the blocked
    execution — always correct, never silently wrong-layout.

    `p_local` = packed columns per shard block (packed_w // n_shards):
    Shardy requires explicit sizes for factors that only appear inside
    compound factors, so the cp is cached per (mode, shards, width)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def route(x3, packed, scales):
        return _int4_route_blocked(x3, packed, scales, a8, n_shards)

    cp = custom_partitioning(route)

    def _pick(mesh, arg_shapes):
        def spec_of(s):
            sh = getattr(s, "sharding", None)
            return sh.spec if isinstance(sh, NamedSharding) else P()

        x_s = arg_shapes[0]
        xspec = spec_of(x_s)
        b = xspec[0] if len(xspec) > 0 else None
        t = xspec[1] if len(xspec) > 1 else None
        if b is not None and x_s.shape[0] % _axis_size(mesh, b) != 0:
            b = None
        if t is not None and x_s.shape[1] % _axis_size(mesh, t) != 0:
            t = None
        pspec = spec_of(arg_shapes[1])
        axis = pspec[1] if len(pspec) > 1 else None
        if axis is not None and _axis_size(mesh, axis) != n_shards:
            axis = None  # pack-time shard count must equal the mesh split
        args = (
            NamedSharding(mesh, P(b, t, None)),
            NamedSharding(mesh, P(None, axis)),
            NamedSharding(mesh, P(None, axis)),
        )
        return args, NamedSharding(mesh, P(b, t, axis)), axis

    def _partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh, axis = _pick(mesh, arg_shapes)
        if axis is not None:
            # one shard block per device -> plain v2 locally
            local = lambda x3, p, s: _int4_route(x3, p, s, a8)  # noqa: E731
        else:
            local = route
        return mesh, local, res_sh, arg_sh

    def _infer(mesh, arg_shapes, result_shape):
        return _pick(mesh, arg_shapes)[1]

    cp.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        # s is the shard-block factor shared by packed/scales/result
        sharding_rule="b t k, k (s p), g (s n) -> b t (s n)",
        need_replication_factors=("k", "p", "g", "n"),
        s=n_shards, p=p_local, n=2 * p_local,
    )
    return cp


@functools.lru_cache(maxsize=None)
def _make_int4_spmd_rowsharded(a8: bool, n_shards: int, k_local: int, g_local: int):
    """custom_partitioning for ROW-parallel int4 (wo/w_down under a tensor
    mesh): x's last dim and packed's first dim shard together on the
    contraction axis, scale GROUPS shard with the rows ((K/D) % group == 0
    checked by the caller via int4_row_shardable), and shard-local partial
    results meet in one psum — the megatron second-matmul contract the int8
    path gets from GSPMD on plain dots.

    `k_local`/`g_local` = rows / scale groups per shard (Shardy needs
    explicit sizes for compound-only factors; cached per geometry)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def route(x3, packed, scales):
        return _int4_route(x3, packed, scales, a8)

    cp = custom_partitioning(route)

    def _pick(mesh, arg_shapes):
        def spec_of(s):
            sh = getattr(s, "sharding", None)
            return sh.spec if isinstance(sh, NamedSharding) else P()

        x_s = arg_shapes[0]
        xspec = spec_of(x_s)
        b = xspec[0] if len(xspec) > 0 else None
        if b is not None and x_s.shape[0] % _axis_size(mesh, b) != 0:
            b = None
        pspec = spec_of(arg_shapes[1])
        axis = pspec[0] if len(pspec) > 0 else None
        if axis is not None:
            d = _axis_size(mesh, axis)
            g = arg_shapes[2].shape[-2]
            k = arg_shapes[1].shape[0]
            # rows, scale groups, AND kernel reduction tiles must all split
            # evenly (and match the declared shard count); otherwise
            # replicate (correct, just not row-parallel)
            if d != n_shards or not int4_row_shardable(k, g, d):
                axis = None
        args = (
            NamedSharding(mesh, P(b, None, axis)),
            NamedSharding(mesh, P(axis, None)),
            NamedSharding(mesh, P(axis, None)),
        )
        return args, NamedSharding(mesh, P(b, None, None)), axis

    def _partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh, axis = _pick(mesh, arg_shapes)
        if axis is not None:
            def local(x3, p, s, _axis=axis):
                return jax.lax.psum(_int4_route(x3, p, s, a8), _axis)
        else:
            local = route
        return mesh, local, res_sh, arg_sh

    def _infer(mesh, arg_shapes, result_shape):
        return _pick(mesh, arg_shapes)[1]

    # Shardy rejects size-1 factors inside compound mappings (tiny test
    # geometries can hit k_local or g_local == 1): collapse those dims to
    # the bare reduction factor.
    k_map = "r" if k_local == 1 else "(r k)"
    g_map = "r" if g_local == 1 else "(r g)"
    # r's size is inferable (hence must not be given) when it appears as a
    # whole dimension anywhere
    sizes = {} if (k_local == 1 or g_local == 1) else {"r": n_shards}
    if k_local > 1:
        sizes["k"] = k_local
    if g_local > 1:
        sizes["g"] = g_local
    # need_replication_factors must follow first-appearance order in the rule
    order = ("t", "k", "p", "g", "n")
    present = {"t", "p", "n"} | ({"k"} if k_local > 1 else set()) | ({"g"} if g_local > 1 else set())
    repl = [f for f in order if f in present]
    cp.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        # r: the sharded row/group factor, reduced out of the result
        sharding_rule=f"b t {k_map}, {k_map} p, {g_map} n -> b t n",
        reduction_factors=("r",),
        need_replication_factors=tuple(repl),
        **sizes,
    )
    return cp


def int4_row_shardable(k: int, n_groups: int, n_devices: int) -> bool:
    """True when a [K, N//2] packed weight's rows AND its K//group scale
    groups split evenly over n_devices with group boundaries intact."""
    if k % n_devices or n_groups % n_devices:
        return False
    group = k // n_groups
    return (k // n_devices) % group == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def matmul_int4(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                n_shards: int = 1, row_parallel: bool = False) -> jnp.ndarray:
    """x [..., K] @ int4-packed weight -> [..., N].

    `packed` is [K, N//2] int8 in the out-paired nibble layout, `scales`
    [K//GROUP, N]. Falls back to an XLA dequant-then-dot for shapes the
    kernel cannot tile (tiny test configs) — bit-identical codes either way.

    Differentiable w.r.t. `x` only (custom VJP — Pallas kernels have no AD
    rule): the backward dequantizes one layer's weight transiently and runs a
    plain XLA dot. That materialization is fine in training, where QLoRA over
    a frozen int4 base (scripts/finetune.py --quantization_bits 4) is
    compute-bound and per-layer transients are rematerialized anyway.

    Tensor-parallel deploys (static args): `n_shards>1` declares the weight
    was packed shard-blocked (ops/quant.py::pack_int4 n_shards) for
    column-parallel sharding over a size-n_shards mesh axis;
    `row_parallel=True` declares a contraction-dim (K) sharded weight with
    shard-local partials + psum. Both degrade gracefully off-mesh.
    """
    return _matmul_int4_impl(x, packed, scales, n_shards, row_parallel)


def _int4_spmd_dispatch(a8: bool, n_shards: int, row_parallel: bool,
                        packed_shape=None, scales_shape=None):
    if row_parallel:
        k, g = packed_shape[0], scales_shape[-2]
        if not int4_row_shardable(k, g, n_shards):
            # Geometry can't row-shard (scale groups or rows don't split
            # evenly): serving_param_shardings made the same call and
            # REPLICATED this weight, so the plain wrapper (batch-sharded x
            # stays local) is the matching program — degrade, don't crash.
            return _matmul_int4_a8_spmd if a8 else _matmul_int4_spmd
        return _make_int4_spmd_rowsharded(a8, n_shards, k // n_shards, g // n_shards)
    if n_shards > 1:
        return _make_int4_spmd_colsharded(a8, n_shards, packed_shape[-1] // n_shards)
    return _matmul_int4_a8_spmd if a8 else _matmul_int4_spmd


def _matmul_int4_impl(x, packed, scales, n_shards=1, row_parallel=False):
    *lead, k = x.shape
    n = 2 * packed.shape[-1]
    # canonical [B, T, K]: leading-dim sharding survives the (no-op for the
    # serving/training 3-dim case) reshape into the SPMD wrapper
    x3 = x.reshape(lead[0] if lead else 1, -1, k)
    fn = _int4_spmd_dispatch(False, n_shards, row_parallel, packed.shape, scales.shape)
    return fn(x3, packed, scales).reshape(*lead, n)


def _matmul_int4_fwd(x, packed, scales, n_shards, row_parallel):
    return _matmul_int4_impl(x, packed, scales, n_shards, row_parallel), (packed, scales)


def _matmul_int4_bwd(n_shards, row_parallel, res, g):
    import numpy as np

    from bridgelang_tpu.ops.quant import dequant_int4

    packed, scales = res
    shards = 1 if row_parallel else n_shards
    w = dequant_int4(packed, scales, dtype=g.dtype, n_shards=shards)  # [K, N] transient
    dx = g @ w.T
    # packed is integer (no cotangent); scales are frozen in every consumer
    d_scales = jnp.zeros(scales.shape, scales.dtype)
    return dx, np.zeros(packed.shape, jax.dtypes.float0), d_scales


matmul_int4.defvjp(_matmul_int4_fwd, _matmul_int4_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def matmul_int4_a8(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                   n_shards: int = 1, row_parallel: bool = False) -> jnp.ndarray:
    """w4a8: x [..., K] @ int4-packed weight -> [..., N], activations
    quantized per-token to int8 so the kernel's dots ride the MXU int8 path.

    Same layout contract as matmul_int4. The activation quantization mirrors
    the w8a8 prefill path (models/llm/llama.py::proj) — per-token symmetric
    absmax/127 — but unlike w8a8 it pays off at EVERY chunk length: the bf16
    kernel is MXU-pass-bound at decode M, not weight-stream-bound, so halving
    the pass cost speeds decode too (the serving config keys this on
    cfg.w8a8). Numerics: nibble recovery is exact int32; the only
    approximation beyond int4 weights is the int8 activation rounding.

    Backward (for completeness — serving never differentiates): straight-
    through estimator through the activation quant, dx = g @ W^T via a
    transient dequant, matching matmul_int4's VJP.

    `n_shards` / `row_parallel`: tensor-parallel declarations, see matmul_int4.
    """
    return _matmul_int4_a8_impl(x, packed, scales, n_shards, row_parallel)


def _matmul_int4_a8_impl(x, packed, scales, n_shards=1, row_parallel=False):
    from bridgelang_tpu.ops.quant import quantize_activations_per_token

    *lead, k = x.shape
    n = 2 * packed.shape[-1]
    x3 = x.reshape(lead[0] if lead else 1, -1, k)
    # per-token absmax over the FULL hidden dim: under a row-sharded x this
    # is a cross-shard max GSPMD handles outside the kernel (a few bytes at
    # decode), keeping the quantized activations identical to single-chip.
    q3, xs = quantize_activations_per_token(x3)
    fn = _int4_spmd_dispatch(True, n_shards, row_parallel, packed.shape, scales.shape)
    out = fn(q3, packed, scales)  # f32, per-token scale off
    return (out * xs).astype(x.dtype).reshape(*lead, n)


def _matmul_int4_a8_fwd(x, packed, scales, n_shards, row_parallel):
    return _matmul_int4_a8_impl(x, packed, scales, n_shards, row_parallel), (packed, scales)


matmul_int4_a8.defvjp(_matmul_int4_a8_fwd, _matmul_int4_bwd)
