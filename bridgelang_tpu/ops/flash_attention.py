"""Pallas TPU flash attention (causal + right-padding aware), fwd + bwd.

TPU-native replacement for the reference's flash-attn 2.5.5 CUDA dependency
(reference: prismatic/models/backbones/llm/base_llm.py:111-126 enables HF
`flash_attention_2` for the Llama decoder). Implements the standard
online-softmax tiling (one pass over KV blocks per query block, fp32
accumulators, log-sum-exp saved for the backward) with:

  * causal masking plus a per-example valid-key `length` (right-padded
    batches), passed as scalar-prefetch so block index math happens in SMEM;
  * GQA: KV heads indexed as h // (n_heads // n_kv_heads) via BlockSpec
    index maps — no materialized head repetition;
  * causal block skipping: query block i only loops over KV blocks <= i
    (and past the valid length, nothing at all);
  * optional sliding-window masking (Mistral): row r attends cols in
    (r - window, r]; the KV loop bounds tighten to the window band;
  * keys may be LONGER than queries (prefill writing into a preallocated KV
    cache): queries are assumed to sit at key positions 0..T-1, extra key
    slots are dead cache space masked off by `lengths`;
  * custom VJP with Pallas dq and dk/dv kernels.

Layout notes: activations are [B, T, H, D] at the API, transposed to
[B, H, T, D] for the kernels. Row statistics (lse, delta) are stored
[B, H, T, STAT_W] with STAT_W=8 — the minimal last-dim width the TPU tiling
rules accept for a block whose penultimate dim is the 128-row query block.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30
STAT_W = 8  # replicated width for per-row statistics (TPU tiling constraint)


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on non-TPU backends (tests).
    return jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --- forward kernel -----------------------------------------------------------


def _fwd_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, causal, window):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    bq, d = q_ref.shape[2], q_ref.shape[3]

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [bq, d]
    length = lengths_ref[b]
    q_start = iq * bq
    row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)

    if causal:
        upper = jnp.minimum(pl.cdiv(q_start + bq, block_k), pl.cdiv(length, block_k))
    else:
        upper = pl.cdiv(length, block_k)
    lower = 0
    if window is not None:
        # Row r attends cols in (r - window, r]; smallest allowed col in this
        # query block is q_start - window + 1.
        lower = jnp.maximum(0, (q_start - window + 1) // block_k)

    def body(kb, carry):
        acc, m_i, l_i = carry  # [bq,d], [bq,1], [bq,1]
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, block_k]
        col_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        mask = col_ids < length
        if causal:
            mask = mask & (col_ids <= row_ids)
        if window is not None:
            mask = mask & (col_ids > row_ids - window)
        logits = jnp.where(mask, logits, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(lower, upper, body, (acc0, m0, l0))

    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse = m_i + jnp.log(l_safe)  # rows past `length` hold ~NEG_INF; don't-care
    lse_ref[0, 0] = jnp.broadcast_to(lse, (bq, STAT_W)).astype(jnp.float32)


# --- backward kernels ---------------------------------------------------------


def _bwd_dq_kernel(lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale, block_k, causal, window):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    bq, d = q_ref.shape[2], q_ref.shape[3]

    q = q_ref[0, 0].astype(jnp.float32) * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, 0:1]      # [bq, 1]
    delta = delta_ref[0, 0, :, 0:1]  # [bq, 1]
    length = lengths_ref[b]
    q_start = iq * bq
    row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)

    if causal:
        upper = jnp.minimum(pl.cdiv(q_start + bq, block_k), pl.cdiv(length, block_k))
    else:
        upper = pl.cdiv(length, block_k)
    lower = 0
    if window is not None:
        lower = jnp.maximum(0, (q_start - window + 1) // block_k)

    def body(kb, dq_acc):
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        col_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        mask = col_ids < length
        if causal:
            mask = mask & (col_ids <= row_ids)
        if window is not None:
            mask = mask & (col_ids > row_ids - window)
        p = jnp.where(mask, jnp.exp(logits - lse), 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # [bq, block_k]
        return dq_acc + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(lower, upper, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale, block_q, causal, window
):
    b = pl.program_id(0)
    jk = pl.program_id(2)
    bk, d = k_ref.shape[2], k_ref.shape[3]
    t = q_ref.shape[2]

    k_blk = k_ref[0, 0].astype(jnp.float32)  # [bk, d]
    v_blk = v_ref[0, 0].astype(jnp.float32)
    length = lengths_ref[b]
    k_start = jk * bk
    col_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)

    lower = (k_start // block_q) if causal else 0
    num_qb = pl.cdiv(t, block_q)
    upper = num_qb
    if window is not None:
        # Col c is attended by rows in [c, c + window); the largest row for
        # this KV block is (k_start + bk - 1) + window - 1.
        upper = jnp.minimum(num_qb, (k_start + bk + window - 2) // block_q + 1)

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32) * scale
        do_blk = do_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(qb * block_q, block_q), 0:1]      # [block_q, 1]
        delta_blk = delta_ref[0, 0, pl.ds(qb * block_q, block_q), 0:1]  # [block_q, 1]
        logits = jax.lax.dot_general(q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        row_ids = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
        mask = col_ids < length
        if causal:
            mask = mask & (col_ids <= row_ids)
        if window is not None:
            mask = mask & (col_ids > row_ids - window)
        p = jnp.where(mask, jnp.exp(logits - lse_blk), 0.0)  # [block_q, bk]
        dv_acc = dv_acc + jax.lax.dot_general(p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk)
        dk_acc = dk_acc + jax.lax.dot_general(ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lower, upper, body, (dk0, dv0))
    # q_blk already carries the 1/sqrt(d) scale, so dk needs no extra factor.
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# --- SPMD partitioning --------------------------------------------------------
#
# pallas_call lowers to an XLA custom call, which the GSPMD/Shardy partitioner
# cannot shard on its own: on a multi-chip mesh an unregistered kernel forces
# full replication of its operands (q sharded over (replica, fsdp) batch axes
# and the tensor-parallel head axis would be all-gathered — defeating the
# sharding the trainer sets up). The kernels' grid is embarrassingly parallel
# over (batch, head), so each pallas entry point is wrapped in
# `jax.experimental.custom_partitioning` declaring exactly that: batch/head
# dims propagate the operand sharding, time/feature dims are replicated, and
# the per-shard lowering is the SAME pallas call on shard-local shapes.
#
# GQA blocking constraint: a head-axis shard must contain whole KV groups, so
# the head axis is accepted only when it divides n_kv_heads (Llama MHA: any;
# Mistral 8-KV-head GQA: tensor ∈ {2,4,8}); otherwise heads replicate.


def _axis_size(mesh, axes) -> int:
    if axes is None:
        return 1
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    return math.prod(int(mesh.shape[a]) for a in axes)


def _pick_batch_head_axes(mesh, arg_shapes):
    """Choose (batch_axes, head_axes) the kernels can honor, from the q
    operand's suggested sharding. arg layout: (lengths [B], q [B,H,T,D],
    k [B,Hkv,S,D], v [B,Hkv,S,D], ...) — every rank-4 operand is
    (batch, heads, time, feature)."""
    q_shape = arg_shapes[1]
    spec = q_shape.sharding.spec if isinstance(q_shape.sharding, NamedSharding) else P()
    sb = spec[0] if len(spec) > 0 else None
    sh = spec[1] if len(spec) > 1 else None
    b, h = q_shape.shape[0], q_shape.shape[1]
    hkv = arg_shapes[2].shape[1]
    if sb is not None and b % _axis_size(mesh, sb) != 0:
        sb = None
    n_h = _axis_size(mesh, sh)
    if sh is not None and (h % n_h != 0 or hkv % n_h != 0):
        sh = None  # GQA groups would split across shards; replicate heads
    return sb, sh


def _spmd_wrap(raw_fn, n_args: int, n_static: int, n_results: int, rule: str):
    """Wrap a pallas entry point (lengths, *rank4_tensors, *statics) in
    custom_partitioning with batch/head propagation. `n_args` counts ALL
    positional args; the last `n_static` are static (hashable) kernel params.
    `rule` is the einsum-style Shardy sharding rule over the dynamic operands
    (factors: b=batch, h=query heads, g=kv heads; t/s/d/w must replicate)."""

    wrapped = custom_partitioning(
        raw_fn, static_argnums=tuple(range(n_args - n_static, n_args))
    )

    def _shardings(mesh, arg_shapes):
        sb, sh = _pick_batch_head_axes(mesh, arg_shapes)
        tensor_s = NamedSharding(mesh, P(sb, sh, None, None))
        args = (NamedSharding(mesh, P(sb)),) + (tensor_s,) * (len(arg_shapes) - 1)
        results = (tensor_s,) * n_results
        return args, results if n_results > 1 else results[0]

    def infer(*args):
        mesh, arg_shapes, _ = args[n_static:]
        _, results = _shardings(mesh, arg_shapes)
        return results

    def partition(*args):
        statics = args[:n_static]
        mesh, arg_shapes, _ = args[n_static:]
        arg_sh, result_sh = _shardings(mesh, arg_shapes)

        def lower_fn(*operands):
            return raw_fn(*operands, *statics)

        return mesh, lower_fn, result_sh, arg_sh

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,  # GSPMD propagation
        sharding_rule=rule,                  # Shardy propagation
        # NB: Shardy requires these sorted by factor index (order of first
        # appearance in `rule`): t, d appear in q before s (in k) and w (lse).
        need_replication_factors=("t", "d", "s", "w"),
    )
    return wrapped


# --- host-side wrappers -------------------------------------------------------


def _pad_time(x: jnp.ndarray, t_pad: int) -> jnp.ndarray:
    if x.shape[1] == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, block_q, block_k, window, lengths=None):
    out, _ = _flash_fwd_impl(q, k, v, causal, block_q, block_k, window, lengths)
    return out


def _fwd_pallas(lengths, qt, kt, vt, block_q, block_k, causal, window):
    """Forward pallas entry point on [B, H, T, D]-transposed, block-padded
    operands — shard-local shapes under SPMD (see _spmd_wrap)."""
    b, h, t_pad, d = qt.shape
    group = h // kt.shape[1]
    s_pad = kt.shape[2]
    scale = d ** -0.5

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, qq, *_: (bb, hh, qq, 0))
    kv_spec = pl.BlockSpec((1, 1, s_pad, d), lambda bb, hh, qq, *_: (bb, hh // group, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, causal=causal, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, t_pad // block_q),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, qq, *_: (bb, hh, qq, 0)),
                pl.BlockSpec((1, 1, block_q, STAT_W), lambda bb, hh, qq, *_: (bb, hh, qq, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t_pad, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, STAT_W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(lengths, qt, kt, vt)


_fwd_sharded = _spmd_wrap(
    _fwd_pallas, n_args=8, n_static=4, n_results=2,
    rule="b, b h t d, b g s d, b g s d -> b h t d, b h t w",
)


def _flash_fwd_impl(q, k, v, causal, block_q, block_k, window, lengths):
    b, t, h, d = q.shape
    s = k.shape[1]
    assert s >= t, f"keys ({s}) must be at least as long as queries ({t}); queries sit at key positions 0..T-1"
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)
    t_pad = _ceil_to(max(t, block_q), block_q)
    s_pad = _ceil_to(max(s, block_k), block_k)

    qt = jnp.transpose(_pad_time(q, t_pad), (0, 2, 1, 3))  # [B, H, T, D]
    kt = jnp.transpose(_pad_time(k, s_pad), (0, 2, 1, 3))  # [B, Hkv, S, D]
    vt = jnp.transpose(_pad_time(v, s_pad), (0, 2, 1, 3))

    out, lse = _fwd_sharded(lengths.astype(jnp.int32), qt, kt, vt, block_q, block_k, causal, window)
    out_t = jnp.transpose(out, (0, 2, 1, 3))[:, :t]
    return out_t, (q, k, v, lengths, out_t, lse, t_pad, s_pad)


def _flash_fwd(q, k, v, causal, block_q, block_k, window, lengths=None):
    out, res = _flash_fwd_impl(q, k, v, causal, block_q, block_k, window, lengths)
    return out, res


def _dq_pallas(lengths, qt, kt, vt, do, lse, delta, block_q, block_k, causal, window):
    b, h, t_pad, d = qt.shape
    group = h // kt.shape[1]
    s_pad = kt.shape[2]
    scale = d ** -0.5

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, qq, *_: (bb, hh, qq, 0))
    kv_full_spec = pl.BlockSpec((1, 1, s_pad, d), lambda bb, hh, qq, *_: (bb, hh // group, 0, 0))
    stat_q_spec = pl.BlockSpec((1, 1, block_q, STAT_W), lambda bb, hh, qq, *_: (bb, hh, qq, 0))
    return pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, causal=causal, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, t_pad // block_q),
            in_specs=[q_spec, kv_full_spec, kv_full_spec, q_spec, stat_q_spec, stat_q_spec],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, qq, *_: (bb, hh, qq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(lengths, qt, kt, vt, do, lse, delta)


def _dkv_pallas(lengths, qt, kt, vt, do, lse, delta, block_q, block_k, causal, window):
    # dk/dv: grid over KV blocks; each query head accumulates into its own
    # slot, then GQA sums query-head slots into their KV head outside.
    b, h, t_pad, d = qt.shape
    group = h // kt.shape[1]
    s_pad = kt.shape[2]
    scale = d ** -0.5

    full_q_spec = pl.BlockSpec((1, 1, t_pad, d), lambda bb, hh, kk, *_: (bb, hh, 0, 0))
    kv_blk_spec = pl.BlockSpec((1, 1, block_k, d), lambda bb, hh, kk, *_: (bb, hh // group, kk, 0))
    full_stat_spec = pl.BlockSpec((1, 1, t_pad, STAT_W), lambda bb, hh, kk, *_: (bb, hh, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q, causal=causal, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, s_pad // block_k),
            in_specs=[full_q_spec, kv_blk_spec, kv_blk_spec, full_q_spec, full_stat_spec, full_stat_spec],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, d), lambda bb, hh, kk, *_: (bb, hh, kk, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bb, hh, kk, *_: (bb, hh, kk, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(lengths, qt, kt, vt, do, lse, delta)


_dq_sharded = _spmd_wrap(
    _dq_pallas, n_args=11, n_static=4, n_results=1,
    rule="b, b h t d, b g s d, b g s d, b h t d, b h t w, b h t w -> b h t d",
)
_dkv_sharded = _spmd_wrap(
    _dkv_pallas, n_args=11, n_static=4, n_results=2,
    rule="b, b h t d, b g s d, b g s d, b h t d, b h t w, b h t w -> b h s d, b h s d",
)


def _flash_bwd(causal, block_q, block_k, window, res, g):
    q, k, v, lengths, out, lse, t_pad, s_pad = res
    b, t, h, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    group = h // hkv

    qt = jnp.transpose(_pad_time(q, t_pad), (0, 2, 1, 3))
    kt = jnp.transpose(_pad_time(k, s_pad), (0, 2, 1, 3))
    vt = jnp.transpose(_pad_time(v, s_pad), (0, 2, 1, 3))
    do = jnp.transpose(_pad_time(g, t_pad), (0, 2, 1, 3))
    ot = jnp.transpose(_pad_time(out, t_pad), (0, 2, 1, 3))
    delta_row = jnp.sum(do.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)  # [B, H, T]
    delta = jnp.broadcast_to(delta_row[..., None], delta_row.shape + (STAT_W,))

    lengths_i = lengths.astype(jnp.int32)
    dq = _dq_sharded(lengths_i, qt, kt, vt, do, lse, delta, block_q, block_k, causal, window)
    dk_h, dv_h = _dkv_sharded(lengths_i, qt, kt, vt, do, lse, delta, block_q, block_k, causal, window)

    dk_h = dk_h.reshape(b, hkv, group, s_pad, d).sum(axis=2)
    dv_h = dv_h.reshape(b, hkv, group, s_pad, d).sum(axis=2)

    dq_out = jnp.transpose(dq, (0, 2, 1, 3))[:, :t]
    dk_out = jnp.transpose(dk_h, (0, 2, 1, 3))[:, :s].astype(k.dtype)
    dv_out = jnp.transpose(dv_h, (0, 2, 1, 3))[:, :s].astype(v.dtype)
    return dq_out, dk_out, dv_out, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lengths: Optional[jnp.ndarray] = None,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Causal flash attention over right-padded batches.

    q: [B, T, H, D]; k/v: [B, S, Hkv, D] (GQA allowed; S >= T — the KV-cache
    prefill case, where queries occupy key positions 0..T-1 and slots past
    `lengths` are dead cache space). `lengths` [B] gives the number of valid
    (non-pad) keys per example; if only `mask` [B, 1, T, S] is given, lengths
    are recovered as the count of keys any query row attends (valid for the
    causal/sliding-window + right-padding mask family this framework builds).
    `window` is the sliding-window width (Mistral): row r attends keys in
    (r - window, r].
    """
    if lengths is None and mask is not None:
        lengths = jnp.sum(jnp.any(mask[:, 0], axis=1).astype(jnp.int32), axis=-1)
    if window is not None and window >= k.shape[1]:
        window = None  # window never clips at this sequence length
    block_q = min(block_q, _ceil_to(q.shape[1], 128))
    block_k = min(block_k, _ceil_to(k.shape[1], 128))
    return _flash(q, k, v, causal, block_q, block_k, window, lengths)


def attention_reference(q, k, v, mask):
    """Unfused reference attention (for tests)."""
    n_rep = q.shape[2] // k.shape[2]
    if n_rep > 1:
        b, s, hkv, dd = k.shape
        k = jnp.broadcast_to(k[:, :, :, None, :], (b, s, hkv, n_rep, dd)).reshape(b, s, hkv * n_rep, dd)
        v = jnp.broadcast_to(v[:, :, :, None, :], (b, s, hkv, n_rep, dd)).reshape(b, s, hkv * n_rep, dd)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)) / (q.shape[-1] ** 0.5)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32)).astype(q.dtype)
