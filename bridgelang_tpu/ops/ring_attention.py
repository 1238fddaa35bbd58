"""Ring attention: sequence-sharded causal attention over the ICI ring.

Context parallelism the reference does not have at all (SURVEY.md §2.10: no
SP/CP/ring). Sequences are sharded across a mesh axis; each device computes
blockwise attention for its local queries while K/V blocks rotate around the
ring via `jax.lax.ppermute`, with online-softmax statistics merged across
steps — communication overlaps compute, memory per device is O(T/n).

At the reference's 2048-token context this is unnecessary; it exists so the
framework scales to long-horizon VLA variants (multi-frame windows, long
instruction traces) without rewriting the attention stack.

Use under `jax.shard_map` with q/k/v sharded on `axis_name` along time:

    out = shard_map(
        partial(ring_attention, axis_name="sp", causal=True),
        mesh=mesh,
        in_specs=P(None, "sp", None, None), out_specs=P(None, "sp", None, None),
    )(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attention(q, k, v, q_pos, k_pos, causal):
    """One q-block x k-block partial attention with fp32 stats.

    q: [B, Tq, H, D]; k/v: [B, Tk, Hkv, D]; positions are global indices.
    Returns (unnormalized acc [B, Tq, H, D], row max m, row sum l).
    """
    n_rep = q.shape[2] // k.shape[2]
    if n_rep > 1:
        b, s, hkv, d = k.shape
        k = jnp.broadcast_to(k[:, :, :, None, :], (b, s, hkv, n_rep, d)).reshape(b, s, hkv * n_rep, d)
        v = jnp.broadcast_to(v[:, :, :, None, :], (b, s, hkv, n_rep, d)).reshape(b, s, hkv * n_rep, d)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if causal:
        mask = k_pos[None, :] <= q_pos[:, None]  # [Tq, Tk]
        logits = jnp.where(mask[None, None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)                        # [B, H, Tq]
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)                             # [B, H, Tq]
    acc = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "sp",
    causal: bool = True,
) -> jnp.ndarray:
    """Causal attention with q/k/v time-sharded on `axis_name`.

    Local shapes: q [B, Tq_local, H, D], k/v [B, Tk_local, Hkv, D]. The global
    sequence is the concatenation over the axis in axis-index order. Returns
    the local output block [B, Tq_local, H, D] in the input dtype.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, tq, h, d = q.shape
    tk = k.shape[1]

    q_pos = idx * tq + jnp.arange(tq)

    def step(carry, i):
        k_blk, v_blk, acc, m, l = carry
        src_idx = (idx - i) % n               # whose K/V block we hold at step i
        k_pos = src_idx * tk + jnp.arange(tk)
        blk_acc, blk_m, blk_l = _block_attention(q, k_blk, v_blk, q_pos, k_pos, causal)
        # online-softmax merge
        m_new = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(blk_m - m_new)
        l_new = l * alpha + blk_l * beta
        acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + blk_acc * beta.transpose(0, 2, 1)[..., None]
        # rotate K/V around the ring (device j sends to j+1)
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_next, v_next, acc_new, m_new, l_new), None

    # Derive initial stats from q so they carry the same shard_map "varying
    # over axis" type as the loop outputs (constants would be axis-invariant).
    zero_like_q = q.astype(jnp.float32) * 0.0
    acc0 = zero_like_q
    m0 = jnp.transpose(zero_like_q[..., 0], (0, 2, 1)) + NEG_INF  # [B, H, Tq]
    l0 = jnp.transpose(zero_like_q[..., 0], (0, 2, 1))
    (_, _, acc, m, l), _ = jax.lax.scan(step, (k, v, acc0, m0, l0), jnp.arange(n))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, axis_name: str = "sp", causal: bool = True):
    """Convenience wrapper: q/k/v are GLOBAL arrays; shards over `axis_name`."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        partial(ring_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
