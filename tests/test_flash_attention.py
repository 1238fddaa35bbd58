"""Flash attention kernel vs unfused reference (interpreter mode on CPU;
compiled on real TPU). Forward + gradients, causal + padding + GQA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgelang_tpu.ops.flash_attention import attention_reference, flash_attention


def _mk(b, t, h, hkv, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), dtype=dtype)
    return q, k, v


def _mask(b, t, lengths, causal=True):
    key_valid = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    causal_m = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    m = key_valid[:, None, None, :]
    if causal:
        m = m & causal_m[None, None]
    return jnp.broadcast_to(m, (b, 1, t, t))


@pytest.mark.parametrize("t,lengths", [(128, [128, 128]), (256, [256, 200]), (160, [130, 97])])
def test_forward_matches_reference(t, lengths):
    b, h, d = 2, 4, 64
    q, k, v = _mk(b, t, h, h, d)
    out = flash_attention(q, k, v, lengths=jnp.asarray(lengths))
    ref = attention_reference(q, k, v, _mask(b, t, lengths))
    # Compare only valid query rows (padded rows are don't-care)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out[i, :L]), np.asarray(ref[i, :L]), atol=2e-5, rtol=2e-5)


def test_forward_gqa():
    b, t, h, hkv, d = 2, 128, 8, 2, 64
    q, k, v = _mk(b, t, h, hkv, d, seed=1)
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v, _mask(b, t, [t, t]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mask_to_lengths_path():
    b, t, h, d = 1, 128, 2, 64
    q, k, v = _mk(b, t, h, h, d, seed=2)
    mask = _mask(b, t, [100])
    out = flash_attention(q, k, v, mask=mask)
    ref = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out[0, :100]), np.asarray(ref[0, :100]), atol=2e-5, rtol=2e-5)


def test_gradients_match_reference():
    b, t, h, d = 1, 128, 2, 64
    q, k, v = _mk(b, t, h, h, d, seed=3)
    lengths = jnp.asarray([110])
    mask = _mask(b, t, [110])
    # Loss only over valid rows so padded-row gradients don't pollute comparison.
    row_valid = (jnp.arange(t) < 110).astype(jnp.float32)[None, :, None, None]

    def loss_flash(q, k, v):
        return jnp.sum((flash_attention(q, k, v, lengths=lengths) * row_valid) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((attention_reference(q, k, v, mask) * row_valid) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
                                   err_msg=f"grad d{name} mismatch")


def test_gradients_gqa():
    b, t, h, hkv, d = 1, 128, 4, 2, 64
    q, k, v = _mk(b, t, h, hkv, d, seed=4)
    mask = _mask(b, t, [t])

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
                                   err_msg=f"grad d{name} mismatch")


def _window_mask(b, t, lengths, window, s=None):
    s = t if s is None else s
    key_valid = jnp.arange(s)[None, :] < jnp.asarray(lengths)[:, None]
    q_idx = jnp.arange(t)[:, None]
    k_idx = jnp.arange(s)[None, :]
    m = (k_idx <= q_idx) & (k_idx > q_idx - window)
    return jnp.broadcast_to(m[None, None] & key_valid[:, None, None, :], (b, 1, t, s))


def test_keys_longer_than_queries():
    """Prefill writing into a preallocated KV cache: k/v span the whole cache
    (f_len + max_new_tokens), q only the prompt. Round-1 crashed here with a
    negative pad width (ADVICE.md high)."""
    b, t, s, h, d = 2, 48, 48 + 128, 4, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    lengths = [48, 31]
    # Cache slots past `lengths` are dead space — zero them like a real cache.
    key_valid = np.arange(s)[None, :] < np.asarray(lengths)[:, None]
    k = k * key_valid[:, :, None, None]
    v = v * key_valid[:, :, None, None]

    out = flash_attention(q, k, v, lengths=jnp.asarray(lengths))
    full_mask = _mask(b, s, lengths)[:, :, :t, :]  # causal rows 0..t-1 over all s keys
    ref = attention_reference(q, k, v, full_mask)
    for i, L in enumerate(lengths):
        valid_rows = min(L, t)
        np.testing.assert_allclose(np.asarray(out[i, :valid_rows]), np.asarray(ref[i, :valid_rows]),
                                   atol=2e-5, rtol=2e-5)


def test_keys_longer_than_queries_mask_recovery():
    """Same prefill shape, but lengths recovered from the [B,1,T,S] mask the
    decoder actually passes."""
    b, t, s, h, d = 1, 32, 192, 2, 64
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    mask = _mask(b, s, [20])[:, :, :t, :]
    out = flash_attention(q, k, v, mask=mask)
    ref = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out[0, :20]), np.asarray(ref[0, :20]), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,window,lengths", [(256, 100, [256, 256]), (384, 130, [384, 300])])
def test_sliding_window_forward(t, window, lengths):
    """Mistral-style sliding window: must match the masked reference when
    window < seq (round 1 silently ignored the window on the pallas path)."""
    b, h, d = 2, 4, 64
    q, k, v = _mk(b, t, h, h, d, seed=9)
    mask = _window_mask(b, t, lengths, window)
    out = flash_attention(q, k, v, mask=mask, window=window)
    ref = attention_reference(q, k, v, mask)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out[i, :L]), np.asarray(ref[i, :L]), atol=2e-5, rtol=2e-5)


def test_sliding_window_gradients():
    b, t, h, d = 1, 256, 2, 64
    window = 96
    q, k, v = _mk(b, t, h, h, d, seed=10)
    mask = _window_mask(b, t, [t], window)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask, window=window) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
                                   err_msg=f"grad d{name} mismatch")


def test_sliding_window_wider_than_seq_is_dense():
    """window >= seq must be identical to dense causal (the VLA configs:
    2048-token context, 4096 Mistral window)."""
    b, t, h, d = 1, 128, 2, 64
    q, k, v = _mk(b, t, h, h, d, seed=11)
    out_w = flash_attention(q, k, v, window=4096)
    out_d = flash_attention(q, k, v)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_d))


def test_bf16_inputs():
    b, t, h, d = 1, 128, 2, 64
    q, k, v = _mk(b, t, h, h, d, seed=5, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, k, v, _mask(b, t, [t]))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=3e-2, rtol=3e-2
    )
