"""LLM decoder tests: cache-parity is THE correctness test — prefill+decode
through the KV cache must reproduce the no-cache full forward exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgelang_tpu.models.llm.llama import (
    LLM_CONFIGS,
    embed_tokens,
    init_kv_cache,
    init_llm_params,
    llm_forward,
    lm_logits,
    rope_cos_sin,
    apply_rope,
)
from tests.helpers import TINY_LLM


@pytest.fixture(scope="module")
def setup():
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 500, size=(2, 12)), dtype=jnp.int32)
    return params, ids


def _causal(b, t, s=None):
    s = t if s is None else s
    m = jnp.arange(s)[None, :] <= jnp.arange(t)[:, None]
    return jnp.broadcast_to(m[None, None], (b, 1, t, s))


def test_full_forward_shapes(setup):
    params, ids = setup
    x = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    h, cache = llm_forward(params, TINY_LLM, x, pos, _causal(2, 12))
    assert h.shape == (2, 12, TINY_LLM.dim)
    assert cache is None
    logits = lm_logits(params, h, TINY_LLM)
    assert logits.shape == (2, 12, TINY_LLM.padded_vocab_size)


def test_causality(setup):
    params, ids = setup
    x = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    h0, _ = llm_forward(params, TINY_LLM, x, pos, _causal(2, 12))
    # Changing token 8 must not affect hidden states at positions < 8
    ids2 = ids.at[:, 8].set(7)
    h1, _ = llm_forward(params, TINY_LLM, embed_tokens(params, ids2), pos, _causal(2, 12))
    np.testing.assert_allclose(np.asarray(h0[:, :8]), np.asarray(h1[:, :8]), atol=1e-5)
    assert not np.allclose(np.asarray(h0[:, 8:]), np.asarray(h1[:, 8:]))


def test_cache_parity_with_full_forward(setup):
    """Prefill first 8 tokens into the cache, decode 4 more one-by-one; the
    per-step hidden states must match the full 12-token forward."""
    params, ids = setup
    B, T, PRE = 2, 12, 8
    x = embed_tokens(params, ids)
    pos_full = jnp.broadcast_to(jnp.arange(T), (B, T))
    h_full, _ = llm_forward(params, TINY_LLM, x, pos_full, _causal(B, T))

    cache = init_kv_cache(TINY_LLM, B, T, dtype=jnp.float32)
    pos_pre = jnp.broadcast_to(jnp.arange(PRE), (B, PRE))
    h_pre, cache = llm_forward(
        params, TINY_LLM, x[:, :PRE], pos_pre, _causal(B, PRE, s=T), cache=cache, cache_positions=pos_pre
    )
    np.testing.assert_allclose(np.asarray(h_pre), np.asarray(h_full[:, :PRE]), atol=1e-4)

    for step in range(PRE, T):
        pos = jnp.full((B, 1), step, dtype=jnp.int32)
        mask = (jnp.arange(T)[None, None, None, :] <= step)
        h_step, cache = llm_forward(
            params, TINY_LLM, x[:, step : step + 1], pos, jnp.broadcast_to(mask, (B, 1, 1, T)),
            cache=cache, cache_positions=pos,
        )
        np.testing.assert_allclose(
            np.asarray(h_step[:, 0]), np.asarray(h_full[:, step]), atol=1e-4,
            err_msg=f"decode step {step} diverges from full forward",
        )


def test_gqa_kv_cache_shape(setup):
    params, _ = setup
    cache = init_kv_cache(TINY_LLM, 2, 16)
    assert cache["k"].shape == (TINY_LLM.n_layers, 2, 16, TINY_LLM.n_kv_heads, TINY_LLM.head_dim)


def test_remat_matches_no_remat(setup):
    params, ids = setup
    x = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    h0, _ = llm_forward(params, TINY_LLM, x, pos, _causal(2, 12), remat=False)
    h1, _ = llm_forward(params, TINY_LLM, x, pos, _causal(2, 12), remat=True)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)


def test_rope_rotation_is_position_dependent():
    pos = jnp.asarray([[0, 1, 5]])
    cos, sin = rope_cos_sin(pos, rotary_dim=8, theta=10000.0)
    x = jnp.ones((1, 3, 2, 8))
    out = apply_rope(x, cos, sin, 8)
    assert out.shape == x.shape
    # Position 0 is identity (cos=1, sin=0)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.ones((2, 8)), atol=1e-6)
    assert not np.allclose(np.asarray(out[0, 1]), np.asarray(out[0, 2]))


def test_partial_rotary_preserves_pass_through_dims():
    pos = jnp.asarray([[3]])
    cos, sin = rope_cos_sin(pos, rotary_dim=4, theta=10000.0)
    x = jnp.ones((1, 1, 1, 8))
    out = apply_rope(x, cos, sin, 4)
    np.testing.assert_allclose(np.asarray(out[..., 4:]), 1.0, atol=1e-7)
    assert not np.allclose(np.asarray(out[..., :4]), 1.0)


def test_phi_architecture_forward():
    cfg = dataclasses.replace(
        LLM_CONFIGS["phi-2-3b"], vocab_size=128, padded_vocab_size=192, dim=80, n_layers=2,
        n_heads=4, n_kv_heads=4, intermediate_size=64, pad_token_id=128,  # head_dim 20 -> rotary_dim 8
    )
    params = init_llm_params(jax.random.key(1), cfg)
    ids = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    x = embed_tokens(params, ids)
    pos = jnp.arange(4)[None, :]
    h, _ = llm_forward(params, cfg, x, pos, _causal(1, 4))
    logits = lm_logits(params, h, cfg)
    assert logits.shape == (1, 4, 192)
    assert np.isfinite(np.asarray(logits)).all()


def test_published_config_dims():
    c7 = LLM_CONFIGS["llama2-7b-pure"]
    assert (c7.dim, c7.n_layers, c7.intermediate_size, c7.padded_vocab_size) == (4096, 32, 11008, 32064)
    c13 = LLM_CONFIGS["llama2-13b-pure"]
    assert (c13.dim, c13.n_layers, c13.intermediate_size) == (5120, 40, 13824)
    cm = LLM_CONFIGS["mistral-v0.1-7b-pure"]
    assert (cm.n_kv_heads, cm.intermediate_size) == (8, 14336)


def test_sliding_window_mask():
    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.models.vision.vit import ViT
    from tests.helpers import TINY_VIT

    cfg_llm = dataclasses.replace(TINY_LLM, sliding_window=3)
    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        model = vlm_mod.PrismaticVLM(dataclasses.replace(VLMConfig(), llm=cfg_llm), dtype=jnp.float32)
    finally:
        vlm_mod.build_vision_backbone = orig
    mask = np.asarray(model._causal_mask(jnp.ones((1, 6), jnp.int32)))
    # row 5 can see keys 3,4,5 only (window 3)
    assert mask[0, 0, 5].tolist() == [False, False, False, True, True, True]
    # row 2 sees 0,1,2 (window not yet clipping)
    assert mask[0, 0, 2].tolist() == [True, True, True, False, False, False]


def test_contiguous_cache_write_matches_scatter():
    """The prefill fast path (cache_write='contiguous' + chunk-extent mask)
    must produce the same hidden states and the same cache as the scatter
    path with arange positions — fresh caches hold nothing beyond the chunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.llm.llama import LLMConfig, init_kv_cache, init_llm_params, llm_forward

    cfg = LLMConfig(vocab_size=64, padded_vocab_size=128, dim=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, intermediate_size=64, max_seq_len=64, pad_token_id=64)
    params = init_llm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    b, t, extra = 2, 12, 5
    s = t + extra
    x = jnp.asarray(rng.normal(size=(b, t, 32)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    lengths = jnp.asarray([9, 12])
    k_idx_s = jnp.arange(s)[None, None, None, :]
    mask_s = (k_idx_s <= jnp.arange(t)[None, None, :, None]) & (k_idx_s < lengths[:, None, None, None])
    k_idx_t = jnp.arange(t)[None, None, None, :]
    mask_t = (k_idx_t <= jnp.arange(t)[None, None, :, None]) & (k_idx_t < lengths[:, None, None, None])

    h_sc, c_sc = llm_forward(params, cfg, x, pos, mask_s,
                             cache=init_kv_cache(cfg, b, s, dtype=jnp.float32),
                             cache_positions=pos, attention_impl="einsum")
    h_ct, c_ct = llm_forward(params, cfg, x, pos, mask_t,
                             cache=init_kv_cache(cfg, b, s, dtype=jnp.float32),
                             cache_positions=pos, attention_impl="einsum",
                             cache_write="contiguous")
    # Not bit-identical: the attention einsum runs over S=17 vs T=12 keys, XLA
    # tiles the reductions differently, and deeper layers' K/V inherit the
    # epsilon through the residual — equality is to fp32 rounding.
    np.testing.assert_allclose(np.asarray(h_sc), np.asarray(h_ct), atol=1e-5, rtol=1e-5)
    for k in ("k", "v"):
        np.testing.assert_allclose(np.asarray(c_sc[k])[:, :, :t], np.asarray(c_ct[k])[:, :, :t],
                                   atol=1e-5, rtol=1e-5)
        # slots past the chunk stay zero on both paths
        np.testing.assert_array_equal(np.asarray(c_ct[k])[:, :, t:], 0.0)


def test_int8_kv_cache_close_to_bf16():
    """int8 KV cache (codes + per-(token, head) scales): prefill+decode
    hidden states track the full-precision cache within quantization noise,
    both cache-write modes, and the cache carries the scale leaves."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.llm.llama import LLMConfig, init_kv_cache, init_llm_params, llm_forward

    cfg = LLMConfig(vocab_size=64, padded_vocab_size=128, dim=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, intermediate_size=64, max_seq_len=64, pad_token_id=64)
    params = init_llm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 10
    s = t + 3
    x = jnp.asarray(rng.normal(size=(b, t, 32)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    mask_t = (jnp.arange(t)[None, None, :, None] >= jnp.arange(t)[None, None, None, :])
    mask_t = jnp.broadcast_to(jnp.transpose(mask_t, (0, 1, 2, 3)), (b, 1, t, t))

    h_ref, c_ref = llm_forward(params, cfg, x, pos, mask_t,
                               cache=init_kv_cache(cfg, b, s, dtype=jnp.float32),
                               cache_positions=pos, attention_impl="einsum",
                               cache_write="contiguous")
    h_q, c_q = llm_forward(params, cfg, x, pos, mask_t,
                           cache=init_kv_cache(cfg, b, s, dtype=jnp.int8),
                           cache_positions=pos, attention_impl="einsum",
                           cache_write="contiguous")
    assert c_q["k"].dtype == jnp.int8 and "k_scale" in c_q and "v_scale" in c_q
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_ref), atol=0.05, rtol=0.05)

    # decode step: one token through the quantized cache (scatter path)
    tok_pos = jnp.full((b, 1), t, jnp.int32)
    xt = jnp.asarray(rng.normal(size=(b, 1, 32)), jnp.float32)
    k_idx = jnp.arange(s)[None, None, None, :]
    m_step = k_idx <= tok_pos[:, :, None, None]
    h1_ref, _ = llm_forward(params, cfg, xt, tok_pos, m_step, cache=c_ref,
                            cache_positions=tok_pos, attention_impl="einsum")
    h1_q, c1_q = llm_forward(params, cfg, xt, tok_pos, m_step, cache=c_q,
                             cache_positions=tok_pos, attention_impl="einsum")
    np.testing.assert_allclose(np.asarray(h1_q), np.asarray(h1_ref), atol=0.05, rtol=0.05)
    # the decode token's K landed as int8 codes with a fresh scale
    assert float(jnp.max(jnp.abs(c1_q["k_scale"][:, :, t]))) > 0.0


def test_generation_with_int8_cache_runs():
    """Whole-model generation with model.cache_dtype = int8 emits tokens that
    match the bf16-cache decode on a tiny model (wide logit margins)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from tests.helpers import TINY_LLM, TINY_VIT

    cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM, vision_override=TINY_VIT)
    model = PrismaticVLM(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, t = 2, 12
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    m = np.zeros((b, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:9] = rng.integers(3, 500, size=(b, 8))
    m[:, :9] = 1
    px = jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32)

    toks_bf = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(m), px, max_new_tokens=5)
    model.cache_dtype = jnp.int8
    toks_q = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(m), px, max_new_tokens=5)
    assert toks_q.shape == (b, 5)
    # tiny random models have wide margins; int8 KV noise must not flip them
    np.testing.assert_array_equal(np.asarray(toks_q), np.asarray(toks_bf))


@pytest.mark.slow
def test_speculative_with_int8_cache_matches_greedy():
    """generate_speculative with the int8 KV cache: the while_loop carries the
    4-leaf quantized cache, and outputs still match generate_greedy under the
    same cache dtype (the margin gate gives greedy-equivalence)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from tests.helpers import TINY_LLM, TINY_VIT

    cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM, vision_override=TINY_VIT)
    model = PrismaticVLM(cfg, dtype=jnp.float32)
    model.cache_dtype = jnp.int8
    params = model.init_params(jax.random.key(3))
    rng = np.random.default_rng(1)
    b, t = 2, 12
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    m = np.zeros((b, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:9] = rng.integers(3, 500, size=(b, 8))
    m[:, :9] = 1
    px = jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32)

    greedy = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(m), px, max_new_tokens=5)
    for draft in (np.zeros((b, 5), np.int32), np.asarray(greedy)):
        spec = model.generate_speculative(params, jnp.asarray(ids), jnp.asarray(m), px,
                                          jnp.asarray(draft, jnp.int32))
        np.testing.assert_array_equal(np.asarray(spec), np.asarray(greedy))


def test_quantize_activations_per_token_contract():
    """The shared w8a8/w4a8 activation quantizer (ops/quant.py): exact
    dequant bound, zero-row guard, int8 range."""
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.ops.quant import quantize_activations_per_token

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)) * 3.0, jnp.float32)
    q, s = quantize_activations_per_token(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 1)
    # absmax maps to ±127 exactly; everything dequantizes within half a bin
    deq = np.asarray(q, np.float32) * np.asarray(s)
    bin_half = np.asarray(s)[..., 0] / 2
    assert (np.abs(deq - np.asarray(x)).max(axis=-1) <= bin_half + 1e-6).all()
    assert int(np.abs(np.asarray(q)).max()) == 127

    zero_row = jnp.zeros((1, 1, 64), jnp.float32)
    q0, s0 = quantize_activations_per_token(zero_row)
    assert float(np.asarray(s0)[0, 0, 0]) == 1.0
    assert not np.asarray(q0).any()


@pytest.mark.slow
def test_speculative_verify_chunk_stays_greedy_equivalent_past_w8a8_gate():
    """action_dim >= W8A8_MIN_CHUNK regression: an int8+w8a8 model's
    speculative VERIFY chunk (T = n >= 8) must not cross onto the
    int8-activation matmul path while sequential decode (T=1) runs the
    bf16-dequant branch — the activation-quant logit shift exceeds what the
    margin gate is sized for, silently breaking greedy-equivalence for
    long-action (e.g. bimanual 14-DoF) models."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.llm.llama import W8A8_MIN_CHUNK
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.ops.quant import quantize_llm_int8
    from tests.helpers import TINY_LLM, TINY_VIT

    n = W8A8_MIN_CHUNK  # verify chunk length that crosses the gate
    cfg = dataclasses.replace(VLMConfig(), llm=dataclasses.replace(TINY_LLM, w8a8=True),
                              vision_override=TINY_VIT)
    model = PrismaticVLM(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(3))
    params["llm"] = quantize_llm_int8(params["llm"])
    rng = np.random.default_rng(1)
    b, t = 2, 12
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    m = np.zeros((b, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:9] = rng.integers(3, 500, size=(b, 8))
    m[:, :9] = 1
    px = jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32)

    greedy = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(m), px, max_new_tokens=n)
    for draft in (np.zeros((b, n), np.int32), np.asarray(greedy)):
        # margin_threshold=0 accepts every positive-margin position, so any
        # verify-vs-decode numerics mismatch shows up as a token diff here.
        spec = model.generate_speculative(params, jnp.asarray(ids), jnp.asarray(m), px,
                                          jnp.asarray(draft, jnp.int32), margin_threshold=0.0)
        np.testing.assert_array_equal(np.asarray(spec), np.asarray(greedy))

    # Tiny weights may not flip an argmax, so also pin the MECHANISM: count
    # activation-quant calls — speculative must quantize exactly as often as
    # greedy (prefill only; the verify chunk and fix-up loop stay bf16).
    import bridgelang_tpu.ops.quant as quant_mod

    real = quant_mod.quantize_activations_per_token
    calls = {"n": 0}

    def counting(x):
        calls["n"] += 1
        return real(x)

    quant_mod.quantize_activations_per_token = counting
    try:
        model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(m), px, max_new_tokens=n)
        greedy_calls = calls["n"]
        calls["n"] = 0
        model.generate_speculative(params, jnp.asarray(ids), jnp.asarray(m), px,
                                   jnp.asarray(np.asarray(greedy), jnp.int32), margin_threshold=0.0)
        assert calls["n"] == greedy_calls > 0, (
            f"speculative quantized activations {calls['n']}x vs greedy {greedy_calls}x — "
            "the verify chunk crossed the W8A8_MIN_CHUNK gate")
    finally:
        quant_mod.quantize_activations_per_token = real
