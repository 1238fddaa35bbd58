"""Numerical parity against HF transformers Llama on shared random weights —
the strongest correctness evidence for RoPE/GQA/norm/SwiGLU conventions and
for the HF->pytree weight conversion (bridgelang_tpu.models.load)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridgelang_tpu.models.llm.llama import LLMConfig, embed_tokens, llm_forward, lm_logits  # noqa: E402
from bridgelang_tpu.models.load import convert_hf_state_dict  # noqa: E402

TINY = LLMConfig(
    vocab_size=128, padded_vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
    intermediate_size=96, max_seq_len=128, pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=TINY.padded_vocab_size,
        hidden_size=TINY.dim,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.n_layers,
        num_attention_heads=TINY.n_heads,
        num_key_value_heads=TINY.n_kv_heads,
        max_position_embeddings=TINY.max_seq_len,
        rms_norm_eps=TINY.norm_eps,
        rope_theta=TINY.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    return model


def _convert(hf_model):
    sd = {f"language_model.{k}": v.detach().numpy() for k, v in hf_model.state_dict().items()}
    # convert_hf_state_dict also wants vision/projector keys absent -> fine
    params = convert_hf_state_dict(sd, TINY.n_layers, vit_depths={}, target_dtype=jnp.float32)
    return params["llm"]


def test_logits_match_hf(hf_model):
    params = _convert(hf_model)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 127, size=(2, 9))

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()

    x = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(9), (2, 9))
    causal = jnp.broadcast_to(
        (jnp.arange(9)[None, :] <= jnp.arange(9)[:, None])[None, None], (2, 1, 9, 9)
    )
    h, _ = llm_forward(params, TINY, x, pos, causal)
    ours = np.asarray(lm_logits(params, h, TINY))

    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_greedy_decode_matches_hf(hf_model):
    params = _convert(hf_model)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 127, size=(1, 6))

    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor(ids), max_new_tokens=5, do_sample=False,
            pad_token_id=0, use_cache=True,
        ).numpy()[0, 6:]

    # our KV-cache greedy rollout
    from bridgelang_tpu.models.llm.llama import init_kv_cache

    T, N = 6, 5
    S = T + N
    cache = init_kv_cache(TINY, 1, S, dtype=jnp.float32)
    x = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(T)[None, :]
    mask = jnp.broadcast_to((jnp.arange(S)[None, :] <= jnp.arange(T)[:, None])[None, None], (1, 1, T, S))
    h, cache = llm_forward(params, TINY, x, pos, mask, cache=cache, cache_positions=pos)
    tok = int(np.argmax(np.asarray(lm_logits(params, h[:, -1:], TINY))))
    out = [tok]
    for step in range(1, N):
        p = jnp.asarray([[T + step - 1]])
        m = jnp.broadcast_to((jnp.arange(S)[None, None, None, :] <= T + step - 1), (1, 1, 1, S))
        h, cache = llm_forward(
            params, TINY, embed_tokens(params, jnp.asarray([[tok]])), p, m, cache=cache, cache_positions=p
        )
        tok = int(np.argmax(np.asarray(lm_logits(params, h, TINY))))
        out.append(tok)

    np.testing.assert_array_equal(np.asarray(out), hf_out)


def test_w8a8_quantized_logits_track_fp(hf_model):
    """The w8a8 serving mode (per-token activation quant onto the int8 MXU)
    must track the fp32 logits closely enough that greedy decode agrees —
    the validation gating its use for bench prefill (VERDICT round 1, #3)."""
    import dataclasses

    from bridgelang_tpu.ops.quant import quantize_llm_int8

    params = _convert(hf_model)
    qparams = quantize_llm_int8(params)
    cfg8 = dataclasses.replace(TINY, w8a8=True)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 127, size=(2, 12))
    x = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    causal = jnp.broadcast_to(
        (jnp.arange(12)[None, :] <= jnp.arange(12)[:, None])[None, None], (2, 1, 12, 12)
    )
    h_fp, _ = llm_forward(params, TINY, x, pos, causal)
    logits_fp = np.asarray(lm_logits(params, h_fp, TINY), np.float32)

    xq = embed_tokens(qparams, jnp.asarray(ids), dtype=jnp.float32)
    h_q, _ = llm_forward(qparams, cfg8, xq, pos, causal)
    logits_q = np.asarray(lm_logits(qparams, h_q, TINY), np.float32)

    # high cosine similarity per position and identical greedy argmax
    a = logits_fp.reshape(-1, logits_fp.shape[-1])
    b = logits_q.reshape(-1, logits_q.shape[-1])
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.95, agree
