"""Composed-system parity: our fully-jitted predict_action vs an independent
torch path built from HF components (Dinov2WithRegisters + SiglipVision +
LlamaForCausalLM.generate) glued per the reference's documented contract
(modeling_prismatic.py:325-534 — fuse-after-BOS, greedy decode of action_dim
tokens, vocab_size - token_id binning, q01/q99 unnormalize).

The reference's own HF modeling file hard-imports timm (absent in this
container), so this is the strongest achievable composite proof: every stage
runs through an independent implementation and the final action tokens must
agree EXACTLY (integer equality), actions to float tolerance.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridgelang_tpu.models.load import convert_hf_state_dict  # noqa: E402
from bridgelang_tpu.models.vision.hf_convert import convert_hf_dinov2, convert_hf_siglip  # noqa: E402
from bridgelang_tpu.models.vision.vit import ViTConfig  # noqa: E402
from bridgelang_tpu.models.vla import OpenVLA  # noqa: E402
from bridgelang_tpu.models.vlm import VLMConfig  # noqa: E402
from tests.helpers import TINY_LLM  # noqa: E402

DEPTH = 4
DINO_CFG = ViTConfig(image_size=32, patch_size=8, width=32, depth=DEPTH, num_heads=4, mlp_dim=128,
                     use_cls_token=True, num_reg_tokens=4, no_embed_class=True, layerscale_init=1e-5)
SIG_CFG = ViTConfig(image_size=32, patch_size=8, width=48, depth=DEPTH, num_heads=4, mlp_dim=96,
                    use_cls_token=False, act="gelu_tanh")
VISION_DIM = DINO_CFG.width + SIG_CFG.width  # 80
ACTION_DIM = 7
NORM_STATS = {"bridge_orig": {"action": {
    "q01": [-0.03, -0.05, -0.06, -0.13, -0.12, -0.43, 0.0],
    "q99": [0.03, 0.04, 0.06, 0.13, 0.12, 0.43, 1.0],
    "mask": [True, True, True, True, True, True, False],
}}}


@pytest.fixture(scope="module")
def torch_stack():
    from transformers import (
        Dinov2WithRegistersConfig, Dinov2WithRegistersModel,
        LlamaConfig, LlamaForCausalLM,
        SiglipVisionConfig, SiglipVisionModel,
    )

    torch.manual_seed(0)
    dino = Dinov2WithRegistersModel(Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=DEPTH, num_attention_heads=4, mlp_ratio=4,
        image_size=32, patch_size=8, num_register_tokens=4, layerscale_value=1.0,
    )).eval()
    sig = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=48, num_hidden_layers=DEPTH, num_attention_heads=4, intermediate_size=96,
        image_size=32, patch_size=8, hidden_act="gelu_pytorch_tanh",
    )).eval()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=TINY_LLM.padded_vocab_size, hidden_size=TINY_LLM.dim,
        intermediate_size=TINY_LLM.intermediate_size, num_hidden_layers=TINY_LLM.n_layers,
        num_attention_heads=TINY_LLM.n_heads, num_key_value_heads=TINY_LLM.n_kv_heads,
        max_position_embeddings=TINY_LLM.max_seq_len, rms_norm_eps=TINY_LLM.norm_eps,
        attention_bias=False, tie_word_embeddings=False,
    )).eval()
    projector = torch.nn.Sequential(
        torch.nn.Linear(VISION_DIM, 4 * VISION_DIM), torch.nn.GELU(),
        torch.nn.Linear(4 * VISION_DIM, TINY_LLM.dim), torch.nn.GELU(),
        torch.nn.Linear(TINY_LLM.dim, TINY_LLM.dim),
    ).eval()
    return dino, sig, llama, projector


@pytest.fixture(scope="module")
def our_stack(torch_stack):
    dino, sig, llama, projector = torch_stack
    cfg = dataclasses.replace(
        VLMConfig(arch_specifier="no-align+fused-gelu-mlp"),
        llm=TINY_LLM, vision_override=(DINO_CFG, SIG_CFG),
    )
    model = OpenVLA(cfg, NORM_STATS, dtype=jnp.float32)

    llm_sd = {f"language_model.{k}": v.detach().numpy() for k, v in llama.state_dict().items()}
    llm = convert_hf_state_dict(llm_sd, TINY_LLM.n_layers, vit_depths={}, target_dtype=jnp.float32)["llm"]
    vision = {
        "featurizer": convert_hf_dinov2(dino.state_dict(), DINO_CFG),
        "fused_featurizer": convert_hf_siglip(sig.state_dict(), SIG_CFG),
    }
    proj = {
        f"fc{i + 1}": {"kernel": np.ascontiguousarray(projector[2 * i].weight.detach().numpy().T),
                       "bias": projector[2 * i].bias.detach().numpy()}
        for i in range(3)
    }
    params = jax.tree.map(jnp.asarray, {"vision": vision, "projector": proj, "llm": llm})
    return model, params


def _torch_predict(torch_stack, pixels6, input_ids):
    """The reference composite path: fuse-after-BOS -> GenerationMixin greedy
    -> vocab_size - ids -> bin centers -> q01/q99 unnormalize."""
    dino, sig, llama, projector = torch_stack
    pix = torch.from_numpy(pixels6)
    with torch.no_grad():
        dino_feat = dino(pix[:, :3], output_hidden_states=True).hidden_states[DEPTH - 1][:, 1 + 4:]
        sig_feat = sig(pix[:, 3:], output_hidden_states=True).hidden_states[DEPTH - 1]
        proj = projector(torch.cat([dino_feat, sig_feat], dim=-1))
        tok_emb = llama.get_input_embeddings()(torch.from_numpy(input_ids))
        fused = torch.cat([tok_emb[:, :1], proj, tok_emb[:, 1:]], dim=1)
        gen = llama.generate(
            inputs_embeds=fused, attention_mask=torch.ones(fused.shape[:2], dtype=torch.long),
            max_new_tokens=ACTION_DIM, do_sample=False, use_cache=True,
            pad_token_id=TINY_LLM.pad_token_id,
        ).numpy()[0]

    # reference de-tokenization (modeling_prismatic.py:521-534)
    bins = np.linspace(-1, 1, 256)
    bin_centers = (bins[:-1] + bins[1:]) / 2.0
    discretized = TINY_LLM.vocab_size - gen.astype(np.int64)
    normalized = bin_centers[np.clip(discretized - 1, 0, 254)]
    stats = NORM_STATS["bridge_orig"]["action"]
    q01, q99 = np.asarray(stats["q01"]), np.asarray(stats["q99"])
    mask = np.asarray(stats["mask"])
    action = np.where(mask, 0.5 * (normalized + 1) * (q99 - q01) + q01, normalized)
    return gen, action


def test_composed_action_parity(torch_stack, our_stack):
    model, params = our_stack
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 6, 32, 32)).astype(np.float32)
    # prompt: BOS + text tokens (no padding; padding invariance tested elsewhere)
    ids = np.concatenate([[1], rng.integers(3, 400, size=9)]).astype(np.int32)[None]
    mask = np.ones_like(ids)

    hf_tokens, hf_action = _torch_predict(torch_stack, pixels, ids)

    our_tokens = np.asarray(model.generate_greedy(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
        max_new_tokens=ACTION_DIM, cache_dtype=jnp.float32,
    ))[0]
    np.testing.assert_array_equal(our_tokens, hf_tokens)

    stats = NORM_STATS["bridge_orig"]["action"]
    our_action = np.asarray(model.predict_action_device(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
        jnp.asarray(stats["q01"], jnp.float32), jnp.asarray(stats["q99"], jnp.float32),
        jnp.asarray(stats["mask"]), action_dim=ACTION_DIM,
    ))[0]
    np.testing.assert_allclose(our_action, hf_action, atol=1e-5, rtol=1e-5)


def test_composed_parity_second_input(torch_stack, our_stack):
    """A second (image, prompt) pair — guards against coincidental agreement."""
    model, params = our_stack
    rng = np.random.default_rng(42)
    pixels = rng.normal(size=(1, 6, 32, 32)).astype(np.float32)
    ids = np.concatenate([[1], rng.integers(3, 500, size=14)]).astype(np.int32)[None]
    mask = np.ones_like(ids)
    hf_tokens, _ = _torch_predict(torch_stack, pixels, ids)
    our_tokens = np.asarray(model.generate_greedy(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
        max_new_tokens=ACTION_DIM, cache_dtype=jnp.float32,
    ))[0]
    np.testing.assert_array_equal(our_tokens, hf_tokens)


def test_golden_kit_replays_torch_expected(torch_stack, our_stack, tmp_path):
    """The golden-trajectory kit (scripts/verify.py --golden): the INDEPENDENT
    torch stack records expected tokens/actions into a golden bundle, and our
    replay must report every record bit-exact; a corrupted expected token must
    be reported as a failure. This is the zero-new-code path to real-weights
    bit parity (reference analogue vla-scripts/extern/verify_openvla.py:30-89)."""
    import importlib.util
    from pathlib import Path as _P

    spec = importlib.util.spec_from_file_location(
        "blx_verify", _P(__file__).parent.parent / "scripts" / "verify.py")
    verify = importlib.util.module_from_spec(spec)
    import sys as _sys

    _sys.modules["blx_verify"] = verify
    spec.loader.exec_module(verify)

    model, params = our_stack
    model.cache_dtype = jnp.float32  # exact-match decode vs the fp32 torch glue

    rng = np.random.default_rng(7)
    n = 3
    pixels = rng.normal(size=(n, 6, 32, 32)).astype(np.float32)
    ids = np.full((n, 12), TINY_LLM.pad_token_id, np.int32)
    mask = np.zeros_like(ids)
    toks, acts = [], []
    for i in range(n):
        row = np.concatenate([[1], rng.integers(3, 400, size=11)]).astype(np.int32)[None]
        ids[i], mask[i] = row[0], 1
        t, a = _torch_predict(torch_stack, pixels[i : i + 1], row)
        toks.append(t)
        acts.append(a)

    golden = tmp_path / "golden.npz"
    np.savez(golden, pixel_values=pixels, input_ids=ids, attention_mask=mask,
             unnorm_key=np.asarray("bridge_orig"),
             expected_tokens=np.stack(toks).astype(np.int32),
             expected_actions=np.stack(acts).astype(np.float32))

    n_pass, n_total, failures = verify.replay_golden(model, params, golden)
    assert (n_pass, n_total) == (n, n), failures

    # Corruption must be detected and named.
    bad = dict(np.load(golden, allow_pickle=False))
    bad["expected_tokens"] = bad["expected_tokens"].copy()
    bad["expected_tokens"][1, 3] += 1
    np.savez(tmp_path / "bad.npz", **bad)
    n_pass_b, n_total_b, failures_b = verify.replay_golden(model, params, tmp_path / "bad.npz")
    assert n_pass_b == n - 1 and any("record 1" in f for f in failures_b)
