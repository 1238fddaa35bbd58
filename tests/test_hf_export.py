"""Round-trip: our pytree -> HF state dict -> back, equality on every tensor."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.extern.hf_export import export_checkpoint, export_llm_state_dict
from bridgelang_tpu.models.llm.llama import init_llm_params
from bridgelang_tpu.models.load import convert_hf_state_dict
from bridgelang_tpu.models.vision.vit import ViT
from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
from tests.helpers import TINY_LLM, TINY_VIT


def test_llm_roundtrip():
    llm = init_llm_params(jax.random.key(0), TINY_LLM)
    sd = export_llm_state_dict(llm)
    back = convert_hf_state_dict(sd, TINY_LLM.n_layers, vit_depths={}, target_dtype=jnp.float32)["llm"]
    for key in ("embed", "final_norm", "lm_head"):
        np.testing.assert_allclose(np.asarray(back[key]), np.asarray(llm[key]), atol=1e-6)
    for key in llm["layers"]:
        np.testing.assert_allclose(np.asarray(back["layers"][key]), np.asarray(llm["layers"][key]),
                                   atol=1e-6, err_msg=key)


def test_export_int8_llm_dequantizes():
    """Exporting int8 serving weights must write codes * scale, never raw
    codes (ADVICE.md — round 1 wrote int8 codes as float32)."""
    from bridgelang_tpu.ops.quant import dequantize_llm_int8, quantize_llm_int8

    llm = init_llm_params(jax.random.key(0), TINY_LLM)
    qllm = quantize_llm_int8(llm)
    sd_q = export_llm_state_dict(qllm)
    sd_deq = export_llm_state_dict(dequantize_llm_int8(qllm, dtype=jnp.float32))
    assert set(sd_q) == set(sd_deq)
    for k in sd_q:
        np.testing.assert_allclose(sd_q[k], sd_deq[k], atol=1e-3, err_msg=k)
    # sanity: dequantized embed is close to the original fp weights
    np.testing.assert_allclose(sd_q["language_model.model.embed_tokens.weight"],
                               np.asarray(llm["embed"]), atol=2e-3)


def test_export_checkpoint_loads_back(tmp_path):
    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    model.norm_stats = {"bridge_orig": {"action": {"q01": [0.0] * 7, "q99": [1.0] * 7}}}
    out = export_checkpoint(model, params, tmp_path / "export")
    assert (out / "model.safetensors").exists()
    hf_cfg = json.loads((out / "config.json").read_text())
    assert hf_cfg["model_type"] == "openvla"
    assert hf_cfg["arch_specifier"] == cfg.arch_specifier

    # reload the safetensors and convert the vision tower back
    from safetensors.numpy import load_file

    sd = load_file(str(out / "model.safetensors"))
    back = convert_hf_state_dict(sd, TINY_LLM.n_layers,
                                 vit_depths={"featurizer": TINY_VIT.depth}, target_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["vision"]["blocks"]["qkv"]["kernel"]),
        np.asarray(params["vision"]["blocks"]["qkv"]["kernel"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(back["projector"]["fc1"]["kernel"]),
        np.asarray(params["projector"]["fc1"]["kernel"]), atol=1e-6,
    )
    # zero-filled final block present for HF-side strict=False load
    assert f"vision_backbone.featurizer.blocks.{TINY_VIT.depth-1}.attn.qkv.weight" in sd


def test_export_with_source_passthrough(tmp_path):
    """With source_hf given, zero-filled dead tensors (final ViT block) take
    the SOURCE values and source-only tensors (e.g. SigLIP attention pool)
    pass through — the export becomes strict=True-loadable under HF."""
    from safetensors.numpy import load_file, save_file

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    model.norm_stats = {}

    # export once (zero-filled final block), then craft a "source" checkpoint
    # with a real-valued final block and one extra head tensor
    first = export_checkpoint(model, params, tmp_path / "zero")
    sd = load_file(str(first / "model.safetensors"))
    final_block = [k for k in sd if f"blocks.{TINY_VIT.depth - 1}." in k]
    assert final_block and all((sd[k] == 0).all() for k in final_block)

    src = dict(sd)
    for k in final_block:
        src[k] = np.full_like(sd[k], 3.5)
    src["vision_backbone.featurizer.attn_pool.latent"] = np.ones((1, 4), np.float32)
    (tmp_path / "source").mkdir()
    save_file(src, str(tmp_path / "source" / "model.safetensors"))

    out = export_checkpoint(model, params, tmp_path / "full", source_hf=tmp_path / "source")
    sd2 = load_file(str(out / "model.safetensors"))
    for k in final_block:
        assert (sd2[k] == 3.5).all(), k  # dead tensors took source values
    assert "vision_backbone.featurizer.attn_pool.latent" in sd2  # passthrough
    # real (trained) tensors are OURS, not the source's
    np.testing.assert_allclose(sd2["projector.fc1.bias"], sd["projector.fc1.bias"])
