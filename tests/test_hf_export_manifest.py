"""Golden key-manifest for the HF export contract.

The reference's converter (vla-scripts/extern/convert_openvla_weights_to_hf.py
:75-117) produces a flat state dict whose key names come from three module
trees: HF `LlamaForCausalLM` (renamed `llm.` -> `language_model.`), timm
`VisionTransformer` (prefixed `vision_backbone.featurizer.` /
`.fused_featurizer.`, DINOv2 LayerScale `gamma` -> `scale_factor`), and the
projector `nn.Sequential` index mapping (`projector.0/2/4` -> `fc1/2/3`).

`expected_manifest` below re-states that contract INDEPENDENTLY of
bridgelang_tpu.extern.hf_export (names + torch-layout shapes hand-written from
the reference's module trees); the golden JSON pins the full flagship
(openvla-7b) key set + shapes, and the tiny-model test asserts
`export_checkpoint` emits exactly the generated manifest. Any drift in an
exported key name or shape fails here.
"""

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bridgelang_tpu.models.llm.llama import LLMConfig
from bridgelang_tpu.models.vision.vit import VIT_CONFIGS, ViTConfig
from tests.helpers import TINY_LLM, TINY_VIT, TINY_VIT_B

GOLDEN = Path(__file__).parent / "golden" / "hf_export_manifest_openvla7b.json"

# Tensors present in published HF OpenVLA checkpoints that this framework
# never materializes (dead weight for the second-to-last feature tap / unused
# heads). They enter an export only via `source_hf` passthrough
# (extern/hf_export.py docstring) — asserted absent from the core manifest.
SOURCE_ONLY_KEYS = (
    "vision_backbone.featurizer.norm.weight",
    "vision_backbone.featurizer.norm.bias",
    "vision_backbone.fused_featurizer.norm.weight",
    "vision_backbone.fused_featurizer.norm.bias",
)
SOURCE_ONLY_SUBSTR = "attn_pool"  # SigLIP attention-pooling head


def _llm_keys(cfg: LLMConfig):
    """HF LlamaForCausalLM naming (torch [out, in] layouts)."""
    d, kv_dim = cfg.dim, cfg.n_kv_heads * (cfg.dim // cfg.n_heads)
    v, inter = cfg.padded_vocab_size, cfg.intermediate_size
    out = {
        "language_model.model.embed_tokens.weight": [v, d],
        "language_model.model.norm.weight": [d],
        "language_model.lm_head.weight": [v, d],
    }
    for i in range(cfg.n_layers):
        b = f"language_model.model.layers.{i}."
        out[b + "self_attn.q_proj.weight"] = [d, d]
        out[b + "self_attn.k_proj.weight"] = [kv_dim, d]
        out[b + "self_attn.v_proj.weight"] = [kv_dim, d]
        out[b + "self_attn.o_proj.weight"] = [d, d]
        out[b + "mlp.gate_proj.weight"] = [inter, d]
        out[b + "mlp.up_proj.weight"] = [inter, d]
        out[b + "mlp.down_proj.weight"] = [d, inter]
        out[b + "input_layernorm.weight"] = [d]
        out[b + "post_attention_layernorm.weight"] = [d]
    return out


def _vit_keys(cfg: ViTConfig, prefix: str):
    """timm VisionTransformer naming (DINOv2 LayerScale already renamed
    `scale_factor` per the reference converter)."""
    w, p = cfg.width, cfg.patch_size
    n_pos = cfg.num_patches + (0 if cfg.no_embed_class else cfg.num_prefix_tokens)
    out = {
        prefix + "patch_embed.proj.weight": [w, 3, p, p],
        prefix + "patch_embed.proj.bias": [w],
        prefix + "pos_embed": [1, n_pos, w],
    }
    if cfg.use_cls_token:
        out[prefix + "cls_token"] = [1, 1, w]
    if cfg.num_reg_tokens:
        out[prefix + "reg_token"] = [1, cfg.num_reg_tokens, w]
    if cfg.pre_norm:
        out[prefix + "norm_pre.weight"] = [w]
        out[prefix + "norm_pre.bias"] = [w]
    for i in range(cfg.depth):
        b = f"{prefix}blocks.{i}."
        out[b + "norm1.weight"] = [w]
        out[b + "norm1.bias"] = [w]
        out[b + "attn.qkv.weight"] = [3 * w, w]
        out[b + "attn.qkv.bias"] = [3 * w]
        out[b + "attn.proj.weight"] = [w, w]
        out[b + "attn.proj.bias"] = [w]
        out[b + "norm2.weight"] = [w]
        out[b + "norm2.bias"] = [w]
        out[b + "mlp.fc1.weight"] = [cfg.mlp_dim, w]
        out[b + "mlp.fc1.bias"] = [cfg.mlp_dim]
        out[b + "mlp.fc2.weight"] = [w, cfg.mlp_dim]
        out[b + "mlp.fc2.bias"] = [w]
        if cfg.layerscale_init is not None:
            out[b + "ls1.scale_factor"] = [w]
            out[b + "ls2.scale_factor"] = [w]
    return out


def expected_manifest(llm: LLMConfig, towers, llm_dim=None):
    """towers: {"featurizer": ViTConfig} or with "fused_featurizer" too.
    Projector: fused-gelu-mlp (vision -> 4*vision -> llm -> llm, the flagship
    arch_specifier; reference nn_utils.py FusedMLPProjector)."""
    llm_dim = llm_dim or llm.dim
    vd = sum(c.width for c in towers.values())
    out = {
        "projector.fc1.weight": [4 * vd, vd],
        "projector.fc1.bias": [4 * vd],
        "projector.fc2.weight": [llm_dim, 4 * vd],
        "projector.fc2.bias": [llm_dim],
        "projector.fc3.weight": [llm_dim, llm_dim],
        "projector.fc3.bias": [llm_dim],
    }
    out.update(_llm_keys(llm))
    for name, cfg in towers.items():
        out.update(_vit_keys(cfg, f"vision_backbone.{name}."))
    return out


def test_flagship_manifest_matches_golden():
    """The full openvla-7b export contract: 32-layer Llama-2, DINOv2-L/14
    featurizer, SigLIP-so400m fused featurizer, fused-gelu-mlp projector.
    Regenerate the golden with
    `python -m tests.test_hf_export_manifest` ONLY after re-validating the
    change against the reference converter's mapping."""
    from bridgelang_tpu.models.llm.llama import LLM_CONFIGS

    manifest = expected_manifest(
        LLM_CONFIGS["llama2-7b-pure"],
        {"featurizer": VIT_CONFIGS["dinov2-vit-l"],
         "fused_featurizer": VIT_CONFIGS["siglip-vit-so400m"]},
    )
    golden = json.loads(GOLDEN.read_text())
    assert manifest == golden, (
        sorted(set(manifest) ^ set(golden))[:10] or
        [k for k in manifest if manifest[k] != golden.get(k)][:10]
    )
    # Spot anchors straight from the published openvla-7b checkpoint geometry.
    assert golden["language_model.model.embed_tokens.weight"] == [32064, 4096]
    assert golden["language_model.model.layers.31.mlp.down_proj.weight"] == [4096, 11008]
    assert golden["projector.fc1.weight"] == [8704, 2176]
    assert golden["vision_backbone.featurizer.blocks.23.ls2.scale_factor"] == [1024]
    assert golden["vision_backbone.fused_featurizer.blocks.26.mlp.fc1.weight"] == [4304, 1152]
    assert golden["vision_backbone.featurizer.reg_token"] == [1, 4, 1024]
    assert not any(
        k in SOURCE_ONLY_KEYS or SOURCE_ONLY_SUBSTR in k for k in golden
    ), "dead/source-only tensors must not enter the core manifest"


def test_export_checkpoint_emits_manifest_exactly(tmp_path):
    """Strict key+shape equality between export_checkpoint's output and the
    independently-generated manifest, on a real (tiny, fused-tower) model."""
    from safetensors.numpy import load_file

    from bridgelang_tpu.extern.hf_export import export_checkpoint
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig

    tiny_a = dataclasses.replace(TINY_VIT, layerscale_init=1e-5)  # DINO-style
    cfg = dataclasses.replace(
        VLMConfig(), llm=TINY_LLM, vision_override=(tiny_a, TINY_VIT_B),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    model = PrismaticVLM(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))
    model.norm_stats = {}
    out = export_checkpoint(model, params, tmp_path / "export")
    sd = load_file(str(out / "model.safetensors"))

    manifest = expected_manifest(
        TINY_LLM, {"featurizer": tiny_a, "fused_featurizer": TINY_VIT_B})
    assert set(sd) == set(manifest), sorted(set(sd) ^ set(manifest))[:12]
    for k, shape in manifest.items():
        assert list(sd[k].shape) == shape, (k, sd[k].shape, shape)


if __name__ == "__main__":
    # Regenerate the golden manifest (review the diff against the reference
    # converter before committing).
    from bridgelang_tpu.models.llm.llama import LLM_CONFIGS

    manifest = expected_manifest(
        LLM_CONFIGS["llama2-7b-pure"],
        {"featurizer": VIT_CONFIGS["dinov2-vit-l"],
         "fused_featurizer": VIT_CONFIGS["siglip-vit-so400m"]},
    )
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN.write_text(json.dumps(manifest, indent=0) + "\n")
    print(f"wrote {GOLDEN} ({len(manifest)} keys)")
