"""Export BridgeLang-TPU checkpoints to the HF OpenVLA format.

Counterpart of reference vla-scripts/extern/convert_openvla_weights_to_hf.py
(:73-272) run in the forward direction: our explicit pytrees -> the flat
`language_model.* / vision_backbone.* / projector.*` state dict +
OpenVLAConfig-schema config.json + dataset_statistics.json, written as
safetensors, so checkpoints trained here load in the reference's
`trust_remote_code` HF stack.

Known delta: this framework never materializes the final ViT block of each
tower (dead weight for the second-to-last feature tap) nor SigLIP's attention
pooling head. By default exported checkpoints carry zeros for those tensors
(strict=False on the HF side; they do not affect any output); pass
`source_hf=<original checkpoint dir>` to export_checkpoint to pass the real
values through and produce a strict=True-loadable checkpoint.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _np(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def export_llm_state_dict(llm: Dict[str, Any], prefix: str = "language_model.",
                          int4_shards: int = 1) -> Dict[str, np.ndarray]:
    """`int4_shards`: pack-time n_shards of a packed-int4 source (quant.py::
    pack_layout_tag — tensor-parallel artifacts shard-block the pairing;
    dequantizing with the wrong value permutes columns silently). Training
    checkpoints pack globally, so the default covers every finetune.py run."""
    import jax
    import jax.numpy as jnp

    if any(x.dtype == jnp.int8 for x in jax.tree_util.tree_leaves(llm)):
        # int8 codes are meaningless without their scales; export real weights.
        from bridgelang_tpu.ops.quant import dequantize_llm_int8

        llm = dequantize_llm_int8(llm, int4_shards=int4_shards)
    out: Dict[str, np.ndarray] = {
        prefix + "model.embed_tokens.weight": _np(llm["embed"]),
        prefix + "model.norm.weight": _np(llm["final_norm"]),
        prefix + "lm_head.weight": _t(llm["lm_head"]),
    }
    layers = llm["layers"]
    n_layers = layers["wq"].shape[0]
    names = [
        ("wq", "self_attn.q_proj.weight"), ("wk", "self_attn.k_proj.weight"),
        ("wv", "self_attn.v_proj.weight"), ("wo", "self_attn.o_proj.weight"),
        ("w_gate", "mlp.gate_proj.weight"), ("w_up", "mlp.up_proj.weight"),
        ("w_down", "mlp.down_proj.weight"),
    ]
    for i in range(n_layers):
        b = f"{prefix}model.layers.{i}."
        for ours, hf in names:
            out[b + hf] = _t(layers[ours][i])
        out[b + "input_layernorm.weight"] = _np(layers["attn_norm"][i])
        out[b + "post_attention_layernorm.weight"] = _np(layers["mlp_norm"][i])
    return out


def export_vit_state_dict(tower: Dict[str, Any], depth: int, prefix: str, dead_keys=None) -> Dict[str, np.ndarray]:
    """`dead_keys`: optional set collecting the zero-filled placeholder names
    (the never-run final block) so callers can substitute source-checkpoint
    values for a strict-loadable export."""
    out: Dict[str, np.ndarray] = {}
    pe = tower["patch_embed"]
    # contiguity matters: safetensors serializes the raw buffer
    out[prefix + "patch_embed.proj.weight"] = np.ascontiguousarray(np.transpose(_np(pe["kernel"]), (3, 2, 0, 1)))
    out[prefix + "patch_embed.proj.bias"] = _np(pe["bias"])
    out[prefix + "pos_embed"] = _np(tower["pos_embed"])
    if "cls_token" in tower:
        out[prefix + "cls_token"] = _np(tower["cls_token"])
    if "reg_tokens" in tower:
        out[prefix + "reg_token"] = _np(tower["reg_tokens"])
    if "norm_pre" in tower:
        out[prefix + "norm_pre.weight"] = _np(tower["norm_pre"]["scale"])
        out[prefix + "norm_pre.bias"] = _np(tower["norm_pre"]["bias"])

    blocks = tower["blocks"]
    n_keep = blocks["norm1"]["scale"].shape[0]
    has_ls = "ls1" in blocks

    for i in range(n_keep):
        b = f"{prefix}blocks.{i}."
        out[b + "norm1.weight"] = _np(blocks["norm1"]["scale"][i])
        out[b + "norm1.bias"] = _np(blocks["norm1"]["bias"][i])
        out[b + "attn.qkv.weight"] = _t(blocks["qkv"]["kernel"][i])
        out[b + "attn.qkv.bias"] = _np(blocks["qkv"]["bias"][i])
        out[b + "attn.proj.weight"] = _t(blocks["proj"]["kernel"][i])
        out[b + "attn.proj.bias"] = _np(blocks["proj"]["bias"][i])
        out[b + "norm2.weight"] = _np(blocks["norm2"]["scale"][i])
        out[b + "norm2.bias"] = _np(blocks["norm2"]["bias"][i])
        out[b + "mlp.fc1.weight"] = _t(blocks["mlp_fc1"]["kernel"][i])
        out[b + "mlp.fc1.bias"] = _np(blocks["mlp_fc1"]["bias"][i])
        out[b + "mlp.fc2.weight"] = _t(blocks["mlp_fc2"]["kernel"][i])
        out[b + "mlp.fc2.bias"] = _np(blocks["mlp_fc2"]["bias"][i])
        if has_ls:
            out[b + "ls1.scale_factor"] = _np(blocks["ls1"][i])
            out[b + "ls2.scale_factor"] = _np(blocks["ls2"][i])
    # Final (never-run) block: zeros (strict=False on the HF side), unless
    # the caller passes the source checkpoint to export_checkpoint.
    i = depth - 1
    for k in list(out.keys()):
        if k.startswith(f"{prefix}blocks.{n_keep - 1}."):
            dead = k.replace(f"blocks.{n_keep - 1}.", f"blocks.{i}.")
            out[dead] = np.zeros_like(out[k])
            if dead_keys is not None:
                dead_keys.add(dead)
    return out


def export_checkpoint(model, params: Dict[str, Any], out_dir, source_hf: "Path | str | None" = None) -> Path:
    """Write config.json + model.safetensors + dataset_statistics.json.

    `source_hf`: optional directory of the HF checkpoint this model was
    LOADED from (e.g. finetune's --vla_path). When given, tensors this
    framework never materializes — the final ViT blocks (dead weight for the
    second-to-last feature tap) and anything else in the source but not here
    (SigLIP attention-pool head, ...) — are passed through from the source
    instead of zero-filled, producing a strict=True-loadable HF checkpoint."""
    from safetensors.numpy import save_file

    from bridgelang_tpu.models.vision.vit import FUSED_BACKBONES, VIT_CONFIGS

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    dead_keys: set = set()
    tensors: Dict[str, np.ndarray] = {}
    tensors.update(export_llm_state_dict(params["llm"]))
    for i in (1, 2, 3):
        fc = params["projector"].get(f"fc{i}")
        if fc is not None:
            tensors[f"projector.fc{i}.weight"] = _t(fc["kernel"])
            tensors[f"projector.fc{i}.bias"] = _np(fc["bias"])

    cfg = model.cfg

    def tower_depth(tower):
        # stacked blocks hold depth-1 layers (second-to-last tap)
        return int(tower["blocks"]["norm1"]["scale"].shape[0]) + 1

    if "featurizer" in params["vision"]:  # fused dual towers
        towers = {name: params["vision"][name] for name in ("featurizer", "fused_featurizer")}
    else:
        towers = {"featurizer": params["vision"]}
    del FUSED_BACKBONES, VIT_CONFIGS
    for name, tower in towers.items():
        tensors.update(export_vit_state_dict(tower, tower_depth(tower), f"vision_backbone.{name}.", dead_keys))

    if source_hf is not None:
        from safetensors import safe_open

        for f in sorted(Path(source_hf).glob("*.safetensors")):
            with safe_open(str(f), framework="numpy") as sf:
                for key in sf.keys():
                    if key in dead_keys or key not in tensors:
                        tensors[key] = sf.get_tensor(key)

    save_file(tensors, str(out_dir / "model.safetensors"))

    hf_config = {
        "model_type": "openvla",
        "architectures": ["OpenVLAForActionPrediction"],
        "vision_backbone_id": cfg.vision_backbone_id,
        "llm_backbone_id": cfg.llm_backbone_id,
        "arch_specifier": cfg.arch_specifier,
        "image_resize_strategy": cfg.image_resize_strategy,
        "llm_max_length": cfg.llm_max_length,
        "pad_token_id": cfg.llm.pad_token_id,
        "pad_to_multiple_of": 64,
        "n_action_bins": 256,
        "norm_stats": getattr(model, "norm_stats", {}),
        "text_config": {"model_type": "llama", "vocab_size": cfg.llm.padded_vocab_size,
                        "hidden_size": cfg.llm.dim, "num_hidden_layers": cfg.llm.n_layers,
                        "num_attention_heads": cfg.llm.n_heads, "num_key_value_heads": cfg.llm.n_kv_heads,
                        "intermediate_size": cfg.llm.intermediate_size, "rms_norm_eps": cfg.llm.norm_eps},
    }
    with open(out_dir / "config.json", "w") as f:
        json.dump(hf_config, f, indent=2, default=str)
    if getattr(model, "norm_stats", None):
        with open(out_dir / "dataset_statistics.json", "w") as f:
            json.dump(model.norm_stats, f, indent=2, default=float)
    return out_dir
