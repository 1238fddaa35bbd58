"""Checkpoint loading: HF OpenVLA/Prismatic safetensors -> BridgeLang-TPU pytrees.

Counterpart of reference prismatic/models/load.py:28-226 (`load`, `load_vla`,
`available_models`) plus the weight-conversion contract of
vla-scripts/extern/convert_openvla_weights_to_hf.py:73-115 — run in REVERSE:
published HF `openvla/openvla-7b`-format checkpoints (config.json +
model*.safetensors + dataset_statistics.json) load directly into this
framework's explicit param pytrees. Torch [out, in] kernels transpose to our
[in, out]; HF per-layer modules stack into the lax.scan [L, ...] layout; the
final ViT block (never used by the second-to-last feature tap) is skipped.

Zero-egress environments load from a local directory; hub download is gated.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

# Registered model ids -> descriptions (abbreviated registry; counterpart of
# prismatic/models/registry.py's 49 entries).
MODEL_REGISTRY: Dict[str, str] = {
    # --- VLA checkpoints ---
    "openvla-7b": "OpenVLA 7B: fused DINOv2+SigLIP 224px, Llama-2-7B, OXE Magic Soup++ (flagship)",
    "openvla-v01-7b": "OpenVLA v0.1 7B: SigLIP 224px, Vicuna-v1.5-7B, OXE Magic Soup",
    # --- LLaVA reproductions ---
    "reproduction-llava-v15+7b": "LLaVA v1.5 reproduction: CLIP ViT-L 336px letterbox, Vicuna-v1.5-7B",
    "reproduction-llava-v15+13b": "LLaVA v1.5 reproduction at 13B",
    "one-stage+7b": "single-stage (no align) LLaVA-style training, 7B",
    "one-stage+13b": "single-stage at 13B",
    "full-ft-multi-stage+7b": "two-stage with full vision fine-tuning",
    "full-ft-one-stage+7b": "one-stage with full vision fine-tuning",
    # --- vision backbone ablations (224px) ---
    "in1k-224px+7b": "IN1K ViT-L backbone ablation",
    "dinov2-224px+7b": "DINOv2 ViT-L backbone ablation",
    "clip-224px+7b": "CLIP ViT-L backbone ablation",
    "siglip-224px+7b": "SigLIP so400m backbone ablation",
    # --- resolution / resize-strategy ablations ---
    "clip-336px-resize-crop+7b": "CLIP 336px resize-crop",
    "clip-336px-resize-naive+7b": "CLIP 336px naive resize",
    "siglip-384px-letterbox+7b": "SigLIP 384px letterbox",
    "siglip-384px-resize-crop+7b": "SigLIP 384px resize-crop",
    "siglip-384px-resize-naive+7b": "SigLIP 384px naive resize",
    # --- fused-backbone ablations ---
    "dinoclip-336px-letterbox+7b": "fused DINOv2+CLIP 336px letterbox",
    "dinoclip-336px-resize-naive+7b": "fused DINOv2+CLIP 336px naive resize",
    "dinosiglip-384px-letterbox+7b": "fused DINOv2+SigLIP 384px letterbox",
    "dinosiglip-384px-resize-naive+7b": "fused DINOv2+SigLIP 384px naive resize",
    # --- LLM backbone ablations ---
    "llama2+7b": "Llama-2-7B base LLM",
    "llama2+13b": "Llama-2-13B base LLM",
    "llama2-chat+7b": "Llama-2-7B chat LLM",
    "llama2-chat+13b": "Llama-2-13B chat LLM",
    "mistral-v0.1+7b": "Mistral-v0.1-7B base LLM",
    "mistral-instruct-v0.1+7b": "Mistral-v0.1-7B instruct LLM",
    "phi-2+3b": "Phi-2 3B LLM",
    "vicuna-no-cotraining+7b": "Vicuna without language-only co-training",
    "llama2-no-cotraining+7b": "Llama-2 without language-only co-training",
    # --- training-duration / data ablations ---
    "train-1.25-epochs+7b": "1.25-epoch schedule",
    "train-1.5-epochs+7b": "1.5-epoch schedule",
    "train-2-epochs+7b": "2-epoch schedule",
    "train-3-epochs+7b": "3-epoch schedule",
    "llava-lvis4v+7b": "+LVIS-Instruct-4V data",
    "llava-lrv+7b": "+LRV-Instruct data",
    "llava-lvis4v-lrv+7b": "+both extra data mixes",
    # --- Prism family ---
    "prism-clip-controlled+7b": "Prism CLIP, controlled comparison",
    "prism-clip-controlled+13b": "Prism CLIP controlled, 13B",
    "prism-clip+7b": "Prism CLIP full recipe",
    "prism-clip+13b": "Prism CLIP full recipe, 13B",
    "prism-siglip-controlled+7b": "Prism SigLIP, controlled comparison",
    "prism-siglip+7b": "Prism SigLIP full recipe",
    "prism-siglip+13b": "Prism SigLIP full recipe, 13B",
    "prism-dinosiglip-controlled+7b": "Prism fused DINOv2+SigLIP, controlled",
    "prism-dinosiglip-controlled+13b": "Prism fused controlled, 13B",
    "prism-dinosiglip+7b": "Prism fused DINOv2+SigLIP 384px",
    "prism-dinosiglip+13b": "Prism fused 384px, 13B",
    "prism-dinosiglip-224px-controlled+7b": "Prism fused 224px, controlled",
    "prism-dinosiglip-224px+7b": "Prism fused 224px (the openvla-7b base VLM)",
}


def available_models():
    return sorted(MODEL_REGISTRY)


def available_model_names():
    return available_models()


# --- safetensors streaming ----------------------------------------------------


def _iter_safetensors(ckpt_dir: Path) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(ckpt_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No *.safetensors under {ckpt_dir}")
    for f in files:
        with safe_open(str(f), framework="numpy") as sf:
            for key in sf.keys():
                yield key, sf.get_tensor(key)


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _resample_pos_embed(pos: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-interpolate a [1, P, D] grid pos embed to a new patch count
    (reference behavior: timm interpolates pretrained grids at create time)."""
    import jax
    import jax.numpy as jnp

    p = pos.shape[1]
    side_old, side_new = int(round(p ** 0.5)), int(round(target_len ** 0.5))
    if side_old * side_old != p or side_new * side_new != target_len:
        raise ValueError(f"non-square pos embed resample {p}->{target_len}")
    grid = pos.reshape(side_old, side_old, -1)
    out = jax.image.resize(jnp.asarray(grid), (side_new, side_new, grid.shape[-1]), "bicubic", antialias=True)
    return np.asarray(out).reshape(1, target_len, -1)


# --- HF -> pytree conversion --------------------------------------------------


def convert_hf_state_dict(
    tensors: Dict[str, np.ndarray],
    llm_n_layers: int,
    vit_depths: Dict[str, int],
    target_dtype=None,
) -> Dict[str, Any]:
    """Convert a flat HF OpenVLA state dict into {"vision","projector","llm"}.

    `vit_depths`: {"featurizer": depth, "fused_featurizer": depth} (full model
    depths; we keep depth-1 blocks each).
    """
    import jax.numpy as jnp

    dt = target_dtype or jnp.bfloat16

    def cast(x):
        return jnp.asarray(x).astype(dt)

    out: Dict[str, Any] = {"vision": {}, "projector": {}, "llm": {"layers": {}}}

    # --- projector (prismatic projector.fcN) ---
    proj = {}
    for i in (1, 2, 3):
        wk = f"projector.fc{i}.weight"
        if wk in tensors:
            proj[f"fc{i}"] = {"kernel": cast(_t(tensors[wk])), "bias": cast(tensors[f"projector.fc{i}.bias"])}
    out["projector"] = proj

    # --- vision towers ---
    for tower, depth in vit_depths.items():
        prefix = f"vision_backbone.{tower}."
        if f"{prefix}patch_embed.proj.weight" not in tensors:
            continue
        tower_params: Dict[str, Any] = {}
        # conv [D, 3, k, k] -> [k, k, 3, D]
        w = tensors[f"{prefix}patch_embed.proj.weight"]
        tower_params["patch_embed"] = {
            "kernel": cast(np.transpose(w, (2, 3, 1, 0))),
            "bias": cast(tensors[f"{prefix}patch_embed.proj.bias"]),
        }
        if f"{prefix}cls_token" in tensors:
            tower_params["cls_token"] = cast(tensors[f"{prefix}cls_token"])
        if f"{prefix}reg_token" in tensors:
            tower_params["reg_tokens"] = cast(tensors[f"{prefix}reg_token"])
        tower_params["pos_embed"] = cast(tensors[f"{prefix}pos_embed"])
        if f"{prefix}norm_pre.weight" in tensors:
            tower_params["norm_pre"] = {
                "scale": cast(tensors[f"{prefix}norm_pre.weight"]),
                "bias": cast(tensors[f"{prefix}norm_pre.bias"]),
            }

        n_keep = depth - 1  # second-to-last tap never runs the final block
        stack: Dict[str, list] = {}

        def put(name, arr):
            stack.setdefault(name, []).append(arr)

        for i in range(n_keep):
            b = f"{prefix}blocks.{i}."
            put("norm1/scale", tensors[b + "norm1.weight"])
            put("norm1/bias", tensors[b + "norm1.bias"])
            put("qkv/kernel", _t(tensors[b + "attn.qkv.weight"]))
            put("qkv/bias", tensors[b + "attn.qkv.bias"])
            put("proj/kernel", _t(tensors[b + "attn.proj.weight"]))
            put("proj/bias", tensors[b + "attn.proj.bias"])
            put("norm2/scale", tensors[b + "norm2.weight"])
            put("norm2/bias", tensors[b + "norm2.bias"])
            put("mlp_fc1/kernel", _t(tensors[b + "mlp.fc1.weight"]))
            put("mlp_fc1/bias", tensors[b + "mlp.fc1.bias"])
            put("mlp_fc2/kernel", _t(tensors[b + "mlp.fc2.weight"]))
            put("mlp_fc2/bias", tensors[b + "mlp.fc2.bias"])
            # HF twin renames LayerScale gamma -> scale_factor (modeling_prismatic.py:49-59)
            for ls, hf_ls in (("ls1", "ls1"), ("ls2", "ls2")):
                for cand in (b + f"{hf_ls}.scale_factor", b + f"{hf_ls}.gamma"):
                    if cand in tensors:
                        put(ls, tensors[cand])
                        break

        blocks: Dict[str, Any] = {}
        for name, arrs in stack.items():
            stacked = cast(np.stack(arrs))
            node = blocks
            parts = name.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = stacked
        tower_params["blocks"] = blocks
        out["vision"][tower] = tower_params

    # Single-tower models: flatten "featurizer" to the top level (our ViT
    # module is the root when not fused).
    if set(out["vision"].keys()) == {"featurizer"}:
        out["vision"] = out["vision"]["featurizer"]

    # --- LLM (HF Llama layout) ---
    lm = "language_model."
    llm: Dict[str, Any] = {
        "embed": cast(tensors[lm + "model.embed_tokens.weight"]),
        "final_norm": cast(tensors[lm + "model.norm.weight"]),
        "lm_head": cast(_t(tensors[lm + "lm_head.weight"])),
    }
    stack = {}
    for i in range(llm_n_layers):
        b = f"{lm}model.layers.{i}."
        stack.setdefault("wq", []).append(_t(tensors[b + "self_attn.q_proj.weight"]))
        stack.setdefault("wk", []).append(_t(tensors[b + "self_attn.k_proj.weight"]))
        stack.setdefault("wv", []).append(_t(tensors[b + "self_attn.v_proj.weight"]))
        stack.setdefault("wo", []).append(_t(tensors[b + "self_attn.o_proj.weight"]))
        stack.setdefault("w_gate", []).append(_t(tensors[b + "mlp.gate_proj.weight"]))
        stack.setdefault("w_up", []).append(_t(tensors[b + "mlp.up_proj.weight"]))
        stack.setdefault("w_down", []).append(_t(tensors[b + "mlp.down_proj.weight"]))
        stack.setdefault("attn_norm", []).append(tensors[b + "input_layernorm.weight"])
        stack.setdefault("mlp_norm", []).append(tensors[b + "post_attention_layernorm.weight"])
    llm["layers"] = {k: cast(np.stack(v)) for k, v in stack.items()}
    out["llm"] = llm
    return out


# --- top-level loaders --------------------------------------------------------


# Published HF-format VLA repos the reference's load_vla pulls by id
# (reference load.py:39 VLA_HF_HUB_REPO; the public checkpoints live under
# the openvla org in the HF layout this loader consumes directly).
VLA_HUB_ORG = "openvla"


def resolve_checkpoint_dir(
    model_id_or_path: str, hf_token: Optional[str] = None, cache_dir=None
) -> Path:
    """Local dir passthrough, else HF-Hub download (reference load.py:52-76,
    180-205). A bare registered VLA id maps to the `openvla/<id>` repo; an
    explicit `org/name` id is used as-is. Multi-host runs serialize the
    download `local_zero_first`-style: process 0 populates the cache, the
    rest hit it warm. Zero-egress environments get a clear error naming the
    files to pre-stage."""
    path = Path(model_id_or_path)
    if path.exists():
        return path
    repo_id = model_id_or_path if "/" in model_id_or_path else f"{VLA_HUB_ORG}/{model_id_or_path}"
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - baked into this image
        raise FileNotFoundError(
            f"{model_id_or_path!r} is not a local directory and huggingface_hub "
            "is unavailable to fetch it."
        ) from e

    import jax

    def fetch():
        return Path(snapshot_download(
            repo_id, token=hf_token, cache_dir=cache_dir,
            allow_patterns=["*.safetensors", "*.json"],
        ))

    try:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            if jax.process_index() == 0:
                # Swallow rank-0 failures until AFTER the barrier: raising
                # here would leave ranks 1..N blocked in the collective
                # forever. The second fetch below re-raises on every rank.
                try:
                    fetch()
                except Exception:
                    pass
            multihost_utils.sync_global_devices("bridgelang_hub_download")
            local = fetch()  # non-zero ranks hit the warm cache; failures raise uniformly
        else:
            local = fetch()
    except Exception as e:
        raise FileNotFoundError(
            f"{model_id_or_path!r} is not a local checkpoint directory and the "
            f"HF Hub fetch of {repo_id!r} failed ({type(e).__name__}: {e}). In "
            "zero-egress environments pre-download the HF checkpoint "
            "(config.json + *.safetensors + dataset_statistics.json) and pass its path."
        ) from e
    return local


def load_vla(
    model_id_or_path: str,
    hf_token: Optional[str] = None,
    load_weights: bool = True,
    dtype=None,
    quantize_int8: bool = False,
    quantize_int4: bool = False,
    int4_group: Optional[int] = None,
    int4_shards: int = 1,
    w8a8: Optional[bool] = None,
    cache_dir=None,
):
    """Build an OpenVLA model (+ params when a checkpoint is found).

    `quantize_int8` / `quantize_int4` quantize the decoder on load — the
    reference's bitsandbytes load_in_8bit/load_in_4bit analogues
    (verify_openvla.py:49-60). int8 is the serving default (faster than bf16
    on bandwidth-bound decode); int4 is the capacity mode that fits 13B on
    one 16 GB chip (and, with w8a8, the decode speed mode — see ops/quant.py).

    `w8a8=True` additionally quantizes activations per-token so quantized
    matmuls ride the MXU int8 path: prefill chunks for int8 weights
    (models/llm/llama.py::proj), every chunk for int4. Default: enabled
    whenever the decoder is quantized — the serving posture. Pass
    w8a8=False for training loads (finetune.py QLoRA keeps bf16-activation
    forward numerics).

    Accepts a local directory containing HF-format `config.json`,
    `*.safetensors`, and `dataset_statistics.json`
    (the reference's published checkpoint layout), a registered model id
    (fetched from the `openvla/<id>` HF repo when the environment has
    egress), or an explicit `org/name` Hub repo id.
    """
    import jax.numpy as jnp

    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.models.vision.vit import FUSED_BACKBONES, VIT_CONFIGS

    dt = dtype or jnp.bfloat16
    path = resolve_checkpoint_dir(model_id_or_path, hf_token=hf_token, cache_dir=cache_dir)

    with open(path / "config.json") as f:
        hf_cfg = json.load(f)

    if w8a8 is None:
        w8a8 = quantize_int8 or quantize_int4  # serving posture by default
    cfg = VLMConfig.from_ids(
        model_id=hf_cfg.get("_name_or_path", str(path.name)),
        vision_backbone_id=hf_cfg["vision_backbone_id"],
        llm_backbone_id=hf_cfg["llm_backbone_id"],
        arch_specifier=hf_cfg["arch_specifier"],
        image_resize_strategy=hf_cfg["image_resize_strategy"],
        llm_max_length=hf_cfg.get("llm_max_length", 2048),
        llm_overrides=(
            {"w8a8": bool(w8a8), "int4_shards": int4_shards}
            if (w8a8 or int4_shards > 1) else None
        ),
    )
    norm_stats = hf_cfg.get("norm_stats") or {}
    stats_file = path / "dataset_statistics.json"
    if stats_file.exists():
        with open(stats_file) as f:
            file_stats = json.load(f)
        # local sidecar overrides config stats (reference openvla_utils.py:60-64)
        norm_stats = {**norm_stats, **{k: v for k, v in file_stats.items()}}

    model = OpenVLA(cfg, norm_stats, dtype=dt)
    if not load_weights:
        return model, None

    tensors = dict(_iter_safetensors(path))
    vit_ids = FUSED_BACKBONES.get(cfg.vision_backbone_id)
    if vit_ids:
        vit_depths = {"featurizer": VIT_CONFIGS[vit_ids[0]].depth, "fused_featurizer": VIT_CONFIGS[vit_ids[1]].depth}
    else:
        vit_depths = {"featurizer": VIT_CONFIGS[cfg.vision_backbone_id].depth}
    params = convert_hf_state_dict(tensors, cfg.llm.n_layers, vit_depths, target_dtype=dt)
    if quantize_int4:
        from bridgelang_tpu.ops.quant import INT4_GROUP, quantize_llm_int4

        # int4_group: scale-group size (input rows per scale). 128 is the
        # quality default; 256/512 shrink the w4a8 prefill per-group fixup
        # cost at a measured quantization-error cost (docs/int4.md table).
        # int4_shards > 1: shard-blocked packing for tensor-parallel serving
        # (must equal the mesh tensor size; deploy.py validates).
        params["llm"] = quantize_llm_int4(params["llm"], group=int4_group or INT4_GROUP,
                                          n_shards=int4_shards)
    elif quantize_int8:
        from bridgelang_tpu.ops.quant import quantize_llm_int8

        params["llm"] = quantize_llm_int8(params["llm"])
    return model, params


def load(model_id_or_path: str, **kwargs):
    """VLM loader (reference load.py:52); VLA checkpoints are a superset, so
    this delegates — norm_stats simply stay empty for pure VLMs."""
    return load_vla(model_id_or_path, **kwargs)
