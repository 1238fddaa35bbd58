"""HF transformers vision checkpoints -> BridgeLang-TPU ViT pytrees.

The reference gets DINOv2/SigLIP correctness for free from timm
(reference: prismatic/models/backbones/vision/base_vision.py:110-128); this
framework re-implements the towers, so correctness is proven by converting
weights from HF `transformers` (`Dinov2WithRegistersModel`,
`SiglipVisionModel` — independent ports of the same published checkpoints)
and asserting feature parity (tests/test_vit_hf_parity.py). The converters
also load real `facebook/dinov2-*` / `google/siglip-*` checkpoints directly.

Layout notes:
  * torch Linear [out, in] -> our Dense kernel [in, out] (transpose);
    separate q/k/v projections fuse into one [D, 3D] qkv kernel.
  * HF DINOv2 adds a positional embedding to the CLS token
    (position_embeddings[:, :1]); our ViT (timm `no_embed_class` semantics)
    never does, so the CLS position folds into the cls_token — exact, since
    CLS always sits at the same position.
  * Only blocks 0..depth-2 are converted (the second-to-last feature tap
    never runs the final block).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from bridgelang_tpu.models.vision.vit import ViTConfig


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _t(v) -> np.ndarray:
    return np.ascontiguousarray(_np(v).T)


def _stack_blocks(per_block: list) -> Dict[str, Any]:
    """[{nested leaf dicts}] -> nested dict of [L, ...]-stacked leaves."""
    out: Dict[str, Any] = {}
    for name in per_block[0]:
        vals = [b[name] for b in per_block]
        if isinstance(vals[0], dict):
            out[name] = {k: np.stack([v[k] for v in vals]) for k in vals[0]}
        else:
            out[name] = np.stack(vals)
    return out


def _fit_pos_embed(pos: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-resample a [1, P, D] patch-grid pos embed when the checkpoint
    resolution differs from the target config (e.g. facebook/dinov2-* ships
    518px grids; the flagship runs 224px) — timm interpolates pretrained
    grids at create time, so must we."""
    if pos.shape[1] == target_len:
        return pos
    from bridgelang_tpu.models.load import _resample_pos_embed

    return _resample_pos_embed(pos, target_len)


def convert_hf_dinov2(state_dict: Mapping[str, Any], cfg: ViTConfig) -> Dict[str, Any]:
    """`Dinov2WithRegistersModel` (or `Dinov2Model`, reg tokens absent)
    state dict -> our ViT param pytree."""
    sd = state_dict
    pos = _np(sd["embeddings.position_embeddings"])  # [1, 1+P, D]
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(_np(sd["embeddings.patch_embeddings.projection.weight"]), (2, 3, 1, 0)),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        # CLS position folds into the token (HF adds pos BEFORE inserting
        # registers; registers get no pos, matching our prefix handling).
        "cls_token": _np(sd["embeddings.cls_token"]) + pos[:, :1],
        "pos_embed": _fit_pos_embed(pos[:, 1:], cfg.num_patches),
    }
    if cfg.num_reg_tokens:
        params["reg_tokens"] = _np(sd["embeddings.register_tokens"])

    blocks = []
    for i in range(cfg.depth - 1):
        b = f"encoder.layer.{i}."
        qkv_w = np.concatenate(
            [_t(sd[b + f"attention.attention.{m}.weight"]) for m in ("query", "key", "value")], axis=1
        )
        qkv_b = np.concatenate(
            [_np(sd[b + f"attention.attention.{m}.bias"]) for m in ("query", "key", "value")]
        )
        blocks.append({
            "norm1": {"scale": _np(sd[b + "norm1.weight"]), "bias": _np(sd[b + "norm1.bias"])},
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {"kernel": _t(sd[b + "attention.output.dense.weight"]),
                     "bias": _np(sd[b + "attention.output.dense.bias"])},
            "ls1": _np(sd[b + "layer_scale1.lambda1"]),
            "norm2": {"scale": _np(sd[b + "norm2.weight"]), "bias": _np(sd[b + "norm2.bias"])},
            "mlp_fc1": {"kernel": _t(sd[b + "mlp.fc1.weight"]), "bias": _np(sd[b + "mlp.fc1.bias"])},
            "mlp_fc2": {"kernel": _t(sd[b + "mlp.fc2.weight"]), "bias": _np(sd[b + "mlp.fc2.bias"])},
            "ls2": _np(sd[b + "layer_scale2.lambda1"]),
        })
    params["blocks"] = _stack_blocks(blocks)
    return params


def convert_hf_siglip(state_dict: Mapping[str, Any], cfg: ViTConfig) -> Dict[str, Any]:
    """`SiglipVisionModel` state dict -> our ViT param pytree (no CLS; the
    attention-pooling head past the feature tap is dropped)."""
    sd = state_dict
    prefix = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    e = prefix + "embeddings."
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(_np(sd[e + "patch_embedding.weight"]), (2, 3, 1, 0)),
            "bias": _np(sd[e + "patch_embedding.bias"]),
        },
        "pos_embed": _fit_pos_embed(
            _np(sd[e + "position_embedding.weight"])[None], cfg.num_patches  # [P, D] -> [1, P, D]
        ),
    }

    blocks = []
    for i in range(cfg.depth - 1):
        b = f"{prefix}encoder.layers.{i}."
        qkv_w = np.concatenate([_t(sd[b + f"self_attn.{m}_proj.weight"]) for m in ("q", "k", "v")], axis=1)
        qkv_b = np.concatenate([_np(sd[b + f"self_attn.{m}_proj.bias"]) for m in ("q", "k", "v")])
        blocks.append({
            "norm1": {"scale": _np(sd[b + "layer_norm1.weight"]), "bias": _np(sd[b + "layer_norm1.bias"])},
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {"kernel": _t(sd[b + "self_attn.out_proj.weight"]),
                     "bias": _np(sd[b + "self_attn.out_proj.bias"])},
            "norm2": {"scale": _np(sd[b + "layer_norm2.weight"]), "bias": _np(sd[b + "layer_norm2.bias"])},
            "mlp_fc1": {"kernel": _t(sd[b + "mlp.fc1.weight"]), "bias": _np(sd[b + "mlp.fc1.bias"])},
            "mlp_fc2": {"kernel": _t(sd[b + "mlp.fc2.weight"]), "bias": _np(sd[b + "mlp.fc2.bias"])},
        })
    params["blocks"] = _stack_blocks(blocks)
    return params
