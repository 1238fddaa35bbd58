"""LoRA fine-tuning: low-rank adapters as extra pytree leaves.

Counterpart of the reference's PEFT LoRA path (reference:
vla-scripts/finetune.py:172-182 — r=32, "all-linear", gaussian init;
merge_and_unload at :335-361). TPU-native design: adapters live INSIDE the
LLM layer param dict as stacked `[L, in, r]` / `[L, r, out]` leaves named
`<proj>_lora_a` / `<proj>_lora_b`, so

* the decoder's lax.scan picks them up with zero plumbing (the projection
  helper in llama._block applies `y += (x @ A) @ B * scale` when present);
* freezing is just a trainable mask selecting `*_lora_*` leaves;
* merge-and-unload is a pure pytree fold: W += (A @ B) * scale.

The alpha/r scaling is folded into B at init (B starts at zero, so this is
exact), keeping runtime free of extra scalars.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

ALL_LINEAR = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def add_lora_params(
    key: jax.Array,
    llm_params: Params,
    rank: int = 32,
    alpha: float = 32.0,
    targets: Sequence[str] = ALL_LINEAR,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Return a copy of `llm_params` with LoRA leaves added to layer matrices.
    A ~ N(0, 1/r) (reference uses gaussian init), B = 0 -> identity at start."""
    layers = dict(llm_params["layers"])
    keys = jax.random.split(key, len(targets))
    scale = alpha / rank
    for t, k in zip(targets, keys):
        if t not in layers:
            continue
        w = layers[t]  # [L, in, out] — or [L, in, out//2] for packed-int4 bases
        L, d_in, d_out = w.shape
        if t + "_scale4" in layers:
            d_out *= 2  # out-paired nibbles halve the stored output dim
        layers[t + "_lora_a"] = (jax.random.normal(k, (L, d_in, rank), dtype=dtype) * (rank ** -0.5))
        # Fold alpha/rank into B's eventual contribution by scaling at merge
        # time; B starts at zero either way. We record scale via metadata-free
        # convention: scale is applied in the forward/merge as alpha/rank with
        # alpha == rank by default (scale 1). For alpha != rank, pre-scale A.
        if scale != 1.0:
            layers[t + "_lora_a"] = layers[t + "_lora_a"] * scale
        layers[t + "_lora_b"] = jnp.zeros((L, rank, d_out), dtype=dtype)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def merge_lora(llm_params: Params, int4_shards: int = 1) -> Params:
    """Fold adapters into base weights and drop the LoRA leaves
    (reference merge_and_unload, finetune.py:335-361). int8 bases (the QLoRA
    analogue, scripts/finetune.py --use_quantization) dequantize with their
    sibling `*_scale` leaf before the add and requantize after — adding fp32
    deltas to raw int8 codes would corrupt the weights.

    `int4_shards` must equal the base's pack-time n_shards (quant.py::
    pack_layout_tag): merging into a shard-blocked pack (tensor-parallel
    deploy artifacts) with the default 1 would dequantize permuted columns
    and silently corrupt the merge. Training packs globally (finetune.py
    never shard-blocks), so 1 is right for every QLoRA run."""
    from bridgelang_tpu.ops.quant import INT4_COLUMN_PARALLEL, _quantize_tensor

    layers = llm_params["layers"]
    merged = {k: v for k, v in layers.items() if not (k.endswith("_lora_a") or k.endswith("_lora_b"))}
    for name in [n for n in merged if not (n.endswith("_scale") or n.endswith("_scale4"))]:
        a = layers.get(name + "_lora_a")
        b = layers.get(name + "_lora_b")
        if a is None or b is None:
            continue
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32))
        w = merged[name]
        if name + "_scale4" in merged:
            from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

            shards = int4_shards if name in INT4_COLUMN_PARALLEL else 1
            w32 = dequant_int4(w, merged[name + "_scale4"], dtype=jnp.float32, n_shards=shards)
            group = w32.shape[1] // merged[name + "_scale4"].shape[1]
            q, scale = jax.lax.map(lambda wl: _quantize4_2d(wl, group, n_shards=shards), w32 + delta)
            merged[name], merged[name + "_scale4"] = q, scale
        elif w.dtype == jnp.int8:
            w32 = w.astype(jnp.float32) * merged[name + "_scale"].astype(jnp.float32)
            q, scale = _quantize_tensor(w32 + delta, axis=1)
            merged[name], merged[name + "_scale"] = q, scale
        else:
            merged[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    out = dict(llm_params)
    out["layers"] = merged
    return out


def lora_trainable_mask(params: Params) -> Params:
    """Boolean pytree: True only on `*_lora_*` leaves (adapter-only training)."""

    def mark(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        return any("_lora_" in n for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def split_lora(llm_params: Params) -> Tuple[Params, Params]:
    """(base, adapters) — adapters saved standalone like a PEFT adapter dir."""
    base_layers, lora_layers = {}, {}
    for name, w in llm_params["layers"].items():
        (lora_layers if "_lora_" in name else base_layers)[name] = w
    base = dict(llm_params, layers=base_layers)
    return base, {"layers": lora_layers}
