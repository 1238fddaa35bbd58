"""Weight-only int8 quantization for serving.

Counterpart of the reference's bitsandbytes 8-bit/4-bit inference modes
(reference: vla-scripts/extern/verify_openvla.py:49-60 benchmarks them;
finetune.py:142-148 uses NF4 for QLoRA). TPU-native design: symmetric
per-output-channel int8 on the decoder matrices, dequantized INSIDE the
consuming matmul (`y = (x @ W_int8) * scale`), so HBM reads — the bottleneck
of autoregressive decode — are halved while the MXU still sees bf16. On
bandwidth-bound decode this is FASTER than bf16, unlike bitsandbytes on GPU.

Quantized leaves keep their names (int8 dtype) with a sibling `<name>_scale`
leaf; bridgelang_tpu.models.llm.llama's projection helper and embedding/head
lookups detect int8 and apply scales. Norms and biases stay bf16/fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax.numpy as jnp

Params = Dict[str, Any]

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_activations_per_token(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric absmax/127 int8 activation quantization — THE
    activation-side numerics of every w8a8-family path (int8-weight prefill
    in models/llm/llama.py::proj and the w4a8 kernel's wrapper in
    ops/int4_matmul.py share this helper so they cannot drift). Returns
    (q int8 [..., K], scale f32 [..., 1]); dequant is `acc * scale`."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    return jnp.round(xf / scale).astype(jnp.int8), scale


def _quantize_2d(w32: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    absmax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _quantize_tensor(w: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over `axis`-reduced absmax (per remaining channel).
    Stacked [L, ...] arrays quantize layer-by-layer via lax.map so fp32
    temporaries stay one layer large (matters when quantizing 7B in-place
    next to the bf16 originals on a 16 GB chip)."""
    if w.ndim == 3:
        import jax

        return jax.lax.map(lambda wl: _quantize_2d(wl.astype(jnp.float32), axis - 1), w)
    return _quantize_2d(w.astype(jnp.float32), axis)


def quantize_llm_int8(
    llm_params: Params,
    targets: Sequence[str] = QUANT_TARGETS,
    quantize_embed: bool = True,
    quantize_head: bool = True,
) -> Params:
    """Quantize decoder layer matrices [L, in, out] per (layer, out-channel);
    optionally the embedding table (per-row) and lm_head (per-column)."""
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for name in targets:
        if name not in layers or layers[name].dtype == jnp.int8:
            continue
        q, scale = _quantize_tensor(layers[name], axis=1)  # reduce over `in`
        layers[name] = q
        layers[name + "_scale"] = scale  # [L, 1, out]
    out["layers"] = layers

    if quantize_embed and out["embed"].dtype != jnp.int8:
        q, scale = _quantize_tensor(out["embed"], axis=1)  # per-row (token)
        out["embed"] = q
        out["embed_scale"] = scale  # [V, 1]
    if quantize_head and out["lm_head"].dtype != jnp.int8:
        q, scale = _quantize_tensor(out["lm_head"], axis=0)  # per-out-column
        out["lm_head"] = q
        out["lm_head_scale"] = scale  # [1, V]
    return out


def init_llm_params_int8(key, cfg) -> Params:
    """Random-init a decoder directly in int8 (+ scales): each matrix is
    generated and quantized inside one jit, so no full-precision copy of the
    model ever exists — required to stand up 7B-scale weights for serving
    benchmarks on a single 16 GB chip."""
    import jax

    k_embed, k_layers, k_head = jax.random.split(key, 3)
    D, I, L = cfg.dim, cfg.intermediate_size, cfg.n_layers
    H, Hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    assert cfg.arch == "llama", "int8 init currently targets the Llama family"

    def dense_q(k, shape, axis):
        fan_in = shape[-2]

        @jax.jit
        def make(k):
            w = jax.random.normal(k, shape, dtype=jnp.bfloat16) * jnp.asarray(fan_in ** -0.5, jnp.bfloat16)
            return _quantize_tensor(w, axis)

        return make(k)

    lk = jax.random.split(k_layers, 8)
    layers: Params = {"attn_norm": jnp.ones((L, D), jnp.bfloat16), "mlp_norm": jnp.ones((L, D), jnp.bfloat16)}
    for name, k, shape in (
        ("wq", lk[0], (L, D, H * hd)),
        ("wk", lk[1], (L, D, Hkv * hd)),
        ("wv", lk[2], (L, D, Hkv * hd)),
        ("wo", lk[3], (L, H * hd, D)),
        ("w_gate", lk[4], (L, D, I)),
        ("w_up", lk[5], (L, D, I)),
        ("w_down", lk[6], (L, I, D)),
    ):
        q, s = dense_q(k, shape, axis=1)
        layers[name], layers[name + "_scale"] = q, s

    @jax.jit
    def make_embed(k):
        w = jax.random.normal(k, (cfg.padded_vocab_size, D), dtype=jnp.bfloat16) * jnp.asarray(0.02, jnp.bfloat16)
        return _quantize_tensor(w, axis=1)

    @jax.jit
    def make_head(k):
        w = jax.random.normal(k, (D, cfg.padded_vocab_size), dtype=jnp.bfloat16) * jnp.asarray(D ** -0.5, jnp.bfloat16)
        return _quantize_tensor(w, axis=0)

    embed_q, embed_s = make_embed(k_embed)
    head_q, head_s = make_head(k_head)
    return {
        "embed": embed_q,
        "embed_scale": embed_s,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": head_q,
        "lm_head_scale": head_s,
    }


def dequantize_llm_int8(llm_params: Params, dtype: jnp.dtype = jnp.bfloat16,
                        int4_shards: int = 1) -> Params:
    """Inverse of quantize_llm_int8: codes * scale back to `dtype`, dropping
    the `*_scale` leaves. Used before checkpoint export / LoRA merge so int8
    codes are never mistaken for real weights. Packed-int4 leaves (sibling
    `*_scale4`, e.g. a --quantization_bits 4 QLoRA base at export time) are
    dequantized too, so this is the one do-whatever-is-needed entry.

    `int4_shards` must equal the pack-time n_shards (tensor-parallel deploys
    shard-block the column-parallel leaves, pack_layout_tag): dequantizing a
    shard-blocked pack with the default 1 returns permuted columns with no
    error raised."""
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for name in [n for n in layers if not (n.endswith("_scale") or n.endswith("_scale4"))]:
        w = layers[name]
        if name + "_scale4" in layers:
            s4 = layers.pop(name + "_scale4")
            shards = int4_shards if name in INT4_COLUMN_PARALLEL else 1
            layers[name] = dequant_int4(w, s4, dtype, n_shards=shards)
        elif w.dtype == jnp.int8:
            scale = layers.pop(name + "_scale")
            layers[name] = (w.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)
    out["layers"] = layers
    if out["embed"].dtype == jnp.int8:
        scale = out.pop("embed_scale")
        out["embed"] = (out["embed"].astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)
    if out["lm_head"].dtype == jnp.int8:
        scale = out.pop("lm_head_scale")
        out["lm_head"] = (out["lm_head"].astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)
    return out


def quantized_bytes(params: Params) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))


# --- int4 weight-only (packed) — the capacity mode -------------------------
#
# Counterpart of the reference's bitsandbytes 4-bit inference
# (vla-scripts/extern/verify_openvla.py:60, ~6 GB VRAM; finetune.py:142-148
# NF4). TPU-native design: two 4-bit codes packed per int8 byte along the
# OUTPUT axis (out-paired: columns c and out//2 + c share a byte, low nibble
# biased +8 — see pack_int4), per-group symmetric scales over GROUP input
# rows. The consuming matmul is a fused Pallas kernel (ops/int4_matmul.py)
# that streams the packed bytes and recovers both halves with two MXU dots
# of the RAW bytes (no per-element unpack at all), so HBM traffic is the
# int4 bytes and the VPU does no shift work; XLA-level dequant (the
# fallback for tiny shapes) materializes full-width weights.
#
# Purpose: models that do not fit otherwise — 13B int8 loads 14.6 GB and
# OOMs at execution on one 16 GB chip, while 13B int4 (~8.7 GB total)
# serves on a single chip.

INT4_GROUP = 128

# Byte-layout version of pack_int4, persisted into every run's config.json
# sidecar (training/checkpointing.py::save_sidecars) and checked on resume:
# a packed-int4 checkpoint dequantizes to silently permuted garbage under
# any OTHER layout (no shape or dtype mismatch would be raised). v2 is the
# out-paired, low-nibble-biased layout below; the short-lived split-half/v1
# (input rows r and in//2+r per byte, both nibbles signed) and the
# adjacent-rows packing that preceded it were never shipped — artifacts from
# them (if any exist) must be re-quantized from their source checkpoint.
INT4_PACK_LAYOUT = "out-paired-lobias/v2"


def pack_layout_tag(n_shards: int = 1) -> str:
    """The layout string an artifact should record: shard-blocked packing
    (pack_int4 n_shards>1, tensor-parallel deploys) produces a DIFFERENT
    byte layout than global pairing — column c pairs with its shard block's
    half, not out//2 + c — so the shard count is part of the layout identity.
    A consumer that dequantizes with the wrong n_shards gets silently
    permuted columns (no shape or dtype error), exactly the failure class
    the version string exists to catch."""
    n = int(n_shards or 1)
    return INT4_PACK_LAYOUT if n <= 1 else f"{INT4_PACK_LAYOUT}+shardblocked-{n}"


def pack_int4(codes: jnp.ndarray, n_shards: int = 1) -> jnp.ndarray:
    """[..., in, out] int8 codes in [-8, 7] -> [..., in, out//2] packed int8.

    OUT-PAIRED, LOW-BIASED layout: byte [r, c] holds code [r, c] PLUS 8
    (i.e. biased to [0, 15]) in the low nibble and code [r, out//2 + c]
    (signed) in the high nibble. Chosen for the Pallas kernel
    (ops/int4_matmul.py): both nibbles of a byte multiply the SAME
    activation row, so the kernel needs NO per-element unpack shifts at
    all — the byte value IS 16*hi + (lo+8), so one dot of the raw bytes
    plus one dot of the masked low nibbles recovers both halves with two
    cheap linear fixups. Measured 3x faster than the shift-unpack kernel
    over the previous split-half layout at 13B MLP dims (0.081 vs
    0.243 ms/matmul, M=16).

    `n_shards > 1` (tensor-parallel serving): the pairing is applied WITHIN
    each of `n_shards` contiguous column blocks, so a column-parallel shard
    of the packed tensor (dim -1 split n_shards ways) is itself a standard
    v2-packed matrix over its own output columns — what lets the fused
    kernel run shard-local under a tensor mesh (ops/int4_matmul.py SPMD
    notes). Global pairing (n_shards=1) couples columns c and out//2 + c
    across the whole matrix, which no contiguous shard can contain — the
    original reason int4+TP was rejected."""
    *lead, n_in, n = codes.shape
    blocks = codes.reshape(*lead, n_in, n_shards, n // n_shards)
    half = blocks.shape[-1] // 2
    lo = (blocks[..., :half].astype(jnp.int8) + jnp.int8(8)) & jnp.int8(0x0F)
    hi = blocks[..., half:].astype(jnp.int8) << 4
    return ((hi | lo)).astype(jnp.int8).reshape(*lead, n_in, n // 2)


def unpack_int4(packed: jnp.ndarray, n_shards: int = 1) -> jnp.ndarray:
    """Inverse of pack_int4: [..., in, out//2] -> [..., in, out] int8 codes.
    Low nibble un-biases (-8); high nibble sign-extends arithmetically."""
    *lead, n_in, n2 = packed.shape
    blocks = packed.reshape(*lead, n_in, n_shards, n2 // n_shards)
    lo = (blocks.astype(jnp.int8) & jnp.int8(0x0F)) - jnp.int8(8)
    hi = blocks.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(*lead, n_in, 2 * n2)


def dequant_int4(packed: jnp.ndarray, scale4: jnp.ndarray, dtype: jnp.dtype = jnp.bfloat16,
                 n_shards: int = 1) -> jnp.ndarray:
    """[..., in, out//2] packed + [..., in//GROUP, out] scales -> [..., in, out].
    Scales are stored in GLOBAL column order regardless of n_shards (only the
    byte pairing is shard-blocked), so the scale application is unchanged."""
    codes = unpack_int4(packed, n_shards=n_shards)
    n_in, out = codes.shape[-2], codes.shape[-1]
    g = n_in // scale4.shape[-2]
    grouped = codes.reshape(codes.shape[:-2] + (scale4.shape[-2], g, out)).astype(dtype)
    return (grouped * scale4[..., :, None, :].astype(dtype)).reshape(codes.shape)


def _quantize4_2d(w32: jnp.ndarray, group: int, n_shards: int = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    n_in, out = w32.shape
    group = min(group, n_in)  # tiny test dims: one group per matrix
    assert n_in % group == 0 and out % 2 == 0, (n_in, group, out)
    assert out % (2 * n_shards) == 0, (out, n_shards)
    grouped = w32.reshape(n_in // group, group, out)
    absmax = jnp.max(jnp.abs(grouped), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    codes = jnp.clip(jnp.round(grouped / scale), -7, 7).astype(jnp.int8).reshape(n_in, out)
    return pack_int4(codes, n_shards=n_shards), scale[:, 0, :].astype(jnp.bfloat16)


# Column-parallel leaves under the serving mesh (parallel/sharding.py
# SERVING_RULES): output columns split across the tensor axis, so these are
# the ones that need shard-blocked packing for int4 TP. wo/w_down are
# ROW-parallel (input rows split; pairing along their output dim is intact
# on every shard) and keep the global pairing.
INT4_COLUMN_PARALLEL = ("wq", "wk", "wv", "w_gate", "w_up")


def quantize_llm_int4(
    llm_params: Params,
    targets: Sequence[str] = QUANT_TARGETS,
    group: int = INT4_GROUP,
    n_shards: int = 1,
) -> Params:
    """Quantize decoder layer matrices [L, in, out] to packed int4 with
    per-(layer, input-group, out-channel) scales. Embedding + head stay int8
    (gather/one-column access patterns; streaming them is not the bottleneck).
    Leaves: `<name>` packed int8 [L, in, out//2] + `<name>_scale4`
    [L, in//group, out] — the projection helper detects `_scale4`.

    Memory discipline: targets quantize ONE LAYER AT A TIME straight from
    the source leaves (host numpy from the checkpoint loader, or device
    arrays) — at no point is an int8 staging copy or a full-stack fp32
    transient resident. This is what lets a REAL 13B checkpoint quantize on
    one 16 GB chip: device peak is the growing packed pytree (~7 GB final)
    plus a single-layer transient (~140 MB), where the previous
    int8-first route held 12.6 GB of codes next to a 5.7 GB stacked
    transient and OOM'd (cf. init_llm_params_int4's identical discipline
    for the random-init bench path)."""
    import jax

    src_layers = llm_params["layers"]
    layers = dict(src_layers)

    @functools.partial(jax.jit, static_argnames=("g", "s"))
    def _q4_layer(wl, g, s):
        return _quantize4_2d(wl.astype(jnp.float32), g, n_shards=s)

    @functools.partial(jax.jit, static_argnames=("g", "s"))
    def _q4_layer_from_int8(wl, sl, g, s):
        return _quantize4_2d(wl.astype(jnp.float32) * sl.astype(jnp.float32), g, n_shards=s)

    for name in targets:
        if name not in src_layers:
            continue
        # n_shards > 1 (tensor-parallel deploy): shard-blocked packing for the
        # column-parallel matrices only; row-parallel ones keep global pairing.
        shards = n_shards if name in INT4_COLUMN_PARALLEL else 1
        w = src_layers[name]
        int8_scale = layers.get(name + "_scale") if w.dtype == jnp.int8 else None
        per_layer = []
        for l in range(w.shape[0]):  # layer at a time: bounded transients
            if int8_scale is not None:
                per_layer.append(_q4_layer_from_int8(w[l], int8_scale[l], g=group, s=shards))
            else:
                per_layer.append(_q4_layer(w[l], g=group, s=shards))
        layers[name] = jnp.stack([q for q, _ in per_layer])
        layers[name + "_scale4"] = jnp.stack([s for _, s in per_layer])
        del per_layer
        layers.pop(name + "_scale", None)

    out = dict(llm_params)
    out["layers"] = layers
    # Embedding + head: int8 exactly as quantize_llm_int8 does (quant.py:64-71).
    if out["embed"].dtype != jnp.int8:
        q, scale = _quantize_tensor(out["embed"], axis=1)  # per-row (token)
        out["embed"], out["embed_scale"] = q, scale
    if out["lm_head"].dtype != jnp.int8:
        q, scale = _quantize_tensor(out["lm_head"], axis=0)  # per-out-column
        out["lm_head"], out["lm_head_scale"] = q, scale
    return out


def init_llm_params_int4(key, cfg, group: int = INT4_GROUP) -> Params:
    """Random-init a decoder directly in packed int4 (+ group scales).
    Generation + quantization happen ONE LAYER AT A TIME inside lax.map, so
    at no point does a full-precision (or int8) copy of any matrix exist —
    peak transient is a single layer. Required to stand up 13B on one 16 GB
    chip (the int8->int4 conversion route holds both copies: 12.6 + 6.3 GB,
    and the OOM surfaces asynchronously at the first blocking fetch)."""
    import jax

    k_embed, k_layers, k_head = jax.random.split(key, 3)
    D, I, L = cfg.dim, cfg.intermediate_size, cfg.n_layers
    H, Hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    assert cfg.arch == "llama", "int4 init currently targets the Llama family"

    def dense_q4(k, shape):
        fan_in = shape[-2]

        @jax.jit
        def make(keys):
            return jax.lax.map(
                lambda kl: _quantize4_2d(
                    jax.random.normal(kl, shape[1:], jnp.float32) * (fan_in ** -0.5), group),
                keys)

        return make(jax.random.split(k, shape[0]))

    lk = jax.random.split(k_layers, 8)
    layers: Params = {"attn_norm": jnp.ones((L, D), jnp.bfloat16), "mlp_norm": jnp.ones((L, D), jnp.bfloat16)}
    for name, k, shape in (
        ("wq", lk[0], (L, D, H * hd)),
        ("wk", lk[1], (L, D, Hkv * hd)),
        ("wv", lk[2], (L, D, Hkv * hd)),
        ("wo", lk[3], (L, H * hd, D)),
        ("w_gate", lk[4], (L, D, I)),
        ("w_up", lk[5], (L, D, I)),
        ("w_down", lk[6], (L, I, D)),
    ):
        q4, s4 = dense_q4(k, shape)
        layers[name], layers[name + "_scale4"] = q4, s4

    @jax.jit
    def make_embed(k):
        w = jax.random.normal(k, (cfg.padded_vocab_size, D), dtype=jnp.bfloat16) * jnp.asarray(0.02, jnp.bfloat16)
        return _quantize_tensor(w, axis=1)

    @jax.jit
    def make_head(k):
        w = jax.random.normal(k, (D, cfg.padded_vocab_size), dtype=jnp.bfloat16) * jnp.asarray(D ** -0.5, jnp.bfloat16)
        return _quantize_tensor(w, axis=0)

    embed_q, embed_s = make_embed(k_embed)
    head_q, head_s = make_head(k_head)
    return {
        "embed": embed_q,
        "embed_scale": embed_s,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": head_q,
        "lm_head_scale": head_s,
    }


def dequantize_llm_int4(llm_params: Params, dtype: jnp.dtype = jnp.bfloat16,
                        int4_shards: int = 1) -> Params:
    """Alias: dequantize_llm_int8 handles `*_scale4` leaves too."""
    return dequantize_llm_int8(llm_params, dtype, int4_shards=int4_shards)
