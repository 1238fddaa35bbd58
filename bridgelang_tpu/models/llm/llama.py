"""Decoder-only LLM backbones (Llama-2 / Mistral / Phi-2) in pure JAX.

TPU-native replacement for the reference's HF `LlamaForCausalLM` + flash-attn
stack (reference: prismatic/models/backbones/llm/base_llm.py:37-223,
llama2.py:24-102, mistral.py, phi.py). Design choices:

* Explicit parameter pytrees (no framework Module) — sharding rules, LoRA
  adapters, quantization, and HF-weight loading all become direct pytree
  manipulation; `jax.lax.scan` over stacked per-layer params gives O(1)
  compile time in depth.
* Fixed-shape KV cache `[L, B, S, n_kv, head_dim]` with per-example write
  indices — right-padded prompts and the jitted greedy decode loop need no
  dynamic shapes anywhere.
* Attention is pluggable: `attention_impl="pallas"` uses the Pallas TPU flash
  attention kernel (bridgelang_tpu.ops.flash_attention) for prefill/training;
  "xla" uses jax.nn.dot_product_attention. Single-token decode is a small
  einsum over the cache either way (it is HBM-bandwidth-, not FLOP-, bound).

Weight-shape contract matches HF Llama so checkpoint conversion is a key
remap + transpose (see bridgelang_tpu.models.load).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000           # ORIGINAL vocab (action-token id math uses this)
    padded_vocab_size: int = 32064    # +<PAD>, resized to multiple of 64 (reference llama2.py:73-76)
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    intermediate_size: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    pad_token_id: int = 32000
    bos_token_id: int = 1
    eos_token_id: int = 2
    # Architecture flags (Phi-2 differs from the Llama family):
    arch: str = "llama"               # "llama" (RMSNorm+SwiGLU) | "phi" (LN + parallel GELU block)
    rotary_pct: float = 1.0           # fraction of head_dim that is rotary (phi-2: 0.4)
    use_bias: bool = False
    # Sliding-window attention width (Mistral: 4096). None = dense. At the
    # VLA context (<=2048 tokens) a 4096 window never clips, so configs keep
    # the field for fidelity; masking applies when window < sequence.
    sliding_window: Optional[int] = None
    # Serving speed knob: with int8 weights, ALSO quantize activations
    # per-token to int8 so matmuls run on the MXU's int8 path (~2x bf16 rate).
    # Opt-in: per-token symmetric quant has no outlier handling, so validate
    # accuracy on real weights before enabling (w8-only stays the default).
    w8a8: bool = False
    # Tensor-parallel int4 deploys: the packed-int4 column-parallel leaves
    # were shard-block packed (ops/quant.py::pack_int4 n_shards) for a mesh
    # tensor axis of this size; 1 = single-chip/global pairing. Set by
    # load_vla(int4_shards=) via deploy.py --mesh_spec tensor=N.
    int4_shards: int = 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def rotary_dim(self) -> int:
        rd = int(self.rotary_pct * self.head_dim)
        assert rd % 2 == 0, f"rotary_dim must be even, got {rd} (head_dim={self.head_dim})"
        return rd


LLM_CONFIGS: Dict[str, LLMConfig] = {
    "llama2-7b-pure": LLMConfig(),
    "llama2-7b-chat": LLMConfig(),
    "vicuna-v15-7b": LLMConfig(),
    "llama2-13b-pure": LLMConfig(dim=5120, n_layers=40, n_heads=40, n_kv_heads=40, intermediate_size=13824),
    "llama2-13b-chat": LLMConfig(dim=5120, n_layers=40, n_heads=40, n_kv_heads=40, intermediate_size=13824),
    "vicuna-v15-13b": LLMConfig(dim=5120, n_layers=40, n_heads=40, n_kv_heads=40, intermediate_size=13824),
    "mistral-v0.1-7b-pure": LLMConfig(n_kv_heads=8, intermediate_size=14336, max_seq_len=2048, sliding_window=4096),
    "mistral-v0.1-7b-instruct": LLMConfig(n_kv_heads=8, intermediate_size=14336, max_seq_len=2048, sliding_window=4096),
    "phi-2-3b": LLMConfig(
        vocab_size=51200, padded_vocab_size=51264, dim=2560, n_layers=32, n_heads=32, n_kv_heads=32,
        intermediate_size=10240, arch="phi", rotary_pct=0.4, use_bias=True, norm_eps=1e-5,
        pad_token_id=51200, bos_token_id=50256, eos_token_id=50256,
    ),
}

LLM_FAMILIES: Dict[str, str] = {
    "llama2-7b-pure": "llama2-pure", "llama2-13b-pure": "llama2-pure",
    "llama2-7b-chat": "llama2-chat", "llama2-13b-chat": "llama2-chat",
    "vicuna-v15-7b": "vicuna", "vicuna-v15-13b": "vicuna",
    "mistral-v0.1-7b-pure": "mistral-pure", "mistral-v0.1-7b-instruct": "mistral-instruct",
    "phi-2-3b": "phi",
}


# --- init ---------------------------------------------------------------------


def init_llm_params(key: jax.Array, cfg: LLMConfig, dtype: jnp.dtype = jnp.float32) -> Params:
    """Random init with HF-compatible shapes. Projection kernels are stored
    [in, out] (right-multiply), i.e. the transpose of torch's [out, in]."""
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    D, I, L = cfg.dim, cfg.intermediate_size, cfg.n_layers
    H, Hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def dense(key, shape):
        # Generate directly in the target dtype: avoids multi-GB fp32
        # temporaries when initializing 7B-scale params in bf16 on one chip.
        fan_in = shape[-2] if len(shape) > 1 else shape[0]
        return jax.random.normal(key, shape, dtype=dtype) * jnp.asarray(fan_in ** -0.5, dtype=dtype)

    lk = jax.random.split(k_layers, 8)
    layers: Params = {
        "wq": dense(lk[0], (L, D, H * hd)),
        "wk": dense(lk[1], (L, D, Hkv * hd)),
        "wv": dense(lk[2], (L, D, Hkv * hd)),
        "wo": dense(lk[3], (L, H * hd, D)),
        "attn_norm": jnp.ones((L, D), dtype=dtype),
    }
    if cfg.arch == "llama":
        layers.update(
            w_gate=dense(lk[4], (L, D, I)),
            w_up=dense(lk[5], (L, D, I)),
            w_down=dense(lk[6], (L, I, D)),
            mlp_norm=jnp.ones((L, D), dtype=dtype),
        )
    else:  # phi: parallel block, single LN (with bias), biased projections
        layers.update(
            w_up=dense(lk[5], (L, D, I)),
            w_down=dense(lk[6], (L, I, D)),
            attn_norm_bias=jnp.zeros((L, D), dtype=dtype),
            bq=jnp.zeros((L, H * hd), dtype=dtype),
            bk=jnp.zeros((L, Hkv * hd), dtype=dtype),
            bv=jnp.zeros((L, Hkv * hd), dtype=dtype),
            bo=jnp.zeros((L, D), dtype=dtype),
            b_up=jnp.zeros((L, I), dtype=dtype),
            b_down=jnp.zeros((L, D), dtype=dtype),
        )

    params: Params = {
        "embed": jax.random.normal(k_embed, (cfg.padded_vocab_size, D), dtype=dtype) * jnp.asarray(0.02, dtype=dtype),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype=dtype),
        "lm_head": dense(k_head, (D, cfg.padded_vocab_size)),
    }
    if cfg.arch == "phi":
        params["final_norm_bias"] = jnp.zeros((D,), dtype=dtype)
        params["lm_head_bias"] = jnp.zeros((cfg.padded_vocab_size,), dtype=dtype)
    return params


def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int, dtype: jnp.dtype = jnp.bfloat16) -> Params:
    """KV cache [L, B, S, Hkv, hd]. dtype=jnp.int8 stores per-(token, head)
    symmetrically-quantized codes plus bf16 scales — half the HBM footprint
    and stream of bf16 (the cache is 10.4 GB at B=16/S=311 on the 7B MHA
    model; int8 unlocks batch sizes a 16 GB chip cannot hold otherwise)."""
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros(shape[:-1], dtype=jnp.bfloat16)
        cache["v_scale"] = jnp.zeros(shape[:-1], dtype=jnp.bfloat16)
    return cache


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., hd] -> (int8 codes, bf16 scale[...]) — symmetric absmax over hd.
    Same absmax/127 scheme as ops.quant._quantize_2d (weights) and the w8a8
    activation quant in _block's proj(); kept separate because the reduction
    axis/keepdims and dtype contracts differ per site — if the scheme itself
    changes (zero-guard, outlier clipping), change all three."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype: jnp.dtype) -> jnp.ndarray:
    return q.astype(dtype) * scale[..., None].astype(dtype)


# --- building blocks ----------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jnp.ndarray, rotary_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-Llama RoPE tables: [..., rotary_dim] with the half-split duplication
    (freqs tiled as [f, f], rotate_half = cat(-x2, x1))."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., rd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rotary_dim: int) -> jnp.ndarray:
    """x: [B, T, H, hd]; cos/sin: [B, T, rotary_dim] (broadcast over heads)."""
    xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = xr[..., :half], xr[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos_b = cos[:, :, None, :].astype(x.dtype)
    sin_b = sin[:, :, None, :].astype(x.dtype)
    xr = xr * cos_b + rotated * sin_b
    return jnp.concatenate([xr, xp], axis=-1) if rotary_dim < x.shape[-1] else xr


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def cached_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked einsum attention over a (small-T query, full cache) pair —
    the single-token decode path and the speculative verification chunk share
    THIS function so their logits are computed identically (a different
    attention implementation can flip near-tie argmaxes in bf16, breaking
    speculative decoding's exactness guarantee). fp32 softmax."""
    hd = q.shape[-1]
    n_rep = q.shape[2] // k.shape[2]
    kk = _repeat_kv(k, n_rep)
    vv = _repeat_kv(v, n_rep)
    scores = jnp.einsum("bqhd,bshd->bhqs", q, kk) / jnp.sqrt(hd).astype(q.dtype)
    scores = jnp.where(mask, scores.astype(jnp.float32), -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqs,bshd->bqhd", probs, vv)


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    impl: str = "xla",
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Full-sequence attention [B,T,H,hd] with bool mask [B,1,T,S]. The XLA
    path trusts the mask entirely; the Pallas path reduces the mask to
    per-example lengths, so the sliding window must be passed explicitly.
    impl="einsum" uses the decode-identical cached_attention.

    impl="ring" (or "ring:<axis>", default axis "fsdp") is context parallelism
    for long sequences: the time dim shards over the named mesh axis and K/V
    blocks rotate over the ICI ring (ops.ring_attention) — per-device attention
    memory is O(T/n). Requires an ambient mesh (jax.sharding.set_mesh, as the
    train scripts establish), causal RIGHT-PADDED sequences (the padding mask
    is implied by causality: pad keys sit after every valid query), and no
    sliding window. Self-attention only — with a KV cache (generation) or no
    usable mesh it falls back to the XLA path."""
    if impl == "pallas":
        from bridgelang_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, window=window)
    if impl == "einsum":
        return cached_attention(q, k, v, mask)
    if impl.startswith("ring"):
        axis = impl.split(":", 1)[1] if ":" in impl else "fsdp"
        mesh = jax.sharding.get_abstract_mesh()
        usable = (
            mesh is not None and not mesh.empty and axis in mesh.axis_names
            and mesh.shape[axis] > 1 and q.shape[1] == k.shape[1]
        )
        if usable:
            if window is not None:
                raise ValueError("ring attention does not support sliding windows")
            if q.shape[1] % mesh.shape[axis]:
                raise ValueError(
                    f"sequence length {q.shape[1]} must be a multiple of the "
                    f"{axis!r} axis size {mesh.shape[axis]} for ring attention"
                )
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from bridgelang_tpu.ops.ring_attention import ring_attention

            spec = P("replica", axis, None, None)  # batch over replica, time over the ring
            return jax.shard_map(
                partial(ring_attention, axis_name=axis, causal=True),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            )(q, k, v)
    n_rep = q.shape[2] // k.shape[2]
    k, v = _repeat_kv(k, n_rep), _repeat_kv(v, n_rep)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


# --- decoder forward ----------------------------------------------------------

# Minimum chunk length (tokens) for the w8a8 int8-activation matmul path;
# below this the weight stream dominates and bf16-dequant wins (see proj()).
W8A8_MIN_CHUNK = 8


def _remat_policy(name: Optional[str]):
    """Named rematerialization policies for the decoder-layer checkpoint
    (reference analogue: non-reentrant activation checkpointing on every
    decoder layer, fsdp.py:170-183 — which always recomputes everything).

    None/"full"  recompute the whole layer in the backward (min memory)
    "dots"       save matmul outputs, recompute elementwise/norms only —
                 skips re-running the MXU work at ~2x activation memory
                 (policy: dots_with_no_batch_dims_saveable)
    """
    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"Unknown remat policy {name!r} (use 'full' or 'dots')")


def _block(
    cfg: LLMConfig,
    lp: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_positions: Optional[jnp.ndarray],
    attention_impl: str,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One decoder block over a T-token chunk. If `kv` is given, computed K/V
    are scattered into it at `cache_positions` [B, T] and attention runs over
    the whole cache; else attention runs over the chunk itself."""
    B, T, D = x.shape
    H, Hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    if cfg.arch == "phi":
        h_in = layer_norm(x, lp["attn_norm"], lp["attn_norm_bias"], cfg.norm_eps)
    else:
        h_in = rms_norm(x, lp["attn_norm"], cfg.norm_eps)

    def proj(inp, name):
        # Base matmul + optional LoRA low-rank update (adapters are extra
        # stacked leaves added by bridgelang_tpu.training.lora). int8 weights
        # (bridgelang_tpu.ops.quant) dequantize inside the matmul: HBM reads
        # stay 1 byte/weight, MXU computes in the activation dtype. With
        # cfg.w8a8, activations quantize per-token and the matmul runs int8 —
        # but ONLY for chunks of >= W8A8_MIN_CHUNK tokens: the int8 path is a
        # THROUGHPUT lever for compute-bound prefill. Short chunks (decode
        # T=1, speculative verify T=7) are weight-stream-bound — measured
        # identical step time either way (the matmul fusions already run at
        # ~89% of HBM peak per the device trace) — so below the threshold the
        # bf16-dequant path wins on numerics alone: no activation-quant noise,
        # and decode/verify math matches the w8-only mode exactly.
        w = lp[name]
        s4 = lp.get(name + "_scale4")
        if s4 is not None:
            from bridgelang_tpu.ops.quant import INT4_COLUMN_PARALLEL

            # Tensor-parallel int4 (cfg.int4_shards > 1): column-parallel
            # leaves carry shard-blocked packing and shard on their output
            # dim; row-parallel ones (wo/w_down) keep global pairing, shard
            # on the contraction dim, and psum shard-local partials — both
            # via the matmul's custom_partitioning (ops/int4_matmul.py).
            col = name in INT4_COLUMN_PARALLEL
            n_shards = cfg.int4_shards
            row = (not col) and cfg.int4_shards > 1
            # Packed int4: fused Pallas matmul streams the packed bytes and
            # recovers both output halves with two dots of the raw bytes
            # (ops/int4_matmul.py) — XLA-level dequant was measured to
            # materialize bf16 weights (18 GB/s effective vs int8's 444).
            # With cfg.w8a8 (the serving configs) the dots run on the MXU
            # int8 path via per-token activation quant — unlike the int8
            # weights' w8a8 branch below there is NO min-chunk gate, because
            # the bf16-dot kernel is MXU-pass-bound even at decode M (437
            # GB/s of packed bytes measured), so a8 speeds every chunk.
            # Training (finetune.py QLoRA) leaves w8a8 off: bf16 dots keep
            # the forward numerics that the STE backward assumes.
            from bridgelang_tpu.ops.int4_matmul import matmul_int4, matmul_int4_a8

            y = (matmul_int4_a8(inp, w, s4, n_shards, row) if cfg.w8a8
                 else matmul_int4(inp, w, s4, n_shards, row))
        elif w.dtype == jnp.int8 and cfg.w8a8 and T >= W8A8_MIN_CHUNK:
            from bridgelang_tpu.ops.quant import quantize_activations_per_token

            q, xs = quantize_activations_per_token(inp)
            acc = jax.lax.dot_general(q, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * xs * lp[name + "_scale"].astype(jnp.float32)).astype(inp.dtype)
        elif w.dtype == jnp.int8:
            y = (inp @ w.astype(inp.dtype)) * lp[name + "_scale"].astype(inp.dtype)
        else:
            y = inp @ w
        a = lp.get(name + "_lora_a")
        if a is not None:
            y = y + (inp @ a.astype(inp.dtype)) @ lp[name + "_lora_b"].astype(inp.dtype)
        return y

    q = proj(h_in, "wq")
    k = proj(h_in, "wk")
    v = proj(h_in, "wv")
    if cfg.use_bias:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)
    q = apply_rope(q, cos, sin, cfg.rotary_dim)
    k = apply_rope(k, cos, sin, cfg.rotary_dim)

    if kv is not None:
        # Scatter this chunk's K/V into the cache at per-example positions.
        def scatter(cache, new):
            def one(c, n, pos):  # c: [S, ...], n: [T, ...], pos: [T]
                return c.at[pos].set(n.astype(c.dtype))

            return jax.vmap(one)(cache, new, cache_positions)

        if len(kv) == 4:  # int8 cache: codes + per-(token, head) scales
            ck, cv, ks, vs = kv
            qk, sk = _quantize_kv(k)
            qv, sv = _quantize_kv(v)
            ck, ks = scatter(ck, qk), scatter(ks, sk)
            cv, vs = scatter(cv, qv), scatter(vs, sv)
            attn_k = _dequantize_kv(ck, ks, q.dtype)
            attn_v = _dequantize_kv(cv, vs, q.dtype)
            new_kv = (ck, cv, ks, vs)
        else:
            cache_k, cache_v = kv
            cache_k = scatter(cache_k, k)
            cache_v = scatter(cache_v, v)
            attn_k, attn_v = cache_k, cache_v
            new_kv = (cache_k, cache_v)
    else:
        attn_k, attn_v = k, v
        new_kv = (k, v)

    if T == 1 and kv is not None:
        # Single-token decode: lightweight masked attention over the cache.
        attn_out = cached_attention(q, attn_k.astype(q.dtype), attn_v.astype(q.dtype), mask)
    else:
        attn_out = full_attention(
            q, attn_k.astype(q.dtype), attn_v.astype(q.dtype), mask, attention_impl,
            window=cfg.sliding_window,
        )

    attn_out = proj(attn_out.reshape(B, T, H * hd), "wo")
    if cfg.use_bias:
        attn_out = attn_out + lp["bo"]

    if cfg.arch == "phi":
        # Parallel residual: x + attn(ln(x)) + mlp(ln(x))
        mlp_out = proj(jax.nn.gelu(proj(h_in, "w_up") + lp["b_up"], approximate=True), "w_down") + lp["b_down"]
        return x + attn_out + mlp_out, new_kv

    x = x + attn_out
    h2 = rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
    mlp_out = proj(jax.nn.silu(proj(h2, "w_gate")) * proj(h2, "w_up"), "w_down")
    return x + mlp_out, new_kv


def llm_forward(
    params: Params,
    cfg: LLMConfig,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    cache: Optional[Params] = None,
    cache_positions: Optional[jnp.ndarray] = None,
    attention_impl: str = "xla",
    remat: bool = False,
    remat_policy: Optional[str] = None,
    cache_write: str = "scatter",
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Run the decoder stack over input embeddings.

    embeds:    [B, T, D]   (token or multimodal-fused embeddings)
    positions: [B, T]      RoPE positions
    mask:      [B, 1, T, S] bool attention mask (S = T, or cache length)
    cache:     optional KV cache pytree from `init_kv_cache`
    cache_positions: [B, T] cache write indices (required with cache)
    cache_write: "scatter" writes K/V at per-example `cache_positions` and
      attends over the whole cache (decode steps, speculative chunks).
      "contiguous" is the PREFILL fast path: the chunk occupies cache slots
      0..T-1 for every example (right-padded prompts), so K/V land via one
      dynamic_update_slice instead of a gather/scatter (measured ~2-7 ms
      cheaper on the 7B at T=304) and attention runs over the chunk itself —
      equivalent because a fresh cache holds nothing beyond the chunk. The
      mask must then be chunk-extent [B, 1, T, T].

    Returns (hidden [B, T, D], updated cache or None).
    """
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)
    x = embeds
    contiguous = cache is not None and cache_write == "contiguous"
    quantized_cache = cache is not None and "k_scale" in cache

    def body(x, layer_in):
        lp, layer_kv = layer_in
        if contiguous:
            x, (k, v) = _block(cfg, lp, x, cos, sin, mask, None, None, attention_impl)

            def upd(c, n):
                return jax.lax.dynamic_update_slice_in_dim(c, n.astype(c.dtype), 0, axis=1)

            if quantized_cache:
                ck, cv, ks, vs = layer_kv
                qk, sk = _quantize_kv(k)
                qv, sv = _quantize_kv(v)
                new_kv = (upd(ck, qk), upd(cv, qv), upd(ks, sk), upd(vs, sv))
            else:
                ck, cv = layer_kv
                new_kv = (upd(ck, k), upd(cv, v))
            return x, new_kv
        x, new_kv = _block(cfg, lp, x, cos, sin, mask, layer_kv, cache_positions, attention_impl)
        return x, new_kv

    if remat:
        body = jax.checkpoint(body, policy=_remat_policy(remat_policy))

    # NB: keep the layer scan as a plain while loop — XLA double-buffers the
    # stacked-weight stream across iterations; unrolling was measured STRICTLY
    # slower on v5e int8 decode (10.4 -> 21 ms/step at unroll=2, 31 at 4).
    if cache is not None:
        keys = ("k", "v", "k_scale", "v_scale") if quantized_cache else ("k", "v")
        xs = (params["layers"], tuple(cache[key] for key in keys))
        x, new_leaves = jax.lax.scan(body, x, xs)
        new_cache = dict(zip(keys, new_leaves))
    else:
        x, _ = jax.lax.scan(lambda c, lp: body(c, (lp, None)), x, params["layers"])
        new_cache = None

    if cfg.arch == "phi":
        x = layer_norm(x, params["final_norm"], params["final_norm_bias"], cfg.norm_eps)
    else:
        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return x, new_cache


def embed_tokens(params: Params, input_ids: jnp.ndarray, dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    table = params["embed"]
    if table.dtype == jnp.int8:
        emb = table[input_ids].astype(dtype or jnp.bfloat16) * params["embed_scale"][input_ids].astype(dtype or jnp.bfloat16)
        return emb
    emb = table[input_ids]
    return emb.astype(dtype) if dtype is not None else emb


def lm_logits(params: Params, hidden: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    head = params["lm_head"]
    if head.dtype == jnp.int8:
        logits = (hidden @ head.astype(hidden.dtype)) * params["lm_head_scale"].astype(hidden.dtype)
    else:
        logits = hidden @ head
    if cfg.arch == "phi":
        logits = logits + params["lm_head_bias"]
    return logits


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
