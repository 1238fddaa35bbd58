"""PrismaticVLM: fused-backbone VLM with multimodal fusion + jitted generation.

TPU-native re-design of the reference's PrismaticVLM
(reference: prismatic/models/vlms/prismatic.py:38-621 and its standalone HF
twin, prismatic/extern/hf/modeling_prismatic.py:63-489). The semantics are
identical — projected vision patches are inserted **after the BOS token**
(fusion at prismatic.py:367-420 / modeling_prismatic.py:362-415), labels over
patch positions are IGNORE_INDEX, freeze stages gate the same module groups —
but the execution model is JAX-first:

* Everything is a pure function over an explicit param pytree
  {"vision", "projector", "llm"}; `jax.jit`/`pjit` wrap the outside.
* Generation is a fixed-shape prefill + `lax.scan` greedy decode with a
  preallocated KV cache — no Python-loop GenerationMixin, no per-step host
  sync, and **batched generation works** (the reference hard-limits
  generation to batch size 1, modeling_prismatic.py:460-463).
* Prompts are right-padded to a static bucket so serving never recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bridgelang_tpu.models.llm.llama import (
    LLMConfig,
    LLM_CONFIGS,
    LLM_FAMILIES,
    embed_tokens,
    init_kv_cache,
    init_llm_params,
    llm_forward,
    lm_logits,
)
from bridgelang_tpu.models.projector import apply_projector, init_projector_params
from bridgelang_tpu.models.vision.vit import build_vision_backbone
from bridgelang_tpu.ops.image_ops import transform_config_for_backbone

IGNORE_INDEX = -100
# Llama SPIECE_UNDERLINE token ('▁') — training sequences end the prompt with
# it, so inference must too (reference: vlas/openvla.py:58-66).
LLAMA_EMPTY_TOKEN = 29871

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    model_id: str = "prism-dinosiglip-224px+7b"
    vision_backbone_id: str = "dinosiglip-vit-so-224px"
    llm_backbone_id: str = "llama2-7b-pure"
    arch_specifier: str = "no-align+fused-gelu-mlp"
    image_resize_strategy: str = "resize-naive"
    llm_max_length: int = 2048
    llm: LLMConfig = dataclasses.field(default_factory=LLMConfig)
    # Optional explicit vision config(s) overriding the registry lookup:
    # a ViTConfig, or a (ViTConfig, ViTConfig) pair for fused towers.
    # Used for depth-trimmed compile proxies and tiny test models.
    vision_override: Optional[Any] = None
    # Decoder attention override: None picks the backend default (pallas on
    # TPU, xla elsewhere). "ring"/"ring:<axis>" enables context-parallel
    # training attention for long sequences (models/llm/llama.full_attention).
    attention_impl: Optional[str] = None

    @classmethod
    def from_ids(
        cls,
        model_id: str,
        vision_backbone_id: str,
        llm_backbone_id: str,
        arch_specifier: str,
        image_resize_strategy: str = "resize-naive",
        llm_max_length: int = 2048,
        llm_overrides: Optional[Dict[str, Any]] = None,
    ) -> "VLMConfig":
        llm = LLM_CONFIGS[llm_backbone_id]
        if llm_overrides:
            llm = dataclasses.replace(llm, **llm_overrides)
        return cls(
            model_id=model_id,
            vision_backbone_id=vision_backbone_id,
            llm_backbone_id=llm_backbone_id,
            arch_specifier=arch_specifier,
            image_resize_strategy=image_resize_strategy,
            llm_max_length=llm_max_length,
            llm=llm,
        )

    @property
    def llm_family(self) -> str:
        return LLM_FAMILIES.get(self.llm_backbone_id, "llama2-pure")


class PrismaticVLM:
    """Stateless model orchestrator: holds configs + module definitions, and
    exposes pure functions over the parameter pytree."""

    def __init__(self, cfg: VLMConfig, dtype: jnp.dtype = jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        if cfg.vision_override is not None:
            from bridgelang_tpu.models.vision.vit import FusedViT, ViT

            vo = cfg.vision_override
            if isinstance(vo, tuple):
                self.vision_module = FusedViT(vo[0], vo[1], dtype=dtype)
                self.vision_dim = vo[0].width + vo[1].width
                self.num_patches = vo[0].num_patches
            else:
                self.vision_module = ViT(vo, dtype=dtype)
                self.vision_dim, self.num_patches = vo.width, vo.num_patches
        else:
            self.vision_module, self.vision_dim, self.num_patches = build_vision_backbone(
                cfg.vision_backbone_id, dtype=dtype
            )
        self.image_transform = transform_config_for_backbone(cfg.vision_backbone_id, cfg.image_resize_strategy)
        # Decoder attention: Pallas flash kernel on TPU, XLA elsewhere (tests);
        # cfg.attention_impl overrides (e.g. "ring" for context parallelism).
        self.attention_impl = cfg.attention_impl or ("pallas" if jax.default_backend() == "tpu" else "xla")
        # KV cache storage dtype for generation. jnp.int8 halves the cache's
        # HBM footprint/stream (per-(token, head) symmetric quant + bf16
        # scales) — at B=16 the 7B's bf16 cache alone is 10.4 GB and cannot
        # share a 16 GB chip with the weights; int8 unlocks it.
        self.cache_dtype = jnp.bfloat16

    # --- params ---------------------------------------------------------

    def init_params(self, key: jax.Array, param_dtype: jnp.dtype = jnp.float32) -> Params:
        k_vis, k_proj, k_llm = jax.random.split(key, 3)
        # Derive the dummy input from the vision module itself (robust to
        # test-time tiny backbones swapped in under the same backbone id).
        from bridgelang_tpu.models.vision.vit import FusedViT

        if isinstance(self.vision_module, FusedViT):
            img_size, n_ch = self.vision_module.cfg_a.image_size, 6
        else:
            img_size, n_ch = self.vision_module.cfg.image_size, 3
        dummy = jnp.zeros((1, n_ch, img_size, img_size), dtype=param_dtype)
        vision = self.vision_module.init(k_vis, dummy)["params"]
        vision = jax.tree.map(lambda x: x.astype(param_dtype), vision)
        projector = init_projector_params(
            k_proj, self.cfg.arch_specifier, self.vision_dim, self.cfg.llm.dim, dtype=param_dtype
        )
        llm = init_llm_params(k_llm, self.cfg.llm, dtype=param_dtype)
        return {"vision": vision, "projector": projector, "llm": llm}

    # --- forward pieces ---------------------------------------------------

    def encode_vision(self, params: Params, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, n_towers*3, H, W] -> projected patch embeddings [B, P, llm_dim].

        The tower output and projected patches are pinned to batch sharding
        (no-op without an ambient mesh): this seam is where GSPMD's
        parameter-driven propagation is ambiguous — see
        parallel.sharding.constrain_batch."""
        from bridgelang_tpu.parallel.sharding import constrain_batch

        patches = self.vision_module.apply({"params": params["vision"]}, pixel_values.astype(self.dtype))
        # apply_projector's final layer already constrains its output.
        return apply_projector(params["projector"], constrain_batch(patches))

    def fuse_after_bos(
        self,
        token_embeds: jnp.ndarray,
        patch_embeds: jnp.ndarray,
        attention_mask: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Insert patches after BOS: [bos | patches | text...] (reference:
        prismatic.py:399-420). Requires left position 0 to be BOS (right padding)."""
        from bridgelang_tpu.parallel.sharding import constrain_batch

        b, p = patch_embeds.shape[0], patch_embeds.shape[1]
        fused = constrain_batch(
            jnp.concatenate([token_embeds[:, :1], patch_embeds.astype(token_embeds.dtype), token_embeds[:, 1:]], axis=1)
        )
        patch_mask = jnp.ones((b, p), dtype=attention_mask.dtype)
        fused_mask = jnp.concatenate([attention_mask[:, :1], patch_mask, attention_mask[:, 1:]], axis=1)
        fused_labels = None
        if labels is not None:
            patch_labels = jnp.full((b, p), IGNORE_INDEX, dtype=labels.dtype)
            fused_labels = jnp.concatenate([labels[:, :1], patch_labels, labels[:, 1:]], axis=1)
        return fused, fused_mask, fused_labels

    def _causal_mask(self, fused_mask: jnp.ndarray, s_len: Optional[int] = None) -> jnp.ndarray:
        """[B, T] validity -> [B, 1, T, S] causal+padding bool mask; applies
        the LLM's sliding window when configured (Mistral)."""
        b, t = fused_mask.shape
        s = t if s_len is None else s_len
        key_valid = fused_mask if s == t else jnp.pad(fused_mask, ((0, 0), (0, s - t)))
        q_idx = jnp.arange(t)[:, None]
        k_idx = jnp.arange(s)[None, :]
        causal = k_idx <= q_idx
        window = self.cfg.llm.sliding_window
        if window is not None:
            causal = causal & (k_idx > q_idx - window)
        return causal[None, None] & key_valid[:, None, None, :].astype(bool)

    # --- training forward -------------------------------------------------

    def forward_train(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: jnp.ndarray,
        labels: jnp.ndarray,
        remat: bool = True,
        remat_policy: Optional[str] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Multimodal forward -> (logits [B, F, V], fused labels [B, F])."""
        patch_embeds = self.encode_vision(params, pixel_values)
        token_embeds = embed_tokens(params["llm"], input_ids, dtype=self.dtype)
        fused, fused_mask, fused_labels = self.fuse_after_bos(token_embeds, patch_embeds, attention_mask, labels)
        t = fused.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t), fused.shape[:2])
        mask = self._causal_mask(fused_mask)
        hidden, _ = llm_forward(
            params["llm"], self.cfg.llm, fused, positions, mask,
            attention_impl=self.attention_impl, remat=remat, remat_policy=remat_policy,
        )
        logits = lm_logits(params["llm"], hidden, self.cfg.llm)
        return logits, fused_labels

    def forward_hidden(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: jnp.ndarray,
        labels: jnp.ndarray,
        remat: bool = True,
        remat_policy: Optional[str] = None,
        parallel_actions: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Like forward_train but returns final hidden states instead of
        logits — callers compute the loss with a chunked LM head so the full
        [B, F, vocab] logits tensor never materializes (a large memory win at
        32k vocab; see training.trainer.chunked_ce_and_metrics).

        `parallel_actions=True` trains the OFT-style parallel-decode objective
        that `generate_parallel` serves (the 25-50x external recipe the
        reference cites but does not implement, reference README.md:16-17):
        every supervised position's token embedding is replaced by the query
        token's (no teacher forcing between action dims), supervised positions
        are excluded as attention KEYS everywhere (unknown at serve time), and
        supervised ROWS attend only the valid non-supervised prefix. Positions
        and the shifted chunked-CE are unchanged, so row p-1 predicts token p
        exactly like generate_parallel's query rows — after fine-tuning with
        this flag, serve with `--parallel_decode`."""
        patch_embeds = self.encode_vision(params, pixel_values)
        token_embeds = embed_tokens(params["llm"], input_ids, dtype=self.dtype)
        fused, fused_mask, fused_labels = self.fuse_after_bos(token_embeds, patch_embeds, attention_mask, labels)
        t = fused.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t), fused.shape[:2])
        attention_impl = self.attention_impl
        if parallel_actions:
            act = fused_labels != IGNORE_INDEX  # [B, F] supervised targets
            q_embed = embed_tokens(
                params["llm"], jnp.full((1, 1), LLAMA_EMPTY_TOKEN, jnp.int32), dtype=self.dtype
            )[0, 0]
            fused = jnp.where(act[..., None], q_embed, fused)
            # Serve-time keys are exactly the prompt prefix, so exclude EVERY
            # position from the first supervised one onward — not just the
            # supervised ones. (With predict_stop_token=False the EOS after
            # the actions is valid-but-unlabeled; leaving it attendable would
            # train query rows against a key generate_parallel never has.)
            has_act = act.any(axis=1)
            first_act = jnp.argmax(act, axis=1)  # first supervised position
            tail = jnp.arange(t)[None, :] >= first_act[:, None]
            key_ok = fused_mask.astype(bool) & ~(tail & has_act[:, None])
            causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
            row_mask = jnp.where(act[:, :, None], True, causal[None])
            mask = (row_mask & key_ok[:, None, :])[:, None]  # [B, 1, F, F]
            attention_impl = "xla"  # general mask; outside the causal+length family
        else:
            mask = self._causal_mask(fused_mask)
        hidden, _ = llm_forward(
            params["llm"], self.cfg.llm, fused, positions, mask,
            attention_impl=attention_impl, remat=remat, remat_policy=remat_policy,
        )
        return hidden, fused_labels

    # --- generation ---------------------------------------------------------

    def _prefill_impl(self, b: int, t: int) -> str:
        """Attention impl for the PREFILL chunk. Plain masked einsum beats the
        flash kernel below ~512 tokens — at the VLA's 304-token multimodal
        sequence the kernel's grid overhead dominates (measured on the 7B-int8:
        12.3 ms einsum+contiguous vs 22.5 ms pallas+scatter per prefill) — as
        long as the [B, H, T, T] fp32 score tensor stays modest. Training and
        long prompts keep the flash kernel."""
        score_bytes = b * self.cfg.llm.n_heads * t * t * 4
        if self.attention_impl == "pallas" and t <= 512 and score_bytes <= 512 * 1024 * 1024:
            return "einsum"
        return self.attention_impl

    def generate_greedy(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: jnp.ndarray,
        max_new_tokens: int,
        cache_dtype: Optional[jnp.dtype] = None,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Jittable batched decode: greedy by default, temperature sampling
        when `temperature > 0` and an `rng` key is given (the VLM REPL's
        sampling mode; the VLA path always decodes greedily).

        input_ids/attention_mask: [B, T] right-padded prompts (BOS first).
        Returns generated token ids [B, max_new_tokens].
        """
        b, t_in = input_ids.shape
        cfg = self.cfg.llm
        cache_dtype = self.cache_dtype if cache_dtype is None else cache_dtype
        patch_embeds = self.encode_vision(params, pixel_values)
        token_embeds = embed_tokens(params["llm"], input_ids, dtype=self.dtype)
        fused, fused_mask, _ = self.fuse_after_bos(token_embeds, patch_embeds, attention_mask)
        f_len = fused.shape[1]
        s_len = f_len + max_new_tokens
        true_len = jnp.sum(fused_mask.astype(jnp.int32), axis=1)  # [B]

        cache = init_kv_cache(cfg, b, s_len, dtype=cache_dtype)
        positions = jnp.broadcast_to(jnp.arange(f_len), (b, f_len))
        mask = self._causal_mask(fused_mask)  # chunk-extent: fresh cache holds nothing else
        hidden, cache = llm_forward(
            params["llm"], cfg, fused, positions, mask,
            cache=cache, cache_positions=positions,
            attention_impl=self._prefill_impl(b, f_len), remat=False,
            cache_write="contiguous",
        )
        sample = temperature > 0.0 and rng is not None

        def select(logits, key):
            if sample:
                return jax.random.categorical(key, logits.astype(jnp.float32) / temperature, axis=-1).astype(jnp.int32)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        keys = jax.random.split(rng, max_new_tokens + 1) if sample else jnp.zeros((max_new_tokens + 1, 2), jnp.uint32)

        # Last REAL token's hidden state drives the first sampled token.
        last_idx = jnp.clip(true_len - 1, 0, f_len - 1)
        last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # [B,1,D]
        next_token = select(lm_logits(params["llm"], last_hidden, cfg), keys[0] if sample else None)

        def step(carry, i):
            cache, token = carry
            pos = (true_len + i)[:, None]  # [B,1] position AND cache slot of this token
            tok_embed = embed_tokens(params["llm"], token, dtype=self.dtype)
            k_idx = jnp.arange(s_len)[None, None, None, :]
            step_mask = (k_idx <= pos[:, :, None, None]).astype(bool)
            if cfg.sliding_window is not None:
                step_mask &= k_idx > pos[:, :, None, None] - cfg.sliding_window
            hidden, new_cache = llm_forward(
                params["llm"], cfg, tok_embed, pos, step_mask,
                cache=cache, cache_positions=pos,
                attention_impl=self.attention_impl, remat=False,
            )
            nxt = select(lm_logits(params["llm"], hidden, cfg), keys[i + 1] if sample else None)
            return (new_cache, nxt), token[:, 0]

        # Prefill already produced token 0, so only max_new_tokens - 1 decode
        # passes are needed; the final token never re-enters the decoder
        # (one full 7-GB weight pass saved per predict_action at 7B-int8).
        (_, final_tok), toks = jax.lax.scan(step, (cache, next_token), jnp.arange(max_new_tokens - 1))
        toks = jnp.transpose(toks, (1, 0)) if max_new_tokens > 1 else jnp.zeros((b, 0), jnp.int32)
        return jnp.concatenate([toks, final_tok], axis=1)  # [B, max_new_tokens]

    def generate_speculative(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: jnp.ndarray,
        draft_tokens: jnp.ndarray,
        cache_dtype: Optional[jnp.dtype] = None,
        margin_threshold: float = 0.25,
        return_accept_count: bool = False,
    ) -> jnp.ndarray:
        """Speculative greedy decode with an external draft — equivalent to
        `generate_greedy`, faster when the draft is right.
        `return_accept_count=True` additionally returns the per-example count
        of tokens that skipped the sequential path ([B] int32, in [1, n];
        token 0 is always canonical) — the acceptance telemetry bench.py
        reports for control-loop streams.

        Robot control is smooth: at 5-15 Hz, consecutive `predict_action`
        calls usually emit mostly-identical action tokens, so the PREVIOUS
        timestep's tokens are a free, high-acceptance draft. One verification
        pass (a 7-token chunk through the decoder — one weight stream instead
        of six) checks the whole draft; the accepted prefix stands and only
        tokens after the first rejection are re-decoded in a dynamic
        `lax.while_loop`. Measured on the 7B flagship: ~40% faster with a
        fully-accepted draft, +4 ms worst case.

        Exactness: the verification chunk uses the SAME einsum attention as
        the decode path, but XLA may tile a T=7 matmul differently than T=1,
        perturbing logits at bf16 noise scale. A position is therefore
        accepted only when its top-1 margin exceeds `margin_threshold` —
        near-ties (where noise could flip the argmax) always go through the
        canonical sequential path, so outputs match generate_greedy whenever
        the decode-vs-verify numeric difference is below the threshold (real
        checkpoints have wide margins; exact in fp32 by construction).
        CAVEAT with an int8 KV cache: a K/V element near an int8 rounding
        boundary can quantize differently in the T=7 verification chunk than
        sequential decode would, shifting later logits by up to a full quant
        step — beyond what the margin gate guards. Keep the bf16 cache
        (default) when strict greedy-equivalence matters.

        The reference has no analogue (its external speedup pointers, OFT and
        FAST, both change the model; this changes nothing about the model).

        draft_tokens: [B, max_new_tokens] int32 (e.g. the previous action's
        tokens; garbage is safe, just slow). Returns [B, max_new_tokens].
        """
        b = input_ids.shape[0]
        n = draft_tokens.shape[1]
        cfg = self.cfg.llm
        cache_dtype = self.cache_dtype if cache_dtype is None else cache_dtype
        patch_embeds = self.encode_vision(params, pixel_values)
        token_embeds = embed_tokens(params["llm"], input_ids, dtype=self.dtype)
        fused, fused_mask, _ = self.fuse_after_bos(token_embeds, patch_embeds, attention_mask)
        f_len = fused.shape[1]
        s_len = f_len + n
        true_len = jnp.sum(fused_mask.astype(jnp.int32), axis=1)  # [B]

        cache = init_kv_cache(cfg, b, s_len, dtype=cache_dtype)
        positions = jnp.broadcast_to(jnp.arange(f_len), (b, f_len))
        mask = self._causal_mask(fused_mask)  # chunk-extent: fresh cache holds nothing else
        hidden, cache = llm_forward(
            params["llm"], cfg, fused, positions, mask,
            cache=cache, cache_positions=positions,
            attention_impl=self._prefill_impl(b, f_len), remat=False,
            cache_write="contiguous",
        )
        last_idx = jnp.clip(true_len - 1, 0, f_len - 1)
        last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
        token0 = jnp.argmax(lm_logits(params["llm"], last_hidden, cfg), axis=-1).astype(jnp.int32)  # [B,1]
        if n == 1:
            return (token0, jnp.ones((b,), jnp.int32)) if return_accept_count else token0

        # --- verification pass: [token0, draft[1:]] as ONE chunk ---
        # Decode-consistent numerics: the int8-weight w8a8 branch gates on
        # chunk length (llama.py W8A8_MIN_CHUNK), so sequential decode (T=1)
        # always runs the bf16-dequant matmuls. A verify chunk of
        # n >= W8A8_MIN_CHUNK must NOT cross onto the int8-activation path —
        # its logits would differ from decode by activation-quant error far
        # beyond the bf16 tiling noise margin_threshold is sized for, breaking
        # the greedy-equivalence contract for action_dim >= 8 models (e.g.
        # bimanual). int4 (w4a8) weights have no chunk gate — decode and
        # verify both quantize — so they keep cfg as-is.
        from bridgelang_tpu.models.llm.llama import W8A8_MIN_CHUNK

        has_int4 = any(k.endswith("_scale4") for k in params["llm"]["layers"])
        if cfg.w8a8 and n >= W8A8_MIN_CHUNK and not has_int4:
            cfg = dataclasses.replace(cfg, w8a8=False)
        ver_in = jnp.concatenate([token0, draft_tokens[:, 1:].astype(jnp.int32)], axis=1)  # [B, n]
        pos_chunk = true_len[:, None] + jnp.arange(n)[None, :]  # token i sits at true_len + i
        k_idx = jnp.arange(s_len)[None, None, None, :]
        ver_mask = k_idx <= pos_chunk[:, None, :, None]
        if cfg.sliding_window is not None:
            ver_mask &= k_idx > pos_chunk[:, None, :, None] - cfg.sliding_window
        ver_embeds = embed_tokens(params["llm"], ver_in, dtype=self.dtype)
        # einsum attention — the SAME function the single-token decode path
        # uses, so verification logits match decode logits bitwise (chunk rows
        # also sit at arbitrary cache positions, outside the pallas kernel's
        # queries-at-keys-0..T-1 contract).
        hidden, cache = llm_forward(
            params["llm"], cfg, ver_embeds, pos_chunk, ver_mask,
            cache=cache, cache_positions=pos_chunk,
            attention_impl="einsum", remat=False,
        )
        ver_logits = lm_logits(params["llm"], hidden, cfg).astype(jnp.float32)  # [B, n, V]
        g = jnp.argmax(ver_logits, axis=-1).astype(jnp.int32)  # [B, n]
        top2 = jax.lax.top_k(ver_logits, 2)[0]  # [B, n, 2]
        margin_ok = (top2[..., 0] - top2[..., 1]) > margin_threshold  # [B, n]

        # out[0] = token0 (canonical, from prefill); out[i] = g[i-1], accepted
        # while every verify input matched AND every accepted position had a
        # safe top-1 margin.
        out = jnp.concatenate([token0, g[:, :-1]], axis=1)  # [B, n]
        input_ok = ver_in[:, 1:] == g[:, :-1]  # [B, n-1]: draft[i] == out[i]
        # step_ok[i-1]: token i acceptable given tokens < i accepted
        step_ok = margin_ok[:, : n - 1] & jnp.concatenate(
            [jnp.ones((b, 1), bool), input_ok[:, : n - 2]], axis=1
        )
        k = 1 + jnp.sum(jnp.cumprod(step_ok.astype(jnp.int32), axis=1), axis=1)  # [B] accepted count
        j0 = jnp.minimum(jnp.min(k), n).astype(jnp.int32)

        # --- sequential fix-up from the first mismatch (dynamic trip count;
        # zero iterations when the whole draft was accepted) ---
        def cond(carry):
            j, _, _ = carry
            return j < n

        def body(carry):
            j, cache, out = carry
            tok = jax.lax.dynamic_slice_in_dim(out, j - 1, 1, axis=1)  # exact out[j-1]
            pos = (true_len + j - 1)[:, None]
            m = jnp.arange(s_len)[None, None, None, :] <= pos[:, :, None, None]
            if cfg.sliding_window is not None:
                m &= jnp.arange(s_len)[None, None, None, :] > pos[:, :, None, None] - cfg.sliding_window
            h, cache = llm_forward(
                params["llm"], cfg, embed_tokens(params["llm"], tok, dtype=self.dtype), pos, m,
                cache=cache, cache_positions=pos,
                attention_impl=self.attention_impl, remat=False,
            )
            nxt = jnp.argmax(lm_logits(params["llm"], h, cfg), axis=-1).astype(jnp.int32)  # [B,1]
            out = jax.lax.dynamic_update_slice_in_dim(out, nxt, j, axis=1)
            return j + 1, cache, out

        _, _, out = jax.lax.while_loop(cond, body, (j0, cache, out))
        if return_accept_count:
            return out, jnp.minimum(k, n).astype(jnp.int32)
        return out

    def generate_parallel(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: jnp.ndarray,
        max_new_tokens: int,
        query_token_id: int = LLAMA_EMPTY_TOKEN,
    ) -> jnp.ndarray:
        """One-shot parallel decode: all `max_new_tokens` positions predicted
        from a SINGLE forward pass — each query i sits at position
        true_len + i and attends to the multimodal prefix only (no
        query-to-query attention), so the tokens are conditionally independent
        given the prefix.

        This is the OFT-style fast action decoding the reference cites as a
        25-50x-faster external recipe (reference README.md:16-17) but does not
        implement. A model must be fine-tuned with this objective (supervise
        all action positions against prefix-only attention) for the outputs to
        be meaningful; greedy sequential decoding stays the default.
        """
        b = input_ids.shape[0]
        cfg = self.cfg.llm
        n_q = max_new_tokens - 1  # token 0 reads off the real last prompt position
        patch_embeds = self.encode_vision(params, pixel_values)
        token_embeds = embed_tokens(params["llm"], input_ids, dtype=self.dtype)
        fused, fused_mask, _ = self.fuse_after_bos(token_embeds, patch_embeds, attention_mask)
        f_len = fused.shape[1]
        true_len = jnp.sum(fused_mask.astype(jnp.int32), axis=1)  # [B]

        # Query block: token i (i >= 1) is predicted from a query row placed at
        # position true_len + i - 1, attending the valid prefix only.
        q_ids = jnp.full((b, max(n_q, 1)), query_token_id, dtype=jnp.int32)
        q_embeds = embed_tokens(params["llm"], q_ids, dtype=self.dtype)[:, :n_q]
        seq = jnp.concatenate([fused, q_embeds], axis=1)
        t = f_len + n_q

        prefix_pos = jnp.broadcast_to(jnp.arange(f_len), (b, f_len))
        query_pos = true_len[:, None] + jnp.arange(n_q)[None, :]
        positions = jnp.concatenate([prefix_pos, query_pos], axis=1)

        # Mask: prefix rows causal over valid prefix; query rows see ONLY the
        # valid prefix (no query-to-query, no self).
        key_valid = jnp.concatenate([fused_mask.astype(bool), jnp.zeros((b, n_q), bool)], axis=1)
        causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        is_query_row = jnp.arange(t) >= f_len
        row_mask = jnp.where(is_query_row[:, None], True, causal)  # queries: all keys allowed...
        mask = (row_mask[None] & key_valid[:, None, :])[:, None]   # ...then prefix-validity filters

        hidden, _ = llm_forward(
            params["llm"], cfg, seq, positions, mask,
            attention_impl="xla",  # general mask; not the causal+length family
            remat=False,
        )
        # Token 0 from the last REAL prompt position (= sequential greedy's
        # first token); tokens 1..n-1 from the query rows.
        last_idx = jnp.clip(true_len - 1, 0, f_len - 1)
        h0 = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # [B,1,D]
        head_in = jnp.concatenate([h0, hidden[:, f_len:]], axis=1)
        logits = lm_logits(params["llm"], head_in, cfg)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # --- freeze stages ------------------------------------------------------

    def trainable_mask(self, params: Params, stage: str) -> Params:
        """Boolean pytree: which params train at `stage`
        (reference: prismatic.py:129-241; last-layer modules per llama2.py:100-102
        = final decoder layer + final norm + lm_head)."""
        F, T = False, True
        group = {
            "align": dict(vision=F, projector=T, llm=F),
            "finetune": dict(vision=F, projector=T, llm=T),
            "vla-train": dict(vision=F, projector=T, llm=T),
            "full-finetune": dict(vision=T, projector=T, llm=T),
            "vla-full-train": dict(vision=T, projector=T, llm=T),
            "last-layer-finetune": dict(vision=F, projector=F, llm="last"),
            "vla-last-layer-train": dict(vision=F, projector=F, llm="last"),
            "vla-sandwich-train": dict(vision=T, projector=T, llm="last"),
        }[stage]

        def fill(tree, value):
            return jax.tree.map(lambda _: value, tree)

        llm_spec = group["llm"]
        if llm_spec == "last":
            n_layers = self.cfg.llm.n_layers
            llm_mask = fill(params["llm"], False)

            def last_layer_only(x):
                m = jnp.zeros((x.shape[0],), dtype=bool).at[n_layers - 1].set(True)
                return jnp.broadcast_to(m.reshape((-1,) + (1,) * (x.ndim - 1)), x.shape)

            llm_mask["layers"] = jax.tree.map(last_layer_only, params["llm"]["layers"])
            llm_mask["final_norm"] = True
            llm_mask["lm_head"] = True
            if "final_norm_bias" in params["llm"]:
                llm_mask["final_norm_bias"] = True
            if "lm_head_bias" in params["llm"]:
                llm_mask["lm_head_bias"] = True
        else:
            llm_mask = fill(params["llm"], llm_spec)
        return {
            "vision": fill(params["vision"], group["vision"]),
            "projector": fill(params["projector"], group["projector"]),
            "llm": llm_mask,
        }
