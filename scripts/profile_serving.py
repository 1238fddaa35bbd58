"""Stage-by-stage serving profile on the real chip: where does a
predict_action millisecond go?

Times each stage as its own jitted program (vision encode, prefill, one
decode step, LM head) plus the dispatch round trip, and prints the budget.
Used to produce the README's p50 breakdown; re-run after kernel changes.

  python scripts/profile_serving.py [--llm_layers 32] [--w8a8 true]

Note: on this backend a bare `jax.block_until_ready` can return before the
remote work finishes — every timing here fetches a small output slice to
host, which cannot be faked.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class ProfileConfig:
    llm_layers: int = 32
    w8a8: bool = True
    prompt_bucket: int = 48
    max_new_tokens: int = 7
    iters: int = 12


def main(cfg: ProfileConfig) -> None:
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.llm.llama import embed_tokens, init_kv_cache, llm_forward, lm_logits
    from bridgelang_tpu.models.projector import init_projector_params
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import preprocess_batch
    from bridgelang_tpu.ops.quant import init_llm_params_int8
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"[profile] backend={jax.default_backend()} device={jax.devices()[0].device_kind}")

    vcfg = VLMConfig.from_ids(
        model_id="prism-dinosiglip-224px+7b",
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id="llama2-7b-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        image_resize_strategy="resize-naive",
        llm_overrides={"n_layers": cfg.llm_layers, "w8a8": cfg.w8a8},
    )
    stats = {"bridge_orig": {"action": {"q01": [0.0] * 7, "q99": [1.0] * 7, "mask": [True] * 7}}}
    model = OpenVLA(vcfg, stats, dtype=jnp.bfloat16, prompt_bucket=cfg.prompt_bucket)

    k_vis, k_proj, k_llm = jax.random.split(jax.random.key(0), 3)
    dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
    vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.vision_module.init(k_vis, dummy)["params"])
    projector = init_projector_params(k_proj, vcfg.arch_specifier, model.vision_dim, vcfg.llm.dim, dtype=jnp.bfloat16)
    llm = init_llm_params_int8(k_llm, vcfg.llm)
    params = {"vision": vision, "projector": projector, "llm": llm}

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, size=(1, 224, 224, 3), dtype=np.uint8))

    def probe(out) -> float:
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return float(jax.device_get(leaf[tuple([0] * leaf.ndim)]))

    def timeit(name, fn, *args):
        out = fn(*args)
        probe(out)
        ts = []
        for _ in range(cfg.iters):
            t0 = time.perf_counter()
            probe(fn(*args))
            ts.append(time.perf_counter() - t0)
        p50 = float(np.percentile(ts, 50)) * 1e3
        print(f"[profile] {name:34s} p50={p50:7.2f} ms (incl. round trip)")
        return out, p50

    # dispatch round trip (pure overhead every synchronous call pays)
    tiny = jnp.zeros((8,), jnp.float32)
    _, rpc = timeit("dispatch+fetch round trip", jax.jit(lambda x: x + 1.0), tiny)

    @jax.jit
    def stage_vision(params, frame):
        px = preprocess_batch(frame, model.image_transform, dtype=jnp.bfloat16)
        return model.encode_vision(params, px)

    patches, t_vis = timeit("preprocess + dual ViT + projector", stage_vision, params, frame)

    ids = np.full((1, cfg.prompt_bucket), vcfg.llm.pad_token_id, np.int32)
    mask = np.zeros((1, cfg.prompt_bucket), np.int32)
    ids[0, 0] = 1
    ids[0, 1:26] = rng.integers(3, 31000, size=25)
    ids[0, 26] = 29871
    mask[0, :27] = 1
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

    @jax.jit
    def stage_prefill(params, patches, ids_d, mask_d):
        # Mirror the PRODUCTION prefill path (vlm.generate_greedy): chunk-
        # extent mask, contiguous cache write, and the short-sequence einsum
        # attention switch (_prefill_impl).
        tok = embed_tokens(params["llm"], ids_d, dtype=jnp.bfloat16)
        fused, fmask, _ = model.fuse_after_bos(tok, patches, mask_d)
        f_len = fused.shape[1]
        s_len = f_len + cfg.max_new_tokens
        cache = init_kv_cache(vcfg.llm, 1, s_len, dtype=jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(f_len), (1, f_len))
        m = model._causal_mask(fmask)
        return llm_forward(params["llm"], vcfg.llm, fused, pos, m,
                           cache=cache, cache_positions=pos,
                           attention_impl=model._prefill_impl(1, f_len), remat=False,
                           cache_write="contiguous")

    (hidden, cache), t_pre = timeit("prefill (multimodal sequence)", stage_prefill, params, patches, ids_d, mask_d)

    s_len = cache["k"].shape[2]
    f_len = s_len - cfg.max_new_tokens

    @jax.jit
    def stage_decode(params, cache, token, pos_scalar):
        pos = pos_scalar[None, None]
        te = embed_tokens(params["llm"], token, dtype=jnp.bfloat16)
        k_idx = jnp.arange(s_len)[None, None, None, :]
        m = k_idx <= pos[:, :, None, None]
        h, new_cache = llm_forward(params["llm"], vcfg.llm, te, pos, m,
                                   cache=cache, cache_positions=pos,
                                   attention_impl="pallas", remat=False)
        nxt = jnp.argmax(lm_logits(params["llm"], h, vcfg.llm), axis=-1).astype(jnp.int32)
        return nxt, new_cache

    tok = jnp.asarray([[29871]], jnp.int32)
    _, t_dec = timeit("one greedy decode step", stage_decode, params, cache, tok, jnp.asarray(f_len))

    n_dec = cfg.max_new_tokens - 1  # prefill emits the first token
    print(
        f"\n[profile] on-device budget estimate (round trip {rpc:.1f} ms subtracted):\n"
        f"  vision   {max(t_vis - rpc, 0):6.1f} ms\n"
        f"  prefill  {max(t_pre - rpc, 0):6.1f} ms\n"
        f"  decode   {max(t_dec - rpc, 0):6.1f} ms x {n_dec} = {max(t_dec - rpc, 0) * n_dec:6.1f} ms\n"
        f"  total    {max(t_vis - rpc, 0) + max(t_pre - rpc, 0) + max(t_dec - rpc, 0) * n_dec:6.1f} ms on device"
        f" + {rpc:.1f} ms round trip per synchronous call"
    )


if __name__ == "__main__":
    main(parse_cli(ProfileConfig))
