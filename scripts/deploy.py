"""REST serving entry point (counterpart of reference vla-scripts/deploy.py).

  python scripts/deploy.py --checkpoint /ckpts/openvla-7b --port 8000 \
      [--quantize_int8 true] [--random_init_for_smoke true] \
      [--mesh_spec replica=1,fsdp=1,tensor=4]

`--mesh_spec` shards serving over multiple chips: `tensor=N` is megatron-style
tensor parallelism (each chip streams 1/N of the decoder per decode step —
the latency lever, since decode is HBM-bandwidth-bound), `replica=M` shards
request batches for throughput (pair with --max_batch). The reference's
inference stack is hard-limited to one GPU and batch size 1
(modeling_prismatic.py:460-463)."""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli
from bridgelang_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass
class DeployConfig:
    checkpoint: str = "openvla-7b"
    host: str = "0.0.0.0"
    port: int = 8000
    unnorm_key: Optional[str] = None
    tokenizer_path: Optional[str] = None
    quantize_int8: bool = True
    random_init_for_smoke: bool = False  # serve a random tiny model (dev)
    # Dev/CI: pin the host CPU backend (conftest.py's trick — config.update
    # beats the sitecustomize axon preload as long as no device was touched).
    # Makes the REST smoke drivable when the TPU relay tunnel is down.
    force_cpu: bool = False
    warmup: bool = True  # compile/cache-load the predict program before listening
    max_batch: int = 1  # >1 enables micro-batching of concurrent requests
    batch_window_ms: float = 6.0
    mesh_spec: str = ""  # e.g. "tensor=4": multi-chip tensor-parallel serving
    # int8 KV cache (per-token-per-head quant + bf16 scales): halves the
    # cache's HBM footprint — required for max_batch >= 16 on one 16 GB chip.
    kv_cache_int8: bool = False
    # Packed int4 decoder: fits 13B on one 16 GB chip where int8 OOMs, and
    # with the w4a8 fused kernel (ops/int4_matmul.py) halves decode's HBM
    # traffic vs int8 — a speed/precision tradeoff for 7B too. Overrides
    # quantize_int8.
    quantize_int4: bool = False
    # int4 scale-group size (input rows per scale): 128 quality default;
    # 256/512 cut the w4a8 prefill per-group fixup cost for a measured
    # quantization-error cost (docs/int4.md).
    int4_group: int = 128
    # int4 tensor parallelism: shard-blocked packing for a tensor mesh axis
    # of this size (must equal --mesh_spec tensor=N; 1 = single chip).
    int4_shards: int = 1
    # int4 TP deploys REFUSE geometries where a shard-local matmul loses the
    # fused kernel (falls back to XLA dequant, measured 10x slower — e.g.
    # 7B MLP at any tensor>=2, 13B MLP at tensor>=4; see
    # int4_tp_fallback_matmuls). Set true to serve anyway, eyes open.
    allow_int4_tp_fallback: bool = False
    # Batch-1 default: decode speculatively, drafting from the server-side
    # previous tokens per (instruction, unnorm_key) — greedy-equivalent
    # (margin-gated), ~40% faster on smooth control loops, no client changes.
    # Auto-disabled with kv_cache_int8 (see VLAServer docstring).
    speculative_default: bool = True
    # Top-1 logit margin a drafted position must clear to be accepted. The
    # 0.25 default keeps speculative output greedy-equivalent under bf16
    # tiling noise; 0.0 accepts any exact argmax match (highest acceptance,
    # drops the near-tie guard).
    speculative_margin: float = 0.25
    # One-forward parallel action decode (generate_parallel) — ONLY for models
    # fine-tuned with `finetune.py --parallel_decode` (OFT-style objective).
    # Overrides speculative_default (parallel is strictly faster than any
    # acceptance rate: one forward, no draft needed).
    parallel_decode: bool = False


def main(cfg: DeployConfig) -> None:
    import jax

    if cfg.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.serving.server import VLAServer
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache, warmup_predict

    cache_dir = enable_persistent_cache()
    overwatch.info("Persistent compile cache: %s", cache_dir)

    if cfg.random_init_for_smoke:
        import dataclasses as dc

        from bridgelang_tpu.models.vla import OpenVLA
        from bridgelang_tpu.models.vlm import VLMConfig
        from bridgelang_tpu.models.llm.llama import LLMConfig
        from bridgelang_tpu.models.vision.vit import ViTConfig

        tiny_vit = ViTConfig(image_size=64, patch_size=8, width=64, depth=4, num_heads=4, mlp_dim=128)
        tiny_llm = LLMConfig(vocab_size=32000, padded_vocab_size=32064, dim=128, n_layers=2, n_heads=4,
                             n_kv_heads=4, intermediate_size=256)
        vcfg = dc.replace(VLMConfig(), llm=tiny_llm, vision_override=tiny_vit)
        stats = {"bridge_orig": {"action": {"q01": [-0.1] * 7, "q99": [0.1] * 7,
                                            "mask": [True] * 6 + [False]}}}
        model = OpenVLA(vcfg, stats, tokenizer=get_tokenizer(cfg.tokenizer_path), dtype=jnp.float32)
        from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=64),))
        params = model.init_params(jax.random.key(0))
    else:
        from bridgelang_tpu.models.load import load_vla

        model, params = load_vla(cfg.checkpoint, quantize_int8=cfg.quantize_int8,
                                 quantize_int4=cfg.quantize_int4,
                                 int4_group=cfg.int4_group,
                                 int4_shards=cfg.int4_shards if cfg.quantize_int4 else 1)
        model.tokenizer = get_tokenizer(cfg.tokenizer_path)

    if cfg.kv_cache_int8:
        model.cache_dtype = jnp.int8
    if cfg.parallel_decode:
        model.parallel_decode = True

    if cfg.mesh_spec:
        from bridgelang_tpu.parallel.mesh import make_mesh
        from bridgelang_tpu.parallel.sharding import shard_params_for_serving

        mesh = make_mesh(cfg.mesh_spec)
        tensor = int(mesh.shape.get("tensor", 1))
        if cfg.quantize_int4 and tensor > 1:
            # int4 tensor parallelism (round 4) requires the checkpoint to
            # have been packed shard-blocked for exactly this tensor size
            # (pack_int4 n_shards; quantize-on-load does it when
            # --int4_shards matches) and head-aligned column shards.
            if cfg.int4_shards != tensor:
                raise SystemExit(
                    f"--quantize_int4 with tensor={tensor} needs --int4_shards {tensor} "
                    "(shard-blocked packing; see ops/quant.py::pack_int4). "
                    f"Got --int4_shards {cfg.int4_shards}."
                )
            if model.cfg.llm.n_heads % tensor or model.cfg.llm.n_kv_heads % tensor:
                raise SystemExit(
                    f"tensor={tensor} does not divide the head counts "
                    f"({model.cfg.llm.n_heads}/{model.cfg.llm.n_kv_heads})."
                )
            from bridgelang_tpu.ops.int4_matmul import int4_tp_fallback_matmuls

            fallback = int4_tp_fallback_matmuls(model.cfg.llm, cfg.int4_group, tensor)
            if fallback:
                msg = (
                    f"int4 + tensor={tensor}: shard-local {', '.join(fallback)} lose the "
                    "fused Pallas kernel (shard width not 256-aligned) and would run the "
                    "XLA dequant fallback, measured 10x slower — this deploy would NOT "
                    "deliver the advertised int4-TP speed. Use int8 for TP at this "
                    "geometry (7B MLP breaks at any tensor>=2; 13B MLP survives "
                    "tensor=2 only), or pass --allow_int4_tp_fallback true to serve "
                    "anyway."
                )
                if not cfg.allow_int4_tp_fallback:
                    raise SystemExit(msg)
                overwatch.warning(msg)
        params = shard_params_for_serving(mesh, params, int4_shards=cfg.int4_shards)
        model.use_mesh(mesh)
        overwatch.info("Tensor-parallel serving over mesh %s", dict(mesh.shape))

    speculative = (cfg.speculative_default and not cfg.kv_cache_int8
                   and not cfg.parallel_decode and cfg.max_batch <= 1)
    if cfg.warmup:
        dt = warmup_predict(model, params, max_batch=cfg.max_batch, unnorm_key=cfg.unnorm_key,
                            speculative=speculative, margin_threshold=cfg.speculative_margin)
        overwatch.info(
            "Warmup compiled/loaded predict for all batch buckets <= %d in %.1fs — "
            "every request gets steady-state latency", max(cfg.max_batch, 1), dt,
        )

    overwatch.info("Serving %s on %s:%d (max_batch=%d%s)", cfg.checkpoint, cfg.host, cfg.port,
                   cfg.max_batch, ", speculative default" if speculative else "")
    VLAServer(
        model, params, default_unnorm_key=cfg.unnorm_key,
        max_batch=cfg.max_batch, batch_window_ms=cfg.batch_window_ms,
        speculative_default=cfg.speculative_default and not cfg.parallel_decode,
        speculative_margin=cfg.speculative_margin,
    ).run(cfg.host, cfg.port)


if __name__ == "__main__":
    main(parse_cli(DeployConfig))
