"""North-star benchmark: openvla-7b `predict_action` actions/sec on one TPU chip.

Measures the full serving path end-to-end (uint8 camera frame + tokenized
prompt -> on-device preprocess -> dual-ViT encode -> fused prefill -> 7-token
greedy KV-cache decode -> on-device de-tokenize + unnormalize -> host action
vector) on the FULL flagship architecture (fused DINOv2-L + SigLIP-so400m,
Llama-2-7B) with random weights — weight values don't affect timing.

Baseline: the reference publishes no throughput numbers (BASELINE.md §
Throughput); the de-facto reference loop (verify_openvla.py) is measured at
~6 predict_action calls/sec on datacenter-class GPUs (OpenVLA project's own
reporting of bf16 HF inference). vs_baseline is computed against 6.0
actions/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_ACTIONS_PER_SEC = 6.0


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the 7B serving graph is a multi-minute
    # one-time compile on this backend; cache it across bench invocations.
    import os

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/bridgelang_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import dataclasses
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import preprocess_batch

    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"[bench] backend={backend} device={dev.device_kind}", file=sys.stderr)

    norm_stats = {
        "bridge_orig": {
            "action": {
                "q01": [-0.03, -0.05, -0.06, -0.13, -0.12, -0.43, 0.0],
                "q99": [0.03, 0.04, 0.06, 0.13, 0.12, 0.43, 1.0],
                "mask": [True, True, True, True, True, True, False],
            }
        }
    }

    def build():
        # Full flagship dims. The Llama-2-7B weights are int8 weight-only
        # quantized (the reference's own supported 8-bit serving mode,
        # verify_openvla.py:49): 7B bf16 (15.0 GB) cannot coexist with a KV
        # cache on a 16 GB v5e, and on bandwidth-bound decode int8 halves the
        # per-token HBM traffic. Vision towers + projector stay bf16.
        from bridgelang_tpu.ops.quant import init_llm_params_int8

        cfg = VLMConfig.from_ids(
            model_id="prism-dinosiglip-224px+7b",
            vision_backbone_id="dinosiglip-vit-so-224px",
            llm_backbone_id="llama2-7b-pure",
            arch_specifier="no-align+fused-gelu-mlp",
            image_resize_strategy="resize-naive",
        )
        model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16, prompt_bucket=48)
        k_vis, k_proj, k_llm = jax.random.split(jax.random.key(0), 3)
        import flax  # noqa: F401
        from bridgelang_tpu.models.projector import init_projector_params

        dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
        vision = model.vision_module.init(k_vis, dummy)["params"]
        vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vision)
        projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim, cfg.llm.dim, dtype=jnp.bfloat16)
        llm = init_llm_params_int8(k_llm, cfg.llm)
        return model, {"vision": vision, "projector": projector, "llm": llm}

    scale_note = "-int8"
    model, params = build()
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    print(f"[bench] full model: {n_params/1e9:.2f}B params, {n_bytes/1e9:.1f} GB on-chip", file=sys.stderr)

    stats = norm_stats["bridge_orig"]["action"]
    q01 = jnp.asarray(stats["q01"], dtype=jnp.float32)
    q99 = jnp.asarray(stats["q99"], dtype=jnp.float32)
    smask = jnp.asarray(stats["mask"])

    # Prompt: BOS + ~25 text tokens + trailing 29871 (the canonical VLA prompt
    # shape), right-padded to the static 48 bucket.
    rng = np.random.default_rng(0)
    ids = np.full((1, 48), model.cfg.llm.pad_token_id, np.int32)
    mask = np.zeros((1, 48), np.int32)
    ids[0, 0] = 1
    ids[0, 1:26] = rng.integers(3, 31000, size=25)
    ids[0, 26] = 29871
    mask[0, :27] = 1
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

    frame = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)

    del preprocess_batch  # fused into the predict program below
    predict = model._jitted_predict_frames(7)

    def one_call(frame_np):
        # single device dispatch: preprocess+encode+decode+unnormalize fused
        out = predict(params, ids_d, mask_d, jnp.asarray(frame_np[None]), q01, q99, smask)
        return np.asarray(out)  # host sync, like a robot control loop

    # Warmup / compile
    t0 = time.time()
    action = one_call(frame)
    print(f"[bench] compile+first call: {time.time()-t0:.1f}s action={action[0][:3]}", file=sys.stderr)
    for _ in range(3):
        one_call(frame)

    # Timed: 30 sequential calls, fresh frame each time (no caching effects)
    lat = []
    for i in range(30):
        f = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        t0 = time.time()
        one_call(f)
        lat.append(time.time() - t0)
    lat = np.array(lat)
    p50 = float(np.percentile(lat, 50))
    actions_per_sec = 1.0 / p50
    print(
        f"[bench] p50={p50*1e3:.1f}ms mean={lat.mean()*1e3:.1f}ms "
        f"p90={np.percentile(lat,90)*1e3:.1f}ms -> {actions_per_sec:.2f} actions/s",
        file=sys.stderr,
    )

    # Secondary: OFT-style parallel decode (one forward for all 7 tokens) —
    # the serving mode for models fine-tuned with the parallel objective.
    try:
        predict_par = model._jitted_predict_frames(7, parallel_decode=True)

        def one_call_par(frame_np):
            return np.asarray(predict_par(params, ids_d, mask_d, jnp.asarray(frame_np[None]), q01, q99, smask))

        t0 = time.time()
        one_call_par(frame)
        print(f"[bench] parallel-decode compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        for _ in range(3):
            one_call_par(frame)
        lat_p = []
        for i in range(30):
            f = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
            t0 = time.time()
            one_call_par(f)
            lat_p.append(time.time() - t0)
        p50_p = float(np.percentile(lat_p, 50))
        print(f"[bench] parallel-decode p50={p50_p*1e3:.1f}ms -> {1.0/p50_p:.2f} actions/s", file=sys.stderr)
    except Exception as e:
        print(f"[bench] parallel-decode mode failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"openvla7b{scale_note}_predict_action_throughput",
                "value": round(actions_per_sec, 3),
                "unit": "actions/sec",
                "vs_baseline": round(actions_per_sec / REFERENCE_ACTIONS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
