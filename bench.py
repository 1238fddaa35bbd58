"""North-star benchmark: openvla-7b `predict_action` actions/sec on one TPU chip.

Measures the full serving path end-to-end (uint8 camera frame + tokenized
prompt -> on-device preprocess -> dual-ViT encode -> fused prefill -> 7-token
greedy KV-cache decode -> on-device de-tokenize + unnormalize -> host action
vector) on the FULL flagship architecture (fused DINOv2-L + SigLIP-so400m,
Llama-2-7B) with random weights — weight values don't affect timing.

Serving mode: int8 weight-only decoder (the reference's own supported 8-bit
mode, verify_openvla.py:49) with w8a8 prefill (per-token activation quant onto
the int8 MXU — validated against fp32 logits in tests/test_hf_parity.py).

Also prints a second JSON line with a VLA train-step benchmark (step time /
tokens/s / MFU) for the reference's primary workload (train.py pretraining),
on a depth-trimmed-but-full-dim model that fits one 16 GB chip. NOTE: since
round 2 the train step uses the faster "dots" remat policy and its MFU is
TRUE MFU (6*N*D, recompute excluded) — earlier rounds reported 8*N*D with
full recompute counted as useful work, so vs_baseline rebased ~0.67 -> ~0.55
while wall-clock tokens/s IMPROVED ~6%.

Baseline: the reference publishes no throughput numbers (BASELINE.md §
Throughput); the de-facto reference loop (verify_openvla.py) is measured at
~6 predict_action calls/sec on datacenter-class GPUs (OpenVLA project's own
reporting of bf16 HF inference). vs_baseline is computed against 6.0
actions/sec.

Prints the headline JSON line LAST:
{"metric", "value", "unit", "vs_baseline"}.
"""

import json

import sys
import time

import numpy as np

REFERENCE_ACTIONS_PER_SEC = 6.0
V5E_BF16_PEAK_FLOPS = 197e12  # per chip
TRAIN_BENCH_TIMEOUT_S = 900  # cold dots-remat compile alone is ~250s on this backend


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the 7B serving graph is a multi-minute
    # one-time compile on this backend; cache it across bench invocations.
    from bridgelang_tpu.util.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig

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
        # quantized: 7B bf16 (15.0 GB) cannot coexist with a KV cache on a
        # 16 GB v5e, and on bandwidth-bound decode int8 halves the per-token
        # HBM traffic. w8a8=True additionally quantizes activations per-token
        # so prefill matmuls run on the MXU's int8 path (~2x bf16 rate);
        # logits parity vs fp32 is tested (test_hf_parity.py::test_w8a8_*).
        # Vision towers + projector stay bf16.
        from bridgelang_tpu.ops.quant import init_llm_params_int8

        cfg = VLMConfig.from_ids(
            model_id="prism-dinosiglip-224px+7b",
            vision_backbone_id="dinosiglip-vit-so-224px",
            llm_backbone_id="llama2-7b-pure",
            arch_specifier="no-align+fused-gelu-mlp",
            image_resize_strategy="resize-naive",
            llm_overrides={"w8a8": True},
        )
        model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16, prompt_bucket=48)
        k_vis, k_proj, k_llm = jax.random.split(jax.random.key(0), 3)
        from bridgelang_tpu.models.projector import init_projector_params

        dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
        vision = model.vision_module.init(k_vis, dummy)["params"]
        vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vision)
        projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim, cfg.llm.dim, dtype=jnp.bfloat16)
        llm = init_llm_params_int8(k_llm, cfg.llm)
        return model, {"vision": vision, "projector": projector, "llm": llm}

    scale_note = "-int8"

    # --- train-step benchmark FIRST, in an ISOLATED SUBPROCESS: it needs a
    # fresh chip (params+grads+Adam cannot share 16 GB with the 8.3 GB
    # serving model) and an OOM must never wedge the serving headline. Runs
    # BEFORE the parent touches any device so the child has the chip alone. ---
    _run_train_bench_subprocess()

    print(f"[bench] backend={jax.default_backend()} device={jax.devices()[0].device_kind}", file=sys.stderr)
    serving = _serving_bench(build, norm_stats)

    print(
        json.dumps(
            {
                "metric": f"openvla7b{scale_note}_predict_action_throughput",
                "value": round(serving, 3),
                "unit": "actions/sec",
                "vs_baseline": round(serving / REFERENCE_ACTIONS_PER_SEC, 3),
            }
        )
    )


def _serving_bench(build, norm_stats) -> float:
    """Serving measurements in their own scope: every model buffer drops on
    return so the train bench gets the whole chip."""
    import jax
    import jax.numpy as jnp

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

    # Per-call dispatch/RPC overhead: a trivial jitted op + scalar fetch. On
    # this box the TPU sits behind a relay tunnel; this is pure round-trip
    # latency every synchronous call pays and no kernel can remove.
    tiny = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    np.asarray(triv(tiny))
    rpc = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(triv(tiny))
        rpc.append(time.perf_counter() - t0)
    rpc_ms = float(np.percentile(rpc, 50)) * 1e3
    print(f"[bench] per-call dispatch+fetch overhead: {rpc_ms:.1f} ms (relay round trip)", file=sys.stderr)

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
        f"[bench] sequential p50={p50*1e3:.1f}ms mean={lat.mean()*1e3:.1f}ms "
        f"p90={np.percentile(lat,90)*1e3:.1f}ms -> {actions_per_sec:.2f} actions/s "
        f"(~{(p50*1e3-rpc_ms):.0f} ms on-device)",
        file=sys.stderr,
    )

    # Pipelined throughput: keep 2 requests in flight (dispatch i+1 before
    # syncing i) — hides the relay round trip, measures the compute rate.
    frames = [rng.integers(0, 255, size=(1, 224, 224, 3), dtype=np.uint8) for _ in range(32)]
    pending = predict(params, ids_d, mask_d, jnp.asarray(frames[0]), q01, q99, smask)
    t0 = time.perf_counter()
    n_pipe = 30
    for i in range(1, n_pipe + 1):
        nxt = predict(params, ids_d, mask_d, jnp.asarray(frames[i % 32]), q01, q99, smask)
        np.asarray(pending)
        pending = nxt
    np.asarray(pending)
    pipe_rate = n_pipe / (time.perf_counter() - t0)
    print(f"[bench] pipelined (2 in flight): {pipe_rate:.2f} actions/s", file=sys.stderr)

    # Speculative decode (draft = previous tick's tokens): ONE verification
    # pass replaces up to six decode passes when the draft is accepted.
    # Random weights produce DEGENERATE logit margins, so the exactness gate
    # (margin_threshold) rejects everything here; margin_threshold=0 shows
    # the fully-accepted upper bound a real checkpoint approaches on smooth
    # trajectories (real action margins are far above the gate).
    try:
        frame_d = jnp.asarray(frame[None])
        spec0 = model._jitted_predict_frames_speculative(margin_threshold=0.0)
        _, toks = spec0(params, ids_d, mask_d, frame_d, q01, q99, smask,
                        jnp.zeros((1, 7), jnp.int32))
        toks = jnp.asarray(np.asarray(toks))  # settle + host sync

        def timed_spec(fn, draft, n=20):
            np.asarray(fn(params, ids_d, mask_d, frame_d, q01, q99, smask, draft)[0])
            lat = []
            for _ in range(n):
                t0 = time.perf_counter()
                acts, _ = fn(params, ids_d, mask_d, frame_d, q01, q99, smask, draft)
                np.asarray(acts)
                lat.append(time.perf_counter() - t0)
            return float(np.percentile(lat, 50))

        best = timed_spec(spec0, toks)                              # all 7 accepted
        worst = timed_spec(spec0, jnp.full((1, 7), 5, jnp.int32))   # nothing accepted
        print(f"[bench] speculative decode (draft=prev action): fully-accepted p50={best*1e3:.1f}ms "
              f"({1/best:.2f} a/s), rejected-draft p50={worst*1e3:.1f}ms ({1/worst:.2f} a/s)",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] speculative mode failed: {type(e).__name__}: {e}", file=sys.stderr)

    # Batched serving throughput with the int8 KV cache: B=16's bf16 cache
    # alone (10.4 GB) cannot share the chip with the weights; int8 KV halves
    # it. One weight stream serves the whole batch per decode step.
    try:
        model.cache_dtype = jnp.int8
        fn16 = model._jitted_predict_frames(7)
        B = 16
        ids16 = np.repeat(ids, B, axis=0)
        mask16 = np.repeat(mask, B, axis=0)
        ids16_d, mask16_d = jnp.asarray(ids16), jnp.asarray(mask16)
        frames16 = jnp.asarray(rng.integers(0, 255, size=(B, 224, 224, 3), dtype=np.uint8))
        np.asarray(fn16(params, ids16_d, mask16_d, frames16, q01, q99, smask))
        lat_b = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(fn16(params, ids16_d, mask16_d, frames16, q01, q99, smask))
            lat_b.append(time.perf_counter() - t0)
        p50_b = float(np.percentile(lat_b, 50))
        batched_rate = B / p50_b
        print(f"[bench] batched B={B} (int8 KV cache): p50={p50_b*1e3:.1f}ms -> "
              f"{batched_rate:.1f} actions/s aggregate", file=sys.stderr)
        print(json.dumps({
            "metric": "openvla7b-int8kv_batched16_throughput",
            "value": round(batched_rate, 2),
            "unit": "actions/sec aggregate (B=16, one chip)",
            "vs_baseline": round(batched_rate / REFERENCE_ACTIONS_PER_SEC, 3),
        }))
    except Exception as e:
        print(f"[bench] batched int8-KV mode failed: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        model.cache_dtype = jnp.bfloat16

    # Secondary: OFT-style parallel decode (one forward for all 7 tokens) —
    # the serving mode for models fine-tuned with the parallel objective.
    try:
        predict_par = model._jitted_predict_frames(7, parallel_decode=True)

        def one_call_par(frame_np):
            return np.asarray(predict_par(params, ids_d, mask_d, jnp.asarray(frame_np[None]), q01, q99, smask))

        one_call_par(frame)
        for _ in range(3):
            one_call_par(frame)
        lat_p = []
        for i in range(20):
            f = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
            t0 = time.time()
            one_call_par(f)
            lat_p.append(time.time() - t0)
        p50_p = float(np.percentile(lat_p, 50))
        print(f"[bench] parallel-decode p50={p50_p*1e3:.1f}ms -> {1.0/p50_p:.2f} actions/s", file=sys.stderr)
    except Exception as e:
        print(f"[bench] parallel-decode mode failed: {type(e).__name__}: {e}", file=sys.stderr)

    model._predict_fns.clear()
    import gc

    gc.collect()
    return actions_per_sec


def _run_train_bench_subprocess() -> None:
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "train"],
            capture_output=True, text=True, timeout=TRAIN_BENCH_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        print("[bench] train-step bench timed out; skipping", file=sys.stderr)
        return
    sys.stderr.write(proc.stderr[-2000:])
    line = next((ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')), None)
    if proc.returncode == 0 and line:
        print(line)
    else:
        print(f"[bench] train-step bench failed (rc={proc.returncode})", file=sys.stderr)


def _train_bench(norm_stats):
    """One jitted VLA train step of the flagship architecture, depth-trimmed
    (full dims, 2 of 32 decoder layers) so params+grads+Adam fit a 16 GB chip;
    vla-train stage (vision frozen) like the reference's primary pretraining
    config (prismatic/conf/vla.py:126-136). Reports step time, tokens/s, and
    achieved MFU vs the v5e bf16 peak."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.training.trainer import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_vla_train_step,
    )

    LLM_LAYERS, BATCH = 2, 16
    cfg = VLMConfig.from_ids(
        model_id="prism-dinosiglip-224px+7b",
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id="llama2-7b-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        image_resize_strategy="resize-naive",
        llm_overrides={"n_layers": LLM_LAYERS},
    )
    model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16)
    # bf16 params keep the footprint inside 16 GB; the production path uses
    # fp32 masters on a sharded mesh (scripts/train.py).
    params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)
    trainable = model.trainable_mask(params, "vla-train")
    optimizer = make_optimizer(OptimConfig(learning_rate=2e-5, total_steps=1000), params, trainable_mask=trainable)
    # bf16 grads = the reference's bf16 gradient-reduce mode (fsdp.py:140-148);
    # remat_policy="dots" saves matmul outputs so the backward recomputes only
    # elementwise work (measured 5.9% faster than full recompute on v5e).
    step_fn = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=trainable,
                                          grad_dtype=jnp.bfloat16, remat_policy="dots"))
    state = init_train_state(params, optimizer, trainable_mask=trainable)

    rng = np.random.default_rng(0)
    t = 48
    ids = np.full((BATCH, t), cfg.llm.pad_token_id, np.int32)
    mask = np.zeros((BATCH, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:26] = rng.integers(3, 31000, size=(BATCH, 25))
    ids[:, 26:34] = rng.integers(31744, 32000, size=(BATCH, 8))
    mask[:, :34] = 1
    labels = np.where(mask == 1, ids, -100)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.normal(size=(BATCH, 6, 224, 224)), dtype=jnp.bfloat16),
    }

    t0 = time.time()
    state, m = step_fn(state, batch)
    loss0 = float(m["loss"])
    print(f"[bench] train-step compile+first: {time.time()-t0:.1f}s loss={loss0:.3f}", file=sys.stderr)

    steps, losses = [], [loss0]
    for _ in range(8):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))  # sync
        steps.append(time.perf_counter() - t0)
    p50 = float(np.percentile(steps, 50))
    # Convergence smoke on real hardware: repeated steps on a fixed batch must
    # overfit it — the loss trajectory proves the optimizer actually learns,
    # not just that the step executes. Averaged over the tail so one noisy
    # bf16 step can't kill a benchmark whose perf numbers are already in hand.
    print(
        f"[bench] train loss trajectory (fixed batch): {losses[0]:.3f} -> "
        f"{losses[len(losses)//2]:.3f} -> {losses[-1]:.3f} over {len(losses)-1} steps",
        file=sys.stderr,
    )
    if float(np.mean(losses[-3:])) >= losses[0]:
        print("[bench] WARNING: mean of last 3 losses did not drop below the first "
              "loss on a fixed batch — optimizer may not be learning", file=sys.stderr)

    # FLOPs per step: 6*N*D for trainable LLM+projector matmuls (fwd+bwd),
    # +2*Nv*D_patches for the frozen vision fwd. TRUE MFU: the "dots" remat
    # policy does not re-run matmuls in the backward, and recompute would not
    # count as useful work anyway.
    f_len = t + model.num_patches  # fused sequence length
    tokens = BATCH * f_len
    n_llm = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["llm"]))
    n_proj = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["projector"]))
    n_vis = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["vision"]))
    vis_tokens = BATCH * (model.num_patches + 5)  # + prefix tokens
    flops = 6.0 * (n_llm + n_proj) * tokens + 2.0 * n_vis * vis_tokens
    mfu = flops / p50 / V5E_BF16_PEAK_FLOPS
    tok_s = tokens / p50
    print(
        f"[bench] train step p50={p50*1e3:.0f}ms -> {tok_s:,.0f} tokens/s, "
        f"true MFU={mfu*100:.1f}% ({LLM_LAYERS}-layer full-dim, batch {BATCH}, dots-remat)",
        file=sys.stderr,
    )
    return {
        "metric": "vla_train_step_tokens_per_sec",
        "value": round(tok_s, 1),
        "unit": f"tokens/sec (mfu={mfu:.3f}, {LLM_LAYERS}-layer-7b-dims, b{BATCH})",
        "vs_baseline": round(mfu, 3),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        from bridgelang_tpu.util.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        line = _train_bench({
            "bridge_orig": {"action": {
                "q01": [-0.03, -0.05, -0.06, -0.13, -0.12, -0.43, 0.0],
                "q99": [0.03, 0.04, 0.06, 0.13, 0.12, 0.43, 1.0],
                "mask": [True, True, True, True, True, True, False],
            }}
        })
        if line:
            print(json.dumps(line))
    else:
        main()
