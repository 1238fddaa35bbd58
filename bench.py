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

Artifact contract (round-4 rework; the round-3 capture timed out at rc=124
and the driver recorded a 13B side metric as the round's headline):
  * The NORTH-STAR section (7B int8 serving) runs FIRST and its metric line
    is printed the moment it is measured — a truncated run still records it.
  * The driver parses the LAST {"metric"...} line as the headline, so after
    every secondary metric line the north-star line is RE-printed; duplicate
    headline lines are intentional and keep the north star last under any
    truncation point.
  * Every section runs in its own subprocess (an OOM or compile wedge can
    never kill the others) under a global wall-clock budget
    (BENCH_BUDGET_S, default 1500 s); sections that don't fit print an
    explicit {"skipped": ...} marker. `python bench.py all` ignores the
    budget and runs everything (the canonical full run for README numbers).
"""

import json
import os

import sys
import time

import numpy as np

REFERENCE_ACTIONS_PER_SEC = 6.0
V5E_BF16_PEAK_FLOPS = 197e12  # per chip
TRAIN_BENCH_TIMEOUT_S = 900  # cold dots-remat compile alone is ~250s on this backend
LORA_BENCH_TIMEOUT_S = 1800  # 32-layer train graph through the remote compile service
SERVE_BENCH_TIMEOUT_S = 1200  # warm-cache 7B serving compile is ~22s; cold is minutes
SERVE_BENCH_COLD_TIMEOUT_S = 3000  # retry cap when attempt 1 missed the headline
DATA_BENCH_TIMEOUT_S = 300  # host-only tf.data pipeline; no TPU, no compiles
CLOSEDLOOP_TIMEOUT_S = 1500  # boots the REST server 4x; warm serving compiles
LOADTEST_TIMEOUT_S = 1500  # 60 s traffic window + bucket warmup (measured 2026-08-20:
# on a wiped /tmp cache the bucket+speculative warmup alone outran 900 s —
# each bucket is its own remote-service compile; default runs still clamp
# this to the remaining BENCH_BUDGET_S)
MIN_SECTION_S = 180  # don't start a section with less budget than this
HEADLINE_METRIC = "openvla7b-int8_predict_action_throughput"


def _wait_for_tpu(budget_s: float = 1500.0) -> bool:
    """Block until the relay-tunneled TPU backend answers, up to budget_s.

    The relay drops for stretches of minutes-to-hours (observed); a bench
    launched into an outage would otherwise produce an empty artifact. Probes
    in a SUBPROCESS: a failed in-process backend init can wedge this process's
    jax permanently (no in-process retry — same reason the train benches run
    in subprocesses)."""
    import subprocess

    t0 = time.time()
    attempt = 0
    while time.time() - t0 < budget_s:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=75, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] TPU relay up after {time.time()-t0:.0f}s", file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[bench] TPU relay unreachable (attempt {attempt}, "
              f"{time.time()-t0:.0f}s elapsed) — retrying", file=sys.stderr)
        time.sleep(30)
    print(f"[bench] TPU relay still down after {budget_s:.0f}s — giving up", file=sys.stderr)
    return False


# (mode, per-section subprocess timeout). Order IS the priority order: the
# north-star 7B serving section runs first so a truncated capture still has
# it. The DEFAULT run (what the driver executes under BENCH_BUDGET_S=1500)
# carries only sections that fit a warm-cache budget: headline serving, the
# host data pipeline (no TPU), the REST closed-loop + load-test evidence,
# and the flagship train step. The slow canonical-capture material
# (full-depth LoRA/QLoRA, 13B/7B int4, VLM pretraining stages) runs under
# `bench.py all` only — BENCH_r04 showed 13b4 eating the driver budget and
# skipping closedloop/loadtest entirely (VERDICT r04 item 2).
DEFAULT_SECTIONS = (
    ("serve7b", SERVE_BENCH_TIMEOUT_S),    # headline + speculative + batched + chunked
    ("data", DATA_BENCH_TIMEOUT_S),        # RLDS preprocess frames/s (host CPUs, no TPU)
    ("closedloop", CLOSEDLOOP_TIMEOUT_S),  # REST closed-loop control Hz (seq/spec/chunked)
    ("loadtest", LOADTEST_TIMEOUT_S),      # concurrent mixed traffic: p99 + recompile GATE
    ("train", TRAIN_BENCH_TIMEOUT_S),      # flagship train step (2-layer proxy)
)
EXTRA_SECTIONS = (
    ("lora", LORA_BENCH_TIMEOUT_S),       # full-depth 7B LoRA (finetune.py:9-11 analogue)
    ("vlmtrain", LORA_BENCH_TIMEOUT_S),   # VLM pretrain: align + finetune stage steps
    ("lora13b", LORA_BENCH_TIMEOUT_S),    # full-depth 13B QLoRA on packed int4
    ("13b4", LORA_BENCH_TIMEOUT_S),       # 13B int4 serving capacity + batched-8
    ("7b4", LORA_BENCH_TIMEOUT_S),        # 7B int4 speed probe
)
SECTIONS = DEFAULT_SECTIONS + EXTRA_SECTIONS  # `bench.py all` runs everything


def main(run_all: bool = False):
    """Orchestrate all sections as subprocesses. This parent process NEVER
    touches the TPU (each child needs the 16 GB chip alone, and a child OOM
    or compile wedge must not take the artifact down with it)."""
    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    headline = None
    last_emitted = None  # last artifact line printed (dedups the final re-print)

    if not _wait_for_tpu():
        # Running the benches anyway would burn each child's full timeout
        # (~2 more hours) to produce the same empty artifact. Fail loudly.
        print(json.dumps({"metric": HEADLINE_METRIC, "value": 0, "unit":
                          "FAILED: TPU relay outage outlasted the wait budget",
                          "vs_baseline": 0}), flush=True)
        raise SystemExit(1)

    for mode, cap in (SECTIONS if run_all else DEFAULT_SECTIONS):
        remaining = budget_s - (time.time() - t_start)
        if not run_all and remaining < MIN_SECTION_S:
            last_emitted = json.dumps({"skipped": mode, "reason": "wall-clock budget exhausted",
                                       "elapsed_s": round(time.time() - t_start, 1),
                                       "budget_s": budget_s})
            print(last_emitted, flush=True)
            continue
        timeout = cap if run_all else min(cap, max(MIN_SECTION_S, remaining))
        lines = _run_section_subprocess(mode, timeout)
        if mode == "serve7b" and not any(f'"{HEADLINE_METRIC}"' in ln for ln in lines):
            # The north star must not die to a cold compile: the 7B serving
            # graph takes 6-40 min through the remote compile service on a
            # cold cache day (vs ~22 s warm). The first attempt's compile is
            # cached server-side even when the child is killed, so ONE retry
            # with the cold cap almost always completes; without it BENCH_r03
            # recorded the wrong headline entirely (VERDICT r03 item 1).
            print("[bench] headline missing after serve7b attempt 1 — retrying "
                  f"with the cold-compile cap ({SERVE_BENCH_COLD_TIMEOUT_S}s)", file=sys.stderr)
            lines = _run_section_subprocess(mode, SERVE_BENCH_COLD_TIMEOUT_S) or lines
        if not lines:
            # A section that timed out or crashed must leave a trace in the
            # ARTIFACT, not only on stderr — otherwise the round's record
            # silently lacks the number (the budget-exhausted path above
            # already prints markers; this covers in-section death).
            last_emitted = json.dumps({"skipped": mode,
                                       "reason": "section produced no metric line (timeout or failure)",
                                       "elapsed_s": round(time.time() - t_start, 1)})
            print(last_emitted, flush=True)
            continue
        for ln in lines:
            print(ln, flush=True)
            last_emitted = ln
            if f'"{HEADLINE_METRIC}"' in ln:
                headline = ln
        # Keep the north star the LAST metric line the driver sees, whatever
        # point a truncation lands on (the driver parses the last line).
        if headline is not None and lines and lines[-1] != headline:
            print(headline, flush=True)
            last_emitted = headline

    if headline is None:
        print(json.dumps({"metric": HEADLINE_METRIC, "value": 0, "unit":
                          "FAILED: serving section produced no measurement",
                          "vs_baseline": 0}), flush=True)
        raise SystemExit(1)
    # The artifact's very LAST line must be the north star: budget-skip
    # markers print after the final section's headline re-print, and a
    # strictly-last-line parse must still land on the headline. Skip the
    # re-print when the headline already IS the last emitted line (no
    # back-to-back duplicates; ADVICE r04).
    if last_emitted != headline:
        print(headline, flush=True)


def _build_flagship_int8(norm_stats):
    """Full flagship dims. The Llama-2-7B weights are int8 weight-only
    quantized: 7B bf16 (15.0 GB) cannot coexist with a KV cache on a
    16 GB v5e, and on bandwidth-bound decode int8 halves the per-token
    HBM traffic. w8a8=True additionally quantizes activations per-token
    so prefill matmuls run on the MXU's int8 path (~2x bf16 rate);
    logits parity vs fp32 is tested (test_hf_parity.py::test_w8a8_*).
    Vision towers + projector stay bf16."""
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.projector import init_projector_params
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
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
    dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
    vision = model.vision_module.init(k_vis, dummy)["params"]
    vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vision)
    projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim, cfg.llm.dim, dtype=jnp.bfloat16)
    llm = init_llm_params_int8(k_llm, cfg.llm)
    return model, {"vision": vision, "projector": projector, "llm": llm}


def _serve7b_bench(norm_stats):
    """Build the flagship 7B int8 serving model and run the serving section
    (headline printed first, inside _serving_bench)."""
    import jax

    print(f"[bench] backend={jax.default_backend()} device={jax.devices()[0].device_kind}", file=sys.stderr)
    _serving_bench(lambda: _build_flagship_int8(norm_stats), norm_stats)


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
    # NORTH STAR, emitted the instant it exists: everything after this line
    # (speculative curve, batched, chunked) is bonus that must never cost the
    # headline if the process is killed mid-section.
    print(json.dumps({
        "metric": HEADLINE_METRIC,
        "value": round(actions_per_sec, 3),
        # The relay RTT varies BY DAY (measured 24-37 ms across captures) and
        # every sequential call pays it; record this capture's RTT in the
        # artifact so cross-round comparisons can subtract it.
        "unit": (f"actions/sec (p50 {p50*1e3:.0f} ms incl. {rpc_ms:.0f} ms relay RTT "
                 f"this capture; a locally-attached chip pays <1 ms)"),
        "vs_baseline": round(actions_per_sec / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)

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

    # Speculative decode, MEASURED (round-3 rework — the old print was a
    # margin_threshold=0 upper bound). Two measured halves compose into the
    # effective rate:
    #   (a) on-chip latency(k) for k = 1..7 accepted tokens, driven by drafts
    #       crafted to match the greedy output for exactly k tokens (achieved
    #       k is verified on-device via return_accept_count);
    #   (b) empirical accept-count distributions P(k) from synthetic smooth
    #       control streams (minimum-jerk reach segments + OU sensor noise at
    #       10 Hz) tokenized with the PRODUCTION 256-bin binning — the accept
    #       count of the margin gate under a policy that tracks the stream.
    # Effective a/s = 1 / E_P[latency(k)].  Random weights cannot supply P(k)
    # (their margins are degenerate — the 0.25 gate rejects everything, which
    # is ALSO measured and printed below); the conditional is stated in the
    # JSON unit. verify.py --golden replaces P(k) with the real-checkpoint
    # distribution the first time weights are staged.
    try:
        frame_d = jnp.asarray(frame[None])
        spec_cnt = model._jitted_predict_frames_speculative(margin_threshold=0.0,
                                                            return_accept_count=True)
        _, toks, _ = spec_cnt(params, ids_d, mask_d, frame_d, q01, q99, smask,
                              jnp.zeros((1, 7), jnp.int32))
        greedy_t = np.asarray(toks)[0].astype(np.int32)

        lat_k = _measure_spec_latency_curve(spec_cnt, params, ids_d, mask_d, frame_d,
                                            q01, q99, smask, greedy_t)
        results = _compose_spec_acceptance(lat_k)
        best_strat = max(("prev", "extrap", "hybrid"),
                         key=lambda s: results[("nominal", s)][1])
        mean_k, eff = results[("nominal", best_strat)]
        print(json.dumps({
            "metric": "openvla7b-int8_speculative_effective_throughput",
            "value": round(eff, 2),
            "unit": (f"actions/sec (measured latency(k) x synthetic smooth-stream acceptance; "
                     f"nominal regime, draft={best_strat}, mean {mean_k:.2f}/7 accepted; "
                     f"conditional on the policy tracking the stream)"),
            "vs_baseline": round(eff / REFERENCE_ACTIONS_PER_SEC, 3),
        }), flush=True)

        # Honest telemetry at the production gate on THIS model's weights:
        # random weights -> degenerate margins -> the 0.25 gate rejects the
        # draft tail, so the accept count collapses to ~1. Printing it keeps
        # the conditional above from reading as a measured-on-weights claim.
        spec_prod = model._jitted_predict_frames_speculative(margin_threshold=0.25,
                                                             return_accept_count=True)
        prev = greedy_t.copy()
        accs = []
        for i in range(8):
            f = (frame.astype(np.int16) + rng.integers(-4, 5, size=frame.shape)).clip(0, 255).astype(np.uint8)
            _, t_i, a_i = spec_prod(params, ids_d, mask_d, jnp.asarray(f[None]), q01, q99, smask,
                                    jnp.asarray(prev[None]))
            prev = np.asarray(t_i)[0].astype(np.int32)
            accs.append(int(np.asarray(a_i)[0]))
        print(f"[bench] production gate (0.25) on random weights, perturbed-frame stream: "
              f"mean accepted {np.mean(accs):.2f}/7 (degenerate margins, as expected)", file=sys.stderr)
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
        }), flush=True)
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

        # Action chunking on top of parallel decode: ONE forward emits the
        # current + H-1 future actions (finetune.py --action_chunk H +
        # predict_action_chunk); a control loop that executes the chunk gets
        # H actions per call. Timed on the same 7B weights (weight values
        # don't affect timing; a chunk-finetuned model is required for the
        # OUTPUTS to be meaningful).
        H = 8
        fn_chunk = model._jitted_predict_frames(7 * H, parallel_decode=True)
        q01h, q99h = jnp.tile(q01, H), jnp.tile(q99, H)
        smaskh = jnp.tile(smask, H)

        def one_call_chunk(frame_np):
            return np.asarray(fn_chunk(params, ids_d, mask_d, jnp.asarray(frame_np[None]),
                                       q01h, q99h, smaskh))

        one_call_chunk(frame)
        lat_c = []
        for i in range(15):
            f = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
            t0 = time.time()
            out_c = one_call_chunk(f)
            lat_c.append(time.time() - t0)
        assert out_c.shape == (1, 7 * H)
        p50_c = float(np.percentile(lat_c, 50))
        chunk_rate = H / p50_c
        print(f"[bench] chunked parallel decode (H={H}): p50={p50_c*1e3:.1f}ms/call -> "
              f"{chunk_rate:.1f} actions/s effective", file=sys.stderr)
        print(json.dumps({
            "metric": "openvla7b-int8_chunked_parallel_effective_throughput",
            "value": round(chunk_rate, 1),
            "unit": f"actions/sec effective (H={H} actions per forward; needs --action_chunk fine-tune)",
            "vs_baseline": round(chunk_rate / REFERENCE_ACTIONS_PER_SEC, 3),
        }), flush=True)
    except Exception as e:
        print(f"[bench] parallel-decode mode failed: {type(e).__name__}: {e}", file=sys.stderr)

    model._predict_fns.clear()
    import gc

    gc.collect()
    return actions_per_sec


def _measure_spec_latency_curve(spec_cnt, params, ids_d, mask_d, frame_d,
                                q01, q99, smask, greedy_t) -> dict:
    """(a) of the speculative composition: on-chip p50 latency for k = 1..7
    accepted tokens, driven by drafts crafted to match the greedy output for
    exactly k tokens (achieved k verified on-device via the accept count).
    Shared by the 7B int8 headline section and the int4 sections."""
    import jax.numpy as jnp

    lat_k = {}
    for k in range(1, 8):
        draft = greedy_t.copy()
        if k < 7:
            draft[k:] = greedy_t[k:] + 1  # first mismatch at position k
        draft_d = jnp.asarray(draft[None])
        acts, _, acc = spec_cnt(params, ids_d, mask_d, frame_d, q01, q99, smask, draft_d)
        np.asarray(acts)
        got_k = int(np.asarray(acc)[0])
        lat = []
        for _ in range(12):
            t0 = time.perf_counter()
            acts, _, _ = spec_cnt(params, ids_d, mask_d, frame_d, q01, q99, smask, draft_d)
            np.asarray(acts)
            lat.append(time.perf_counter() - t0)
        lat_k[k] = float(np.percentile(lat, 50))
        # Device semantics (vlm.py generate_speculative): the count includes
        # the canonical token0 AND the verify pass's free continuation g[0],
        # so a draft matching at positions < k yields count min(k+1, 7).
        # The accept histogram counts 1 + matched-prefix — one LESS than the
        # device for the same event — so lat_k[histogram-k] is exactly the
        # latency of that event's device count: the conventions cancel by
        # construction (do not "fix" one side alone).
        if got_k != min(k + 1, 7):
            print(f"[bench] WARNING: crafted draft for k={k} accepted {got_k} "
                  f"(expected {min(k + 1, 7)})", file=sys.stderr)
    curve = " ".join(f"k={k}:{v*1e3:.0f}ms" for k, v in lat_k.items())
    print(f"[bench] speculative latency curve (accepted tokens -> p50): {curve}", file=sys.stderr)
    breakeven = next((k for k in range(1, 8) if 1.0 / lat_k[k] >= 2 * REFERENCE_ACTIONS_PER_SEC), None)
    print(f"[bench] breakeven for 2x baseline (12 a/s): >= {breakeven} of 7 tokens accepted per tick"
          if breakeven else "[bench] 12 a/s unreachable even at full acceptance", file=sys.stderr)
    return lat_k


def _compose_spec_acceptance(lat_k: dict) -> dict:
    """(b) of the composition: accept-count distributions on synthetic smooth
    streams (three motion regimes x three drafting strategies: previous
    action / token-space linear extrapolation / extrapolation with the
    per-dim step clamped to +-8 bins), composed with the measured latency
    curve into effective a/s. Returns {(regime, strat): (mean_k, eff)}."""
    results = {}
    for regime, (amp, t_lo, t_hi, noise_bins) in {
        "settle": (0.06, 2.0, 4.0, 0.25),    # grasp / fine alignment
        "nominal": (0.30, 1.5, 3.0, 0.5),    # typical tabletop reach
        "aggressive": (0.80, 0.8, 1.5, 1.0), # fast transfer
    }.items():
        tok_stream = _smooth_stream_tokens(amp, t_lo, t_hi, noise_bins, n_ticks=1500, seed=17)
        for strat in ("prev", "extrap", "hybrid"):
            hist = _accept_histogram(tok_stream, strat)
            mean_k = float(sum(k * p for k, p in hist.items()))
            eff = 1.0 / sum(p * lat_k[k] for k, p in hist.items())
            results[(regime, strat)] = (mean_k, eff)
    for (regime, strat), (mean_k, eff) in results.items():
        print(f"[bench] speculative/{regime}/{strat}: mean accepted {mean_k:.2f}/7 "
              f"-> {eff:.2f} a/s effective", file=sys.stderr)
    return results


def _smooth_stream_tokens(amp: float, t_lo: float, t_hi: float, noise_bins: float,
                          n_ticks: int = 1500, hz: float = 10.0, seed: int = 17) -> np.ndarray:
    """Synthetic smooth 7-DoF control stream, tokenized with the production
    binning. Returns bin indices [n_ticks, 7] in [1, 256].

    Dims 0-5 are normalized action deltas tracing minimum-jerk reach segments
    (bell-shaped velocity profiles: only 1-3 dims move per segment, like a
    tabletop reach), plus Ornstein-Uhlenbeck sensor/policy noise with
    stationary std `noise_bins` bin widths. Dim 6 is a binary gripper that
    toggles between segments ~20% of the time. Tokenization is the exact
    digitize contract of vla/action_tokenizer.py (256 bins over [-1, 1])."""
    from bridgelang_tpu.vla.action_tokenizer import make_bins

    rng = np.random.default_rng(seed)
    bins, _ = make_bins(256)
    bin_w = 2.0 / 255.0
    dt = 1.0 / hz

    stream = np.zeros((n_ticks, 7), np.float64)
    tick = 0
    grip = 1.0
    while tick < n_ticks:
        dur = rng.uniform(t_lo, t_hi)
        n = max(2, int(dur * hz))
        # minimum-jerk velocity bell: v(tau) = 30 tau^2 (1-tau)^2, peak 1.875
        tau = (np.arange(n) + 0.5) / n
        bell = 30.0 * tau**2 * (1.0 - tau) ** 2 / 1.875
        active = rng.choice(6, size=rng.integers(1, 4), replace=False)
        seg = np.zeros((n, 6))
        for d in active:
            seg[:, d] = rng.uniform(-amp, amp) * bell
        end = min(tick + n, n_ticks)
        stream[tick:end, :6] = seg[: end - tick]
        if rng.random() < 0.2:
            grip = 1.0 - grip
        stream[tick:end, 6] = grip * 2.0 - 1.0
        tick = end

    # OU noise on the continuous dims: x' = a x + sqrt(1-a^2) sigma eps,
    # theta=2/s -> consecutive-tick correlation exp(-2 dt) at the control rate.
    a = np.exp(-2.0 * dt)
    sigma = noise_bins * bin_w
    noise = np.zeros((n_ticks, 6))
    for t in range(1, n_ticks):
        noise[t] = a * noise[t - 1] + np.sqrt(1 - a * a) * sigma * rng.standard_normal(6)
    stream[:, :6] = np.clip(stream[:, :6] + noise, -1.0, 1.0)
    return np.digitize(np.clip(stream, -1.0, 1.0), bins).astype(np.int32)


def _accept_histogram(tok_stream: np.ndarray, strategy: str) -> dict:
    """P(accepted tokens = k), k in [1, 7], for a drafting strategy over a
    binned stream, under the speculative gate's semantics: token 0 is always
    re-decoded; tokens 1..6 are accepted along the longest common prefix of
    the draft vs the current tick's tokens (generate_speculative).

    Strategies (all pure token/bin arithmetic, as served — see
    serving.server.draft_from_history):
      prev    draft_t = tokens_{t-1}
      extrap  draft_t = clip(2 tokens_{t-1} - tokens_{t-2})  (linear in bin
              space == linear in value space for uniform bins)
      hybrid  per-dim: extrapolate (step clamped to +-8 bins) only where the
              last step was >= 2 bins — tracks moving dims without letting
              extrapolation amplify sensor noise on the static dims (measured
              best on nominal-motion streams)."""
    ks = _accept_stream(tok_stream, strategy)
    counts = np.bincount(ks, minlength=8)
    total = counts.sum()
    return {k: counts[k] / total for k in range(1, 8) if counts[k]}


def _accept_stream(tok_stream: np.ndarray, strategy: str) -> np.ndarray:
    """Per-tick accepted-token count k_t in [1, 7] for a drafting strategy
    over a binned stream (same gate semantics as _accept_histogram, which is
    its bincount). The SEQUENCE (not just the histogram) drives the closed
    loop's replayed speculative mode: tick t's crafted draft mismatches at
    position k_t, reproducing the trajectory's acceptance through REST."""
    n = len(tok_stream)
    ks = np.zeros(n - 2, np.int64)
    for t in range(2, n):
        cur, p1, p2 = tok_stream[t], tok_stream[t - 1], tok_stream[t - 2]
        if strategy == "prev":
            draft = p1
        else:
            step = p1.astype(np.int64) - p2
            if strategy == "hybrid":
                step = np.clip(step, -8, 8)
                step = np.where(np.abs(step) >= 2, step, 0)
            draft = np.clip(p1 + step, 1, 256)
        match = draft[1:] == cur[1:]
        ks[t - 2] = 1 + int(np.argmin(match)) if not match.all() else 7
    return ks


def _run_section_subprocess(mode: str, timeout_s: float) -> list:
    """Run one bench section as `python bench.py <mode>`; return its metric
    lines (salvaged from partial stdout if the section times out)."""
    import signal
    import subprocess

    # Each section runs in its OWN session so a timeout kill reaps the whole
    # process GROUP — including grandchildren (the data section's
    # bench_data.py tf.data loop): subprocess.run's timeout kills only the
    # direct child, and an orphaned pipeline saturating this 1-core host
    # would corrupt every following TPU section's latency numbers.
    # The parent just confirmed the relay is up, so cap the child's own
    # wait low: a 1500s child wait inside a 900s subprocess timeout would
    # otherwise eat the whole budget and die having benched nothing.
    with subprocess.Popen(
        [sys.executable, __file__, mode],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
        env={**os.environ, "BRIDGELANG_TPU_WAIT_S": "120"},
    ) as popen:

        def _kill_group():
            try:
                os.killpg(os.getpgid(popen.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass

        timed_out = False
        try:
            out, err = popen.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            timed_out = True
            _kill_group()
            out, err = popen.communicate()  # drain whatever the pipes hold
        except BaseException:
            # The child is in its OWN session, so Ctrl-C no longer reaches it
            # via the foreground group (it did before the group-kill change).
            # Any other exit path must reap the group too, or the section
            # keeps holding the single TPU after the driver dies.
            _kill_group()
            raise
    proc = subprocess.CompletedProcess(popen.args, popen.returncode, out or "", err or "")
    if timed_out:
        # salvage any metric line the child printed before the kill (sections
        # print each metric the moment it is measured for exactly this case)
        sys.stderr.write(proc.stderr[-2000:])
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')]
        if lines:
            print(f"[bench] {mode} section timed out AFTER {len(lines)} metric line(s); kept them",
                  file=sys.stderr)
        else:
            print(f"[bench] {mode} section timed out with no metric line; skipping", file=sys.stderr)
        return lines
    sys.stderr.write(proc.stderr[-2000:])
    # a mode can print several metric lines (13b4: capacity + batched-8)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')]
    if proc.returncode != 0 or not lines:
        print(f"[bench] {mode} section failed (rc={proc.returncode}, {len(lines)} metric lines)",
              file=sys.stderr)
    return lines


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
    # donate_argnums=0: the old TrainState's buffers become the new one's —
    # without donation XLA holds params+opt_state TWICE across the step.
    step_fn = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=trainable,
                                          grad_dtype=jnp.bfloat16, remat_policy="dots"),
                      donate_argnums=0)
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


def _vlm_pretrain_bench(norm_stats, batch: int = 16, t: int = 128):
    """VLM pretraining step on-chip, both reference stages (VERDICT r04
    item 5 — the only reference training loop with no measured number):
    `align` (frozen ViT+LLM, projector-only — reference pretrain.py stage 1)
    and `finetune` (projector+LLM — stage 2), through the same
    make_vla_train_step machinery scripts/pretrain.py jits, at the
    depth-trimmed-but-full-dim 7B geometry _train_bench uses (2 of 32
    layers; full depth cannot fit 16 GB in bf16). Reference loop being
    matched: prismatic/training/strategies/base_strategy.py:106-241.

    MFU accounting differs per stage: finetune counts 6*N*D on LLM+projector
    (fwd+wgrad+dgrad); align counts 4*N*D on the frozen LLM (fwd+dgrad only —
    jax.grad w.r.t. the projector leaves skips frozen wgrads) + 6*N*D on the
    projector, + the frozen vision fwd in both."""
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.training.trainer import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_vla_train_step,
    )

    LLM_LAYERS = 2
    cfg = VLMConfig.from_ids(
        model_id="prism-dinosiglip-224px+7b",
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id="llama2-7b-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        image_resize_strategy="resize-naive",
        llm_overrides={"n_layers": LLM_LAYERS},
    )
    model = PrismaticVLM(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # LLaVA-style multimodal batch: BOS + prompt + response, response-only
    # supervision (preprocessing/datasets.py masks prompt positions to -100).
    ids = np.full((batch, t), cfg.llm.pad_token_id, np.int32)
    mask = np.zeros((batch, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:96] = rng.integers(3, 31000, size=(batch, 95))
    mask[:, :96] = 1
    labels = np.where(mask == 1, ids, -100)
    labels[:, :40] = -100  # prompt positions are unsupervised
    device_batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.normal(size=(batch, 6, 224, 224)), dtype=jnp.bfloat16),
    }

    f_len = t + model.num_patches
    tokens = batch * f_len
    vis_tokens = batch * (model.num_patches + 5)

    for stage, metric_name in (("align", "vlm_align_step_tokens_per_sec"),
                               ("finetune", "vlm_pretrain_step_tokens_per_sec")):
        params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)
        trainable = model.trainable_mask(params, stage)
        optimizer = make_optimizer(OptimConfig(learning_rate=1e-3 if stage == "align" else 2e-5,
                                               total_steps=1000),
                                   params, trainable_mask=trainable)
        step_fn = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=trainable,
                                              grad_dtype=jnp.bfloat16, remat_policy="dots"),
                          donate_argnums=0)
        state = init_train_state(params, optimizer, trainable_mask=trainable)
        t0 = time.time()
        state, m = step_fn(state, device_batch)
        loss0 = float(m["loss"])
        print(f"[bench] vlm-{stage} compile+first: {time.time()-t0:.1f}s loss={loss0:.3f}",
              file=sys.stderr)
        steps, losses = [], [loss0]
        for _ in range(8):
            t1 = time.perf_counter()
            state, m = step_fn(state, device_batch)
            losses.append(float(m["loss"]))  # sync
            steps.append(time.perf_counter() - t1)
        p50 = float(np.percentile(steps, 50))
        if float(np.mean(losses[-3:])) >= losses[0]:
            print(f"[bench] WARNING: vlm-{stage} loss did not drop on a fixed batch",
                  file=sys.stderr)
        n_llm = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["llm"]))
        n_proj = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["projector"]))
        n_vis = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["vision"]))
        llm_mult = 4.0 if stage == "align" else 6.0
        flops = llm_mult * n_llm * tokens + 6.0 * n_proj * tokens + 2.0 * n_vis * vis_tokens
        mfu = flops / p50 / V5E_BF16_PEAK_FLOPS
        tok_s = tokens / p50
        print(f"[bench] vlm-{stage} step p50={p50*1e3:.0f}ms -> {tok_s:,.0f} tokens/s, "
              f"true MFU={mfu*100:.1f}% (loss {losses[0]:.3f}->{losses[-1]:.3f})",
              file=sys.stderr)
        print(json.dumps({
            "metric": metric_name,
            "value": round(tok_s, 1),
            "unit": (f"tokens/sec (mfu={mfu:.3f}, stage={stage}, {LLM_LAYERS}-layer-7b-dims, "
                     f"b{batch}, seq {t}+{model.num_patches} patches, dots-remat)"),
            "vs_baseline": round(mfu, 3),
        }), flush=True)
        # free the first stage's state before the second compiles
        del state, params, optimizer, step_fn
        import gc

        gc.collect()
    return None


def _lora_bench(norm_stats, batch: int = 16, remat: str = "full", size: str = "7b"):
    """Full-depth LoRA fine-tune step on one chip — the reference's most-used
    workflow (vla-scripts/finetune.py:9-11, PEFT r=32 "all-linear" + 8-bit
    base) at its real depth: quantized frozen base + fp32 r=32 adapters +
    adapter-only Adam + full-remat activations. Unlike _train_bench (a
    2-of-32-layer proxy forced by bf16 footprint), every number here is
    measured at full depth. size="13b" swaps in the 40-layer Llama-2 13B on a
    packed-int4 base (--quantization_bits 4): QLoRA for a model whose bf16
    finetune needs multiple A100-80GBs, on ONE 16 GB chip.

    `bench.py lora [batch] [remat]` / `bench.py lora13b [batch]` overrides.
    MEASURED dead end: remat="dots" at full depth needs 21.4 GB even at b8
    (compile-time OOM vs the 15.75 GB chip) — the saved matmul outputs of 32
    layers dwarf the recompute saving; "full" is the only full-depth fit."""
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.quant import init_llm_params_int4, init_llm_params_int8
    from bridgelang_tpu.models.projector import init_projector_params
    from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask
    from bridgelang_tpu.training.trainer import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_vla_train_step,
    )

    cfg = VLMConfig.from_ids(
        model_id=f"prism-dinosiglip-224px+{size}",
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id=f"llama2-{size}-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        image_resize_strategy="resize-naive",
    )
    model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16)
    k_vis, k_proj, k_llm, k_lora = jax.random.split(
        jax.random.key(int(os.environ.get("BENCH_LORA_SEED", "0"))), 4)
    dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
    vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.vision_module.init(k_vis, dummy)["params"])
    projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim, cfg.llm.dim, dtype=jnp.bfloat16)
    base_kind = "int4" if size == "13b" else "int8"
    # BENCH_INT4_GROUP: same pack-time lever as the 13b4 serving section —
    # the QLoRA forward (bf16-dot kernel) pays the identical per-group scale
    # fixups (docs/int4.md).
    group = int(os.environ.get("BENCH_INT4_GROUP", "128"))
    base = (init_llm_params_int4(k_llm, cfg.llm, group=group) if base_kind == "int4"
            else init_llm_params_int8(k_llm, cfg.llm))
    llm = add_lora_params(k_lora, base, rank=32)
    params = {"vision": vision, "projector": projector, "llm": llm}
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    print(f"[bench] lora model: {n_bytes/1e9:.1f} GB on-chip ({base_kind} base + fp32 r=32 adapters)",
          file=sys.stderr)

    trainable = lora_trainable_mask(params)
    optimizer = make_optimizer(OptimConfig(learning_rate=5e-4, lr_scheduler_type="constant",
                                           total_steps=1000), params, trainable_mask=trainable)
    # donate_argnums=0 is what makes full-depth fit at all: without it the
    # step transiently holds TWO copies of the 9.2 GB state (the frozen int8
    # base is duplicated into the outputs) and OOMs at any batch size.
    step_fn = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=trainable,
                                          grad_dtype=jnp.bfloat16, remat_policy=remat),
                      donate_argnums=0)

    # Spike diagnosis knobs (VERDICT r03 item 3): BENCH_LORA_SEED varies the
    # data/init seed, BENCH_LORA_STEPS lengthens the fixed-batch trajectory
    # past the bench's default 6 (the r03 spike landed at step 5).
    seed = int(os.environ.get("BENCH_LORA_SEED", "0"))
    n_steps = int(os.environ.get("BENCH_LORA_STEPS", "6"))
    rng = np.random.default_rng(seed)
    t = 48
    # b16 is the reference finetune.py per-GPU default. Without donation this
    # OOMed at ANY batch size (two copies of the 9.2 GB state); with the
    # donated step the working set is state + activations and b16 fits.
    BATCH = batch
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
    state = init_train_state(params, optimizer, trainable_mask=trainable)
    state, m = step_fn(state, batch)
    loss0 = float(m["loss"])
    print(f"[bench] lora-step compile+first: {time.time()-t0:.1f}s loss={loss0:.3f} (b{BATCH})",
          file=sys.stderr)

    steps, losses = [], [loss0]
    for _ in range(n_steps):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))  # sync
        steps.append(time.perf_counter() - t0)
    p50 = float(np.percentile(steps, 50))
    print(f"[bench] lora loss trajectory (fixed batch): "
          f"{' -> '.join(f'{l:.3f}' for l in losses)}", file=sys.stderr)
    if float(np.mean(losses[-3:])) >= losses[0]:
        print("[bench] WARNING: lora losses did not drop on a fixed batch", file=sys.stderr)

    # TRUE MFU, full-remat recompute excluded: fwd runs base+adapters
    # (2*N_llm), the activation-grad pass re-traverses them (2*N_llm), the
    # weight-grad pass touches only the adapters (2*N_lora, already inside
    # N_llm for the fwd/dx terms); vision+projector are frozen AND untrained,
    # so only their forward runs (grads are dead-code-eliminated).
    f_len = t + model.num_patches
    tokens = BATCH * f_len
    leaves = [(jax.tree_util.keystr(p), x) for p, x in jax.tree_util.tree_leaves_with_path(params["llm"])]
    n_lora = sum(int(x.size) for p, x in leaves if "_lora_" in p)
    # packed-int4 leaves store two params per byte-element: count them double
    n_llm = sum(
        int(x.size) * (2 if any(p2 == p[:-2] + "_scale4']" for p2, _ in leaves) else 1)
        for p, x in leaves
        if not (p.endswith("_scale']") or p.endswith("_scale4']") or "_lora_" in p))
    n_proj = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["projector"]))
    n_vis = sum(int(x.size) for x in jax.tree_util.tree_leaves(params["vision"]))
    vis_tokens = BATCH * (model.num_patches + 5)
    flops = (4.0 * (n_llm + n_lora) + 2.0 * n_lora) * tokens + 2.0 * (n_proj * tokens + n_vis * vis_tokens)
    mfu = flops / p50 / V5E_BF16_PEAK_FLOPS
    tok_s = tokens / p50
    print(
        f"[bench] lora step p50={p50*1e3:.0f}ms -> {tok_s:,.0f} tokens/s, "
        f"true MFU={mfu*100:.1f}% ({cfg.llm.n_layers}-layer {size} {base_kind} base + r32 adapters, "
        f"batch {BATCH}, {remat}-remat)",
        file=sys.stderr,
    )
    return {
        "metric": f"vla_lora_finetune_tokens_per_sec" if size == "7b" else "vla13b_qlora_finetune_tokens_per_sec",
        "value": round(tok_s, 1),
        "unit": f"tokens/sec (mfu={mfu:.3f}, full-depth-{size}-{base_kind}-base, r32, b{BATCH}, {remat}-remat)",
        "vs_baseline": round(mfu, 3),
    }


def _int4_serving_bench(norm_stats, size="13b"):
    """Serving via the packed-int4 mode (w4a8 fused kernel), sequential
    greedy, same methodology as the 7B headline. size="13b": the CAPACITY
    story — 13B int8 loads (14.6 GB) but OOMs at execution (measured, round
    2), int4 (~8.7 GB total) brings 13B back to a single chip, mirroring the
    reference's load_in_4bit memory story (verify_openvla.py:60).
    size="7b": the SPEED story — the w4a8 kernel halves decode's HBM
    traffic vs int8, trading int4 weight precision for latency."""
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.projector import init_projector_params
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.quant import init_llm_params_int4

    cfg = VLMConfig.from_ids(
        model_id=f"prism-dinosiglip-224px+{size}",
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id=f"llama2-{size}-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        image_resize_strategy="resize-naive",
        # a8: int4 dots ride the MXU int8 path (ops/int4_matmul.py) — exact
        # int32 nibble recovery; only adds per-token activation rounding.
        llm_overrides={"w8a8": True},
    )
    model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16, prompt_bucket=48)
    k_vis, k_proj, k_llm = jax.random.split(jax.random.key(0), 3)
    dummy = jnp.zeros((1, 6, 224, 224), dtype=jnp.bfloat16)
    vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.vision_module.init(k_vis, dummy)["params"])
    projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim, cfg.llm.dim,
                                      dtype=jnp.bfloat16)
    # BENCH_INT4_GROUP: pack-time scale-group size (docs/int4.md group-size
    # lever — bigger groups cut the per-group scale fixup cost at decode AND
    # prefill, for a measured dequant-error cost). 256 is the measured knee
    # for BOTH sizes (7B: 8.66 vs 7.62 a/s; 13B: 5.68 vs 4.99), so it is the
    # serving default here; the JSON unit records it.
    group = int(os.environ.get("BENCH_INT4_GROUP", "256"))
    llm = init_llm_params_int4(k_llm, cfg.llm, group=group)
    params = {"vision": vision, "projector": projector, "llm": llm}
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    print(f"[bench] {size}-int4 model: {n_bytes/1e9:.1f} GB on-chip (group={group})", file=sys.stderr)

    stats = norm_stats["bridge_orig"]["action"]
    q01 = jnp.asarray(stats["q01"], jnp.float32)
    q99 = jnp.asarray(stats["q99"], jnp.float32)
    smask = jnp.asarray(stats["mask"])
    rng = np.random.default_rng(0)
    ids = np.full((1, 48), cfg.llm.pad_token_id, np.int32)
    mask = np.zeros((1, 48), np.int32)
    ids[0, 0], ids[0, 1:26], ids[0, 26] = 1, rng.integers(3, 31000, 25), 29871
    mask[0, :27] = 1
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    predict = model._jitted_predict_frames(7)

    t0 = time.time()
    frame = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
    np.asarray(predict(params, ids_d, mask_d, jnp.asarray(frame[None]), q01, q99, smask))
    print(f"[bench] {size}-int4 compile+first call: {time.time()-t0:.1f}s", file=sys.stderr)
    lat = []
    for _ in range(15):
        f = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        np.asarray(predict(params, ids_d, mask_d, jnp.asarray(f[None]), q01, q99, smask))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    note = "one chip; int8 13B cannot execute here at all" if size == "13b" else "one chip; w4a8 speed mode"
    print(f"[bench] {size}-int4 sequential p50={p50*1e3:.1f}ms -> {1.0/p50:.2f} actions/s "
          f"({note})", file=sys.stderr)
    # Emit the capacity line BEFORE the optional speculative curve: a
    # cold-cache speculative compile can blow the subprocess timeout, and the
    # already-measured headline must survive that (the runner salvages
    # stdout from TimeoutExpired).
    print(json.dumps({
        "metric": f"openvla{size}-int4_predict_action_throughput",
        "value": round(1.0 / p50, 3),
        "unit": (f"actions/sec (13B on ONE 16GB chip via packed int4 group={group} — int8 13B OOMs)"
                 if size == "13b"
                 else f"actions/sec (7B packed-int4 w4a8 speed mode, group={group})"),
        "vs_baseline": round(1.0 / p50 / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)

    # Speculative composition, same two measured halves as the 7B int8
    # headline (latency(k) curve x synthetic smooth-stream acceptance): one
    # verification pass replaces the six decode passes when a draft is
    # accepted, and each 13B decode step streams GBs — the larger the model,
    # the bigger the speculative win.
    try:
        frame_d = jnp.asarray(frame[None])
        spec = model._jitted_predict_frames_speculative(margin_threshold=0.0,
                                                        return_accept_count=True)
        _, toks, _ = spec(params, ids_d, mask_d, frame_d, q01, q99, smask,
                          jnp.zeros((1, 7), jnp.int32))
        greedy_t = np.asarray(toks)[0].astype(np.int32)
        lat_k = _measure_spec_latency_curve(spec, params, ids_d, mask_d, frame_d,
                                            q01, q99, smask, greedy_t)
        results = _compose_spec_acceptance(lat_k)
        best_strat = max(("prev", "extrap", "hybrid"),
                         key=lambda s: results[("nominal", s)][1])
        mean_k, eff = results[("nominal", best_strat)]
        print(json.dumps({
            "metric": f"openvla{size}-int4_speculative_effective_throughput",
            "value": round(eff, 2),
            "unit": (f"actions/sec (group={group}; measured latency(k) x synthetic "
                     f"smooth-stream acceptance; nominal regime, draft={best_strat}, "
                     f"mean {mean_k:.2f}/7 accepted; conditional on the policy "
                     f"tracking the stream)"),
            "vs_baseline": round(eff / REFERENCE_ACTIONS_PER_SEC, 3),
        }), flush=True)
    except Exception as e:  # never let the extra curve kill the capacity line
        print(f"[bench] {size} speculative curve skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # Batched int4 serving on ONE chip: one packed-weight stream serves the
    # whole batch per decode step, and the kernel's decode grid tiles rows in
    # 8-row blocks, so B in {8, 16, 32} pads nothing. int8 KV keeps the cache
    # off the weight budget. Beyond the 13B capacity story, int4's smaller
    # weight footprint (7B g128: ~4.7 GB, g256: 5.1 GB incl. bf16 towers —
    # the "[bench] ...-int4 model" line above is authoritative — vs int8's
    # ~8.3) buys HBM headroom
    # for batch sizes the int8 mode cannot hold — B=32 at 7B is ~10.4 GB of
    # int8 KV cache alone, which only coexists with int4 weights.
    batches = (8, 16) if size == "13b" else (16, 32)
    try:
        model.cache_dtype = jnp.int8
        fn_b = model._jitted_predict_frames(7)
        for B in batches:
            try:
                ids_b = jnp.asarray(np.repeat(ids, B, axis=0))
                mask_b = jnp.asarray(np.repeat(mask, B, axis=0))
                frames_b = jnp.asarray(rng.integers(0, 255, size=(B, 224, 224, 3), dtype=np.uint8))
                t0 = time.time()
                np.asarray(fn_b(params, ids_b, mask_b, frames_b, q01, q99, smask))
                print(f"[bench] {size}-int4 batched B={B} compile+first call: "
                      f"{time.time()-t0:.1f}s", file=sys.stderr)
                lat_b = []
                for _ in range(8):
                    t0 = time.perf_counter()
                    np.asarray(fn_b(params, ids_b, mask_b, frames_b, q01, q99, smask))
                    lat_b.append(time.perf_counter() - t0)
                p50_b = float(np.percentile(lat_b, 50))
                print(f"[bench] {size}-int4 batched B={B} (int8 KV): p50={p50_b*1e3:.1f}ms -> "
                      f"{B/p50_b:.1f} actions/s aggregate", file=sys.stderr)
                print(json.dumps({
                    "metric": f"openvla{size}-int4_batched{B}_throughput",
                    "value": round(B / p50_b, 2),
                    "unit": f"actions/sec aggregate ({size}, B={B}, group={group}, int8 KV, one 16GB chip)",
                    "vs_baseline": round(B / p50_b / REFERENCE_ACTIONS_PER_SEC, 3),
                }), flush=True)
            except Exception as e:
                # An OOM at the largest batch must not kill the smaller ones'
                # already-printed lines (B=32 at 7B is deliberately at the
                # edge of the 16 GB budget).
                print(f"[bench] {size}-int4 batched B={B} failed: {type(e).__name__}: {e}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] {size}-int4 batched mode failed: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        model.cache_dtype = jnp.bfloat16

    return None  # JSON already printed above (pre-speculative)


def _np_center_crop_resize(img_u8, crop_scale: float = 0.9):
    """Client-side center-crop(sqrt(scale))+bilinear-resize-back in pure
    numpy — the robot-client analogue of crop_and_resize (reference
    openvla_utils.py:81-124). The REAL eval client runs this on its own CPU;
    a jnp implementation here would round-trip the TPU relay and double-count
    RTT into the control-loop number."""
    h, w = img_u8.shape[:2]
    r = float(np.sqrt(crop_scale))
    ch, cw = int(round(h * r)), int(round(w * r))
    top, left = (h - ch) // 2, (w - cw) // 2
    crop = img_u8[top:top + ch, left:left + cw].astype(np.float32)
    yi = np.linspace(0, ch - 1, h)
    xi = np.linspace(0, cw - 1, w)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, ch - 1)
    x1 = np.minimum(x0 + 1, cw - 1)
    wy = (yi - y0)[:, None, None]
    wx = (xi - x0)[None, :, None]
    out = (crop[y0][:, x0] * (1 - wy) * (1 - wx) + crop[y0][:, x1] * (1 - wy) * wx
           + crop[y1][:, x0] * wy * (1 - wx) + crop[y1][:, x1] * wy * wx)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _closed_loop_bench(norm_stats, ticks: int = 40):
    """Sustained closed-loop control rate a robot actually experiences
    (VERDICT r03 item 5): fake-sim frames -> client-side center crop ->
    HTTP POST /act -> gripper renormalize+invert (the LIBERO loop's per-tick
    work, run_libero_eval.py:186-238) -> next tick. Three serving modes:
    sequential greedy, server-side-drafted speculative (the production
    default), and chunked open-loop (H=8 parallel decode). Client and server
    share this 1-core host; a real deployment gives the client its own CPU,
    so these are conservative."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent))
    from experiments.robot.openvla_utils import RemoteVLA
    from experiments.robot.robot_utils import invert_gripper_action, normalize_gripper_action

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.serving.server import VLAServer, client_act

    model, params = _build_flagship_int8(norm_stats)
    # REST requests carry instruction STRINGS (unlike _serving_bench's
    # pre-tokenized prompt ids) — without a tokenizer every /act 500s.
    model.tokenizer = get_tokenizer(None)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(256, 256, 3)).astype(np.int16)

    # Compile every program the modes hit BEFORE any HTTP request, at the
    # fake camera's EXACT frame shape (jit shape = input shape; the crop
    # helper preserves 256x256): a first-tick 7B compile over the relay
    # outruns client_act's 120 s socket timeout (measured: the canonical
    # r04 rerun died exactly there). The speculative program covers EVERY
    # margin (margin is a traced operand since r05), so the calibrated
    # margins below need no further warming; the accept-count variant the
    # calibration sweeps is its own (warmed) program.
    t_w = time.time()
    warm = np.zeros(base.shape, np.uint8)
    model.predict_action(params, warm, "warmup", unnorm_key="bridge_orig")
    model.predict_action_speculative(params, warm, "warmup", np.zeros(7, np.int32),
                                     unnorm_key="bridge_orig")
    model.parallel_decode = True
    try:
        model.predict_action_chunk(params, warm, "warmup", horizon=8,
                                   unnorm_key="bridge_orig")
    finally:
        model.parallel_decode = False
    print(f"[bench] closedloop warmup (seq+speculative+chunk8): {time.time()-t_w:.1f}s",
          file=_sys.stderr)

    def frame(t):
        # smoothly drifting scene + sensor noise: consecutive frames are
        # similar, like a camera stream (drafting sees a plausible stream;
        # random weights still make margins degenerate — noted in the unit)
        drift = (10 * np.sin(t / 7.0)).astype(np.int16)
        noise = rng.integers(-3, 4, size=base.shape).astype(np.int16)
        return np.clip(base + drift + noise, 0, 255).astype(np.uint8)

    # Calibrated margin gate (VERDICT r04 item 4): match the speculative
    # near-tie gate to THIS checkpoint's own top-1 logit margins instead of
    # the production default 0.25 (sized for real checkpoints' wide margins;
    # random weights' near-tie logits never clear it, so every draft was
    # rejected in r03/r04 regardless of scene motion).
    t_c = time.time()
    # 8 calibration frames, not 3: random-weight top-1 gaps vary frame to
    # frame, and a margin that fully accepts self-drafts on 3 frames still
    # truncated ~30% of injected accepts on the 40-frame replay (measured
    # 2026-08-20, scripts/diag_spec_margin.py: true k 5.00 at margin 0 ->
    # 3.67 at 0.25). With more evidence the calibration lands where the
    # docstring's fallback says: ~0 for random weights (argmax-only gating),
    # ~0.25 for real checkpoints' decisive logits.
    cal_frames = [_np_center_crop_resize(frame(t)) for t in range(8)]
    margin_cal = model.calibrate_speculative_margin(params, cal_frames, "push the block",
                                                    unnorm_key="bridge_orig")
    print(f"[bench] calibrated speculative margin: {margin_cal} "
          f"(sweep took {time.time()-t_c:.1f}s incl. accept-count program warmup)",
          file=_sys.stderr)

    def run_mode(name, server_kwargs, client_kwargs, ticks=ticks, chunk=1):
        # Every mode times the SAME per-tick client pipeline: center-crop of a
        # pre-generated raw camera frame (a real camera delivers frames for
        # free, so frame SYNTHESIS stays outside the timed loop — it is sim
        # work, not client work) + HTTP round trip + gripper renorm. The
        # replayed-speculative loop below uses the identical structure, so
        # the modes are directly comparable (r05 review finding).
        raw = [frame(t) for t in range(ticks + 3)]
        server = VLAServer(model, params, default_unnorm_key="bridge_orig", **server_kwargs)
        httpd = server.serve_background(port=0)
        port = httpd.server_address[1]
        try:
            vla = RemoteVLA("127.0.0.1", port, **client_kwargs)
            # warmup: compile + prime the server draft cache
            for t in range(3):
                img = _np_center_crop_resize(raw[t])
                vla.predict(img, "push the block", "bridge_orig")
            t0 = time.perf_counter()
            for t in range(ticks):
                img = _np_center_crop_resize(raw[3 + t])
                action = vla.predict(img, "push the block", "bridge_orig")
                action = invert_gripper_action(normalize_gripper_action(np.asarray(action, np.float64)))
                assert action.shape[-1] == 7
            hz = ticks / (time.perf_counter() - t0)
        finally:
            httpd.shutdown()
        print(f"[bench] closed-loop {name}: {hz:.2f} Hz sustained ({ticks} ticks)", file=_sys.stderr)
        return hz

    hz_seq = run_mode("sequential", {"speculative_default": False}, {})
    print(json.dumps({
        "metric": "closed_loop_hz_sequential",
        "value": round(hz_seq, 2),
        "unit": "Hz sustained (HTTP + client crop + gripper conv; reference control context 5-10 Hz)",
        "vs_baseline": round(hz_seq / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)

    hz_spec = run_mode("speculative(server-draft)",
                       {"speculative_default": True, "speculative_margin": margin_cal}, {})
    print(json.dumps({
        "metric": "closed_loop_hz_speculative",
        "value": round(hz_spec, 2),
        "unit": (f"Hz sustained (server-side hybrid drafting, calibrated margin "
                 f"{margin_cal}; random weights' chaotic frame->token map still rejects "
                 f"most drafts on a moving scene, so this is the WORST-case speculative "
                 f"rate; real checkpoints track the scene — verify.py --speculative_stream)"),
        "vs_baseline": round(hz_spec / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)

    # REPLAYED-trajectory speculative mode (VERDICT r04 item 4, replacing the
    # static-scene margin-0 ceiling probe): the same smooth-motion scene, but
    # each tick's CLIENT draft reproduces the acceptance a checkpoint
    # tracking a replayed trajectory would see. The replayed source is the
    # minimum-jerk nominal-motion stream tokenized with the production
    # binning (_smooth_stream_tokens — the settle/nominal source) drafted
    # with the production hybrid strategy; its per-tick accepted count k_t
    # (_accept_stream) picks the crafted draft's first-mismatch position
    # against the model's recorded greedy tokens for that exact frame.
    # Every tick is the REAL 7B verify + fix-up decode work for k_t accepted
    # tokens, end-to-end through REST under the calibrated margin — random
    # weights cannot track a scene, so acceptance is injected via the draft
    # while ALL compute, transport, and serving stay production. Real-
    # checkpoint acceptance replaces the injection the first session with
    # staged weights (scripts/verify.py --speculative_stream).
    tok_stream = _smooth_stream_tokens(0.30, 1.5, 3.0, 0.5, n_ticks=ticks + 10, seed=17)
    k_stream = _accept_stream(tok_stream, "hybrid")
    # Record the model's greedy tokens per tick frame (deterministic scene,
    # deterministic model -> the serving path reproduces these exactly).
    # RAW frames are pre-generated ONCE (`frame()` mutates rng state); the
    # timed loop re-crops the raw frame per tick — the identical per-tick
    # client pipeline run_mode times, and crop is deterministic so the
    # re-cropped pixels match the recording's frames bit-for-bit.
    raw_replay = [frame(100 + t) for t in range(ticks + 3)]
    replay_frames = [_np_center_crop_resize(f) for f in raw_replay]
    greedy_toks = []
    for img in replay_frames:
        _, toks = model.predict_action_speculative(params, img, "push the block",
                                                   np.zeros(7, np.int32),
                                                   unnorm_key="bridge_orig",
                                                   margin_threshold=margin_cal)
        greedy_toks.append(np.asarray(toks, np.int32))
    mean_k = float(np.mean(k_stream[:ticks]))
    server = VLAServer(model, params, default_unnorm_key="bridge_orig",
                        speculative_default=True, speculative_margin=margin_cal)
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        for t in range(3):  # HTTP-path warmup
            client_act("127.0.0.1", port, replay_frames[t], "push the block",
                        draft_tokens=greedy_toks[t], return_tokens=True)
        drafts = []
        for t in range(ticks):
            g = greedy_toks[3 + t]
            k = int(k_stream[t])
            draft = g.copy()
            if k < 7:
                draft[k:] = g[k:] + 1  # first mismatch at the replayed position
            drafts.append(draft)
        served_toks = []
        t0 = time.perf_counter()
        for t in range(ticks):
            img = _np_center_crop_resize(raw_replay[3 + t])  # same client work as run_mode
            action, toks = client_act("127.0.0.1", port, img, "push the block",
                                      draft_tokens=drafts[t], return_tokens=True)
            served_toks.append(np.asarray(toks, np.int32))
            action = invert_gripper_action(normalize_gripper_action(np.asarray(action, np.float64)))
            assert action.shape[-1] == 7
        hz_replay = ticks / (time.perf_counter() - t0)
    finally:
        httpd.shutdown()
    # Greedy-agreement telemetry: the T=7 verification chunk writes KV cache
    # entries under a different bf16 tiling than a pure sequential decode, so
    # the post-rejection decode sees noise-scale logit perturbations — at a
    # near-tie that flips a token vs the recording (the hazard class the
    # margin gate + wide real-checkpoint margins make unobservable in
    # production; generate_speculative docstring). Random weights live AT
    # the near-tie scale, so some ticks diverge; measure it, don't hide it.
    greedy_match = float(np.mean([np.array_equal(served_toks[t], greedy_toks[3 + t])
                                  for t in range(ticks)]))
    # TRUE accepted counts at the served margin (the gate can truncate an
    # injected accept run at any near-tie position — report what the device
    # actually accepted, not just what the draft offered). Zero compiles:
    # the accept-count program is warmed by the calibration sweep.
    fn_cnt = model._jitted_predict_frames_speculative(margin_cal, return_accept_count=True)
    ids_r, mask_r = model.pad_prompt([model.prepare_prompt_ids("push the block")])
    import jax.numpy as _jnp
    stats_r = norm_stats["bridge_orig"]["action"]
    q01_r = _jnp.asarray(stats_r["q01"], _jnp.float32)
    q99_r = _jnp.asarray(stats_r["q99"], _jnp.float32)
    sm_r = _jnp.asarray(stats_r["mask"])
    true_k = [
        int(np.asarray(fn_cnt(params, _jnp.asarray(ids_r), _jnp.asarray(mask_r),
                              _jnp.asarray(replay_frames[3 + t][None]), q01_r, q99_r, sm_r,
                              _jnp.asarray(drafts[t][None]))[2])[0])
        for t in range(ticks)
    ]
    true_mean_k = float(np.mean(true_k))
    print(f"[bench] closed-loop speculative(replayed-trajectory): {hz_replay:.2f} Hz "
          f"(injected mean {mean_k:.2f}/7, device-accepted mean {true_mean_k:.2f}/7, "
          f"greedy-equal {greedy_match:.0%} of ticks, margin {margin_cal})", file=_sys.stderr)
    print(json.dumps({
        "metric": "closed_loop_hz_speculative_replayed",
        "value": round(hz_replay, 2),
        "unit": (f"Hz sustained (replayed minimum-jerk nominal trajectory, production "
                 f"binning + hybrid drafting -> injected mean {mean_k:.2f}/7, device-"
                 f"accepted mean {true_mean_k:.2f}/7 at calibrated margin {margin_cal}; "
                 f"served tokens greedy-equal on {greedy_match:.0%} of ticks — divergent "
                 f"ticks are bf16 near-tie flips in the post-rejection decode, "
                 f"unobservable at real checkpoints' wide margins; acceptance injected per-tick "
                 f"via crafted client drafts against recorded greedy tokens — all 7B "
                 f"compute/REST transport real; random weights cannot track a scene)"),
        "vs_baseline": round(hz_replay / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)

    H = 8
    model.parallel_decode = True
    try:
        hz_chunk = run_mode("chunked(H=8)", {"speculative_default": False},
                            {"action_chunk": H}, ticks=5 * H if ticks >= 40 else ticks)
    finally:
        model.parallel_decode = False
    print(json.dumps({
        "metric": "closed_loop_hz_chunked8",
        "value": round(hz_chunk, 2),
        "unit": f"Hz sustained (H={H} open-loop chunk per fetch; needs --action_chunk fine-tune)",
        "vs_baseline": round(hz_chunk / REFERENCE_ACTIONS_PER_SEC, 3),
    }), flush=True)
    return None


def _data_bench():
    """RLDS preprocessing throughput — the data half of the north-star metric
    named in BASELINE.json ("RLDS frames/sec/chip preprocess"), never captured
    before round 5 (VERDICT r04 item 3). Runs scripts/bench_data.py in a
    subprocess (tf.data must not share a process with jax on this 1-core
    host) and reports host frames/s through the FULL training pipeline:
    synthetic 256px JPEG episodes -> restructure -> normalize -> chunk ->
    weighted interleave -> shuffle -> JPEG decode + resize(224) + augment ->
    batch. Reference pipeline being matched:
    prismatic/vla/datasets/rlds/dataset.py:457-588 (make_interleaved_dataset).
    No TPU involved — this is deliberately a host-CPU number: on a pod each
    host must feed global_batch/n_hosts frames per step from its own cores."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_data.py")
    # NOTE: bench_data.py must share this process's session/group — the
    # orchestrator group-kills the whole section on its outer timeout
    # (_run_section_subprocess), which is what reaps this grandchild if the
    # section dies first; detaching it here would orphan a tf.data loop that
    # saturates this 1-core host through the following TPU sections.
    proc = subprocess.run(
        [sys.executable, script, "--seconds", "12", "--shuffle_buffer_size", "500"],
        capture_output=True, text=True, timeout=DATA_BENCH_TIMEOUT_S - 30,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},  # never let tf-side imports touch the relay
    )
    info = None
    for ln in proc.stdout.splitlines():
        if ln.startswith('{"data_bench"'):
            info = json.loads(ln)["data_bench"]
        elif ln.strip():
            print(ln, file=sys.stderr)
    if info is None:
        sys.stderr.write(proc.stderr[-1500:])
        raise RuntimeError(f"bench_data.py produced no summary line (rc={proc.returncode})")
    nat = info.get("native_tfrecord") or {}
    nat_s = (f"; native TFRecord store reads {nat['gbytes_per_sec']} GB/s CRC32C-verified"
             if nat else "")
    print(json.dumps({
        "metric": "rlds_preprocess_frames_per_sec",
        "value": info["frames_per_sec"],
        "unit": (f"frames/sec per host, full decode+resize+augment interleave pipeline on "
                 f"{info['n_cpu']} CPU core(s) (~{info['per_core_frames_per_sec']}/core; "
                 f"tf.data maps scale across cores, so a many-core TPU host multiplies the "
                 f"per-core rate{nat_s}; reference publishes no pipeline number)"),
        "vs_baseline": 0,
    }), flush=True)
    return None


def _load_test_bench(norm_stats, duration_s: float = 60.0, n_clients: int = 6):
    """Concurrent mixed-traffic load test (VERDICT r03 item 8): half the
    clients send plain requests (micro-batched path), half send client-draft
    speculative requests (bypass path), across distinct instructions. After
    warmup the server must serve the whole window with ZERO new XLA
    compiles (counted via the jit caches backing every predict variant) and
    a sane p99 (reported from /stats, the server's own observability)."""
    import http.client
    import threading

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from bridgelang_tpu.util.compile_cache import warmup_predict

    model, params = _build_flagship_int8(norm_stats)
    # String instructions over REST need a tokenizer (see _closed_loop_bench).
    model.tokenizer = get_tokenizer(None)
    server = VLAServer(model, params, default_unnorm_key="bridge_orig",
                       max_batch=4, speculative_default=False)
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        dt = warmup_predict(model, params, max_batch=4, unnorm_key="bridge_orig",
                            speculative=True)
        print(f"[bench] loadtest warmup (buckets+speculative): {dt:.1f}s", file=sys.stderr)

        def jit_entries():
            return sum(fn._cache_size() for fn in model._predict_fns.values())

        compiled_before = jit_entries()
        stop = time.time() + duration_s
        counts = [0] * n_clients
        errors = []

        # Frames at the model's transform resolution — warmup_predict warms
        # exactly this input shape; any other camera resolution is its own
        # jit shape and MUST be warmed too (deploy.py's warmup contract).
        size = model.image_transform.towers[0].size

        def client(i):
            draft = np.zeros(7, np.int32)
            # per-thread generator: np.random.Generator is not thread-safe,
            # and the shared parent rng would be hit by 6 threads at once
            img = np.random.default_rng(i).integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            speculative = i % 2 == 1
            instruction = f"task {i}"
            try:
                while time.time() < stop:
                    if speculative:
                        _, toks = client_act("127.0.0.1", port, img, instruction,
                                             draft_tokens=draft, return_tokens=True)
                        if toks is not None:
                            draft = np.asarray(toks, np.int32)
                    else:
                        client_act("127.0.0.1", port, img, instruction)
                    counts[i] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"client{i}: {type(e).__name__}: {e}")

        threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        compiled_after = jit_entries()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        conn.close()
    finally:
        httpd.shutdown()

    total = sum(counts)
    recompiles = compiled_after - compiled_before
    lat = stats.get("latency_ms", {})
    for e in errors[:3]:
        print(f"[bench] loadtest error: {e}", file=sys.stderr)
    print(f"[bench] loadtest: {total} requests in {wall:.1f}s "
          f"({total/wall:.1f} req/s, {n_clients} clients, p50={lat.get('p50')}ms "
          f"p99={lat.get('p99')}ms, {recompiles} post-warmup compiles, "
          f"{stats.get('errors', '?')} server errors)", file=sys.stderr)
    # Regression GATE (VERDICT r04 item 7): the section ASSERTS, not just
    # reports. Post-warmup compiles must be exactly 0 (warmup_predict's
    # contract — any new jit entry means a live request stalled behind a
    # compile) and p99 must stay under a stated bound. The bound is 2x the
    # canonical r04 capture's 735 ms (relay RTT varies 24-37 ms/call by day;
    # a 2x envelope absorbs tunnel jitter but still catches a recompile stall
    # or a serialization regression, which cost seconds-to-minutes).
    # Override via LOADTEST_P99_GATE_MS. Violation exits non-zero AFTER the
    # metric line prints (the orchestrator salvages printed lines), so the
    # artifact records the bad number AND the run fails loudly.
    p99_gate_ms = float(os.environ.get("LOADTEST_P99_GATE_MS", "1500"))
    p99 = lat.get("p99", -1)
    gate_violations = []
    if recompiles != 0:
        gate_violations.append(f"{recompiles} post-warmup XLA compiles (must be 0)")
    if p99 is None or p99 < 0 or p99 > p99_gate_ms:
        gate_violations.append(f"p99={p99}ms exceeds gate {p99_gate_ms:.0f}ms")
    print(json.dumps({
        "metric": "serving_p99_ms",
        "value": p99,
        "unit": (f"ms p99 under {n_clients} concurrent mixed clients "
                 f"({total/wall:.1f} req/s aggregate, p50={lat.get('p50')}ms, "
                 f"{recompiles} post-warmup XLA compiles, {len(errors)} client errors; "
                 f"GATE: p99<={p99_gate_ms:.0f}ms & 0 compiles -> "
                 f"{'PASS' if not gate_violations else 'FAIL'})"),
        "vs_baseline": 0,
    }), flush=True)
    if gate_violations:
        print(f"[bench] LOADTEST GATE FAILED: {'; '.join(gate_violations)}", file=sys.stderr)
        raise SystemExit(1)
    return None


BENCH_NORM_STATS = {
    "bridge_orig": {"action": {
        "q01": [-0.03, -0.05, -0.06, -0.13, -0.12, -0.43, 0.0],
        "q99": [0.03, 0.04, 0.06, 0.13, 0.12, 0.43, 1.0],
        "mask": [True, True, True, True, True, True, False],
    }}
}


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "data":
        # host-only: no TPU wait, no jax, no compile cache
        _data_bench()
        raise SystemExit(0)
    if len(sys.argv) > 1 and sys.argv[1] in ("serve7b", "train", "lora", "lora13b", "13b4", "7b4",
                                             "closedloop", "loadtest", "vlmtrain"):
        if not _wait_for_tpu(budget_s=float(os.environ.get("BRIDGELANG_TPU_WAIT_S", "1500"))):
            raise SystemExit(1)
        from bridgelang_tpu.util.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        if sys.argv[1] == "serve7b":
            line = _serve7b_bench(BENCH_NORM_STATS)
        elif sys.argv[1] == "closedloop":
            line = _closed_loop_bench(BENCH_NORM_STATS)
        elif sys.argv[1] == "loadtest":
            line = _load_test_bench(BENCH_NORM_STATS)
        elif sys.argv[1] == "train":
            line = _train_bench(BENCH_NORM_STATS)
        elif sys.argv[1] == "vlmtrain":
            line = _vlm_pretrain_bench(BENCH_NORM_STATS)
        elif sys.argv[1] == "13b4":
            line = _int4_serving_bench(BENCH_NORM_STATS, size="13b")
        elif sys.argv[1] == "7b4":
            line = _int4_serving_bench(BENCH_NORM_STATS, size="7b")
        elif sys.argv[1] == "lora13b":
            line = _lora_bench(BENCH_NORM_STATS,
                               batch=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                               remat=sys.argv[3] if len(sys.argv) > 3 else "full",
                               size="13b")
        else:
            line = _lora_bench(BENCH_NORM_STATS,
                               batch=int(sys.argv[2]) if len(sys.argv) > 2 else 16,
                               remat=sys.argv[3] if len(sys.argv) > 3 else "full")
        if line:
            print(json.dumps(line), flush=True)
    elif len(sys.argv) > 1 and sys.argv[1] != "all":
        # a typo ("serve7", "7b") must NOT silently start the multi-hour
        # orchestrated run on the shared single-TPU box
        raise SystemExit(f"unknown bench mode {sys.argv[1]!r}; one of: serve7b, data, train, "
                         "vlmtrain, lora, lora13b, 13b4, 7b4, closedloop, loadtest, all "
                         "(no argument = budgeted default sections)")
    else:
        main(run_all=len(sys.argv) > 1 and sys.argv[1] == "all")
