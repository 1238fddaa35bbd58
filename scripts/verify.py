"""Inference smoke + perf verification + golden-trajectory bit-parity kit.

Counterpart of reference vla-scripts/extern/verify_openvla.py:30-89 and
scripts/extern/verify_prismatic.py: load a checkpoint (or a random-init
flagship), run N predict_action calls on random frames, print per-call
latency and sanity-check output ranges.

  python scripts/verify.py [--checkpoint /ckpts/openvla-7b] [--calls 100]

## Golden-trajectory kit (real-checkpoint bit parity with zero new code)

A "golden" .npz bundles model inputs with expected outputs: either
(`frames` [N,H,W,3] u8 + `instructions` [N] str) or pre-tokenized
(`pixel_values` [N,C,H,W] f32 + `input_ids`/`attention_mask` [N,T] i32),
plus `expected_tokens` [N,A] i32, `expected_actions` [N,A] f32, and
`unnorm_key`. Replay asserts token BIT-equality and action closeness.
(The tiny-config cross-implementation proof lives in
tests/test_e2e_torch_parity.py: the independent torch stack writes a golden
and this replay passes it.)

First session with real openvla-7b weights — three commands:

  1. stage the HF checkpoint dir (config.json + *.safetensors +
     dataset_statistics.json) at /ckpts/openvla-7b
  2. record expected outputs — EITHER from the reference stack on its own
     hardware (tokens from `vla.predict_action` saved with the frames), OR
     from this framework for regression pinning:
       python scripts/verify.py --checkpoint /ckpts/openvla-7b \
           --golden_record /ckpts/golden-openvla7b.npz --calls 16
  3. replay for the parity verdict:
       python scripts/verify.py --checkpoint /ckpts/openvla-7b \
           --golden /ckpts/golden-openvla7b.npz
  4. (optional, CPU, slow) cross-check against the reference's OWN
     trust_remote_code modeling file executed here (extern/reference_twin):
       python scripts/verify.py --checkpoint /ckpts/openvla-7b \
           --reference_twin /path/to/prismatic/extern/hf --twin_calls 2
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class VerifyConfig:
    checkpoint: Optional[str] = None  # None -> random-init full flagship
    tokenizer_path: Optional[str] = None
    calls: int = 100
    quantize_int8: bool = True
    quantize_int4: bool = False  # w4a8 speed/capacity mode; overrides int8
    int4_group: int = 128  # scale-group rows: 128 quality default, 256/512 faster prefill (docs/int4.md)
    parallel_decode: bool = False
    golden: Optional[str] = None  # replay a golden .npz -> bit-parity verdict
    golden_record: Optional[str] = None  # record a golden .npz from this model
    golden_atol: float = 1e-5  # action tolerance on replay (tokens are exact)
    # Measure REAL speculative acceptance on a frame stream: per-tick accept
    # counts at the production margin gate, drafting server-side
    # (draft_from_history) like deploy.py's default mode. With --golden, the
    # bundle's frames play back in order (record them from consecutive robot
    # frames for the real-trajectory number bench.py's synthetic streams
    # approximate); otherwise a smooth synthetic camera drift.
    speculative_stream: bool = False
    margin_threshold: float = 0.25
    # Cross-check our predictions against the reference's OWN HF modeling
    # file (trust_remote_code twin), executed here via extern/timm_shim +
    # extern/reference_twin. Pass the directory holding the reference's
    # configuration_prismatic.py/modeling_prismatic.py. Requires
    # --checkpoint (an HF-format dir); runs BOTH sides on CPU in fp32 (the
    # twin is torch-CPU, and bf16-vs-fp32 would not be bit-comparable), so
    # on a real 7B budget minutes per call — use a small --twin_calls.
    reference_twin: Optional[str] = None
    twin_calls: int = 4


def _golden_predict(model, params, rec) -> tuple:
    """(tokens [N,A] i32, actions [N,A] f32) for one golden bundle's inputs."""
    import jax.numpy as jnp
    import numpy as np

    unnorm_key = str(rec["unnorm_key"]) if "unnorm_key" in rec else None
    stats = model.get_action_stats(unnorm_key)
    q01 = jnp.asarray(stats["q01"], jnp.float32)
    q99 = jnp.asarray(stats["q99"], jnp.float32)
    smask = jnp.asarray(stats.get("mask", [True] * len(stats["q01"])))
    action_dim = len(stats["q01"])

    if "pixel_values" in rec:
        ids = np.asarray(rec["input_ids"], np.int32)
        mask = np.asarray(rec["attention_mask"], np.int32)
        pixels = jnp.asarray(np.asarray(rec["pixel_values"], np.float32))
    else:
        from bridgelang_tpu.ops.image_ops import preprocess_batch

        instructions = [str(s) for s in rec["instructions"]]
        ids, mask = model.pad_prompt([model.prepare_prompt_ids(t) for t in instructions])
        pixels = preprocess_batch(jnp.asarray(rec["frames"]), model.image_transform, dtype=model.dtype)

    import jax

    tokens = np.asarray(jax.jit(model.generate_greedy, static_argnames=("max_new_tokens",))(
        params, jnp.asarray(ids), jnp.asarray(mask), pixels, max_new_tokens=action_dim))
    from bridgelang_tpu.vla.action_tokenizer import token_ids_to_actions, unnormalize_actions

    normalized = token_ids_to_actions(jnp.asarray(tokens), jnp.asarray(model.bin_centers),
                                      model.cfg.llm.vocab_size)
    actions = np.asarray(unnormalize_actions(normalized.astype(jnp.float32), q01, q99, smask))
    return tokens.astype(np.int32), actions


def _numerics_tag(model, params) -> str:
    """Serving-numerics fingerprint: decoder weight dtype + activation mode.
    Recorded into golden bundles so a replay under a different mode (e.g. a
    bundle recorded pre-w8a8 replayed on a w8a8 load) fails with an
    explanation instead of a bare token mismatch."""
    import jax

    leaves = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params["llm"])}
    kind = ("int4" if any(k.endswith("_scale4']") for k in leaves)
            else "int8" if any(k.endswith("_scale']") for k in leaves) else "bf16")
    return f"{kind}+w8a8" if getattr(model.cfg.llm, "w8a8", False) else kind


def replay_golden(model, params, golden_path, atol: float = 1e-5):
    """Replay a golden bundle; returns (n_pass, n_total, failure messages)."""
    import numpy as np

    rec = np.load(golden_path, allow_pickle=False)
    if "numerics" in rec:
        recorded, live = str(rec["numerics"]), _numerics_tag(model, params)
        if recorded != live:
            print(f"[verify] WARNING: golden bundle was recorded under numerics "
                  f"{recorded!r} but this model runs {live!r} — token mismatches "
                  f"below are expected; re-record or match --quantize_* flags "
                  f"(load_vla defaults quantized serving loads to w8a8)")
    tokens, actions = _golden_predict(model, params, rec)
    exp_tokens = np.asarray(rec["expected_tokens"], np.int32)
    exp_actions = np.asarray(rec["expected_actions"], np.float32)

    failures = []
    for i in range(tokens.shape[0]):
        if not np.array_equal(tokens[i], exp_tokens[i]):
            failures.append(f"record {i}: tokens {tokens[i].tolist()} != expected {exp_tokens[i].tolist()}")
        elif not np.allclose(actions[i], exp_actions[i], atol=atol):
            failures.append(
                f"record {i}: max action delta "
                f"{np.max(np.abs(actions[i] - exp_actions[i])):.2e} > atol={atol}")
    return tokens.shape[0] - len(failures), tokens.shape[0], failures


def record_golden(model, params, out_path, calls: int, unnorm_key: Optional[str], seed: int = 0):
    """Record a golden bundle from THIS model on deterministic random frames
    + canned instructions (regression pinning; for cross-implementation proof
    record expected outputs with the reference stack instead)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    size = model.image_transform.towers[0].size if hasattr(model.image_transform, "towers") else 224
    frames = rng.integers(0, 255, size=(calls, size, size, 3), dtype=np.uint8)
    instructions = np.asarray([f"pick up the object {i}" for i in range(calls)])
    key = unnorm_key or next(iter(model.norm_stats))
    rec = {"frames": frames, "instructions": instructions, "unnorm_key": np.asarray(key)}
    tokens, actions = _golden_predict(model, params, rec)
    np.savez(out_path, **rec, expected_tokens=tokens, expected_actions=actions,
             numerics=np.asarray(_numerics_tag(model, params)))
    return out_path


def speculative_stream(model, params, frames, instruction: str, unnorm_key: Optional[str],
                       margin_threshold: float = 0.25):
    """Run a control-loop tick sequence with server-style drafting and return
    (accept_counts [N], latencies_s [N]) — the measured counterpart of
    bench.py's synthetic-stream acceptance model. accept counts come from the
    on-device gate itself (generate_speculative return_accept_count)."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.serving.server import draft_from_history

    stats = model.get_action_stats(unnorm_key)
    q01 = jnp.asarray(stats["q01"], jnp.float32)
    q99 = jnp.asarray(stats["q99"], jnp.float32)
    smask = jnp.asarray(stats.get("mask", [True] * len(stats["q01"])))
    action_dim = len(stats["q01"])
    ids, mask = model.pad_prompt([model.prepare_prompt_ids(instruction)])
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    fn = model._jitted_predict_frames_speculative(margin_threshold=margin_threshold,
                                                  return_accept_count=True)
    vocab = model.cfg.llm.vocab_size
    prev2 = prev1 = None
    accepts, lat = [], []
    for i, frame in enumerate(frames):
        draft = (np.zeros(action_dim, np.int32) if prev1 is None
                 else draft_from_history(prev2, prev1, vocab,
                                         n_bins=getattr(model, "n_action_bins", 256)))
        t0 = time.perf_counter()
        acts, toks, acc = fn(params, ids_d, mask_d, jnp.asarray(np.asarray(frame)[None]),
                             q01, q99, smask, jnp.asarray(draft[None]))
        np.asarray(acts)  # host sync = control-loop timing
        dt = time.perf_counter() - t0
        prev2, prev1 = prev1, np.asarray(toks)[0].astype(np.int32)
        if i > 0:  # tick 0 is compile/warm + cold draft
            accepts.append(int(np.asarray(acc)[0]))
            lat.append(dt)
    return np.asarray(accepts), np.asarray(lat)


def _build_model(cfg: VerifyConfig):
    import jax
    import jax.numpy as jnp

    if cfg.checkpoint:
        from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
        from bridgelang_tpu.models.load import load_vla

        model, params = load_vla(cfg.checkpoint,
                                 quantize_int8=cfg.quantize_int8 and not cfg.quantize_int4,
                                 quantize_int4=cfg.quantize_int4,
                                 int4_group=cfg.int4_group)
        model.tokenizer = get_tokenizer(cfg.tokenizer_path)
        return model, params
    print("[verify] no checkpoint; random-init DEPTH-TRIMMED flagship "
          "(8/32 decoder layers — smoke timing only; bench.py measures the full model)")
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", Path(__file__).parent.parent / "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    model = graft._flagship_model(llm_layers=8, vit_depth=8)
    if cfg.quantize_int8 or cfg.quantize_int4:
        # Honor the quant flags on the random-init path too, mirroring
        # load_vla's serving posture (int4/int8 decoder + w8a8 activations) —
        # otherwise a --quantize_int4 smoke silently times the bf16 model.
        import dataclasses

        model.cfg = dataclasses.replace(model.cfg, llm=dataclasses.replace(model.cfg.llm, w8a8=True))
    params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)
    if cfg.quantize_int4:
        from bridgelang_tpu.ops.quant import quantize_llm_int4

        params["llm"] = quantize_llm_int4(params["llm"], group=cfg.int4_group)
    elif cfg.quantize_int8:
        from bridgelang_tpu.ops.quant import quantize_llm_int8

        params["llm"] = quantize_llm_int8(params["llm"])
    return model, params


def _reference_twin_check(cfg: VerifyConfig) -> None:
    """Execute the reference's own modeling_prismatic.py on `--checkpoint`
    and assert greedy action-token equality against our path, per-frame.
    Both sides run CPU fp32 (tiny-geometry version of this proof:
    tests/test_reference_twin_execution.py; this entry point is the
    real-weights version for the first session with a staged checkpoint)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.extern.reference_twin import load_twin, twin_greedy_actions
    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.models.load import load_vla
    from bridgelang_tpu.ops.image_ops import preprocess_batch

    if not cfg.checkpoint:
        raise SystemExit("--reference_twin requires --checkpoint (an HF-format export dir)")
    model, params = load_vla(cfg.checkpoint, dtype=jnp.float32)
    model.tokenizer = get_tokenizer(cfg.tokenizer_path)
    twin, result = load_twin(cfg.checkpoint, cfg.reference_twin, strict=False)
    # Only the documented dead-weight tensors may be missing (our DEFAULT
    # exports omit tower-final norms / SigLIP attn_pool — hf_export.py
    # docstring; real published checkpoints carry them, so for those the
    # set must be empty). Anything else missing means a partially staged
    # checkpoint (e.g. an interrupted shard copy) — running the twin on
    # random-init layers would report a confusing parity FAIL instead.
    DEAD_WEIGHT = {"vision_backbone.featurizer.norm.weight",
                   "vision_backbone.featurizer.norm.bias",
                   "vision_backbone.fused_featurizer.norm.weight",
                   "vision_backbone.fused_featurizer.norm.bias"}
    bad_missing = [k for k in result.missing_keys
                   if k not in DEAD_WEIGHT and "attn_pool" not in k]
    print(f"[verify] twin loaded: {len(result.missing_keys)} missing "
          f"({len(bad_missing)} outside the documented dead-weight set), "
          f"{len(result.unexpected_keys)} unexpected")
    if result.unexpected_keys:
        raise SystemExit(f"twin load saw unexpected keys: {result.unexpected_keys[:8]}")
    if bad_missing:
        raise SystemExit(f"checkpoint is missing non-dead-weight tensors (partial copy?): "
                         f"{bad_missing[:8]}")

    unnorm_key = "bridge_orig" if "bridge_orig" in model.norm_stats else None
    action_dim = len(model.get_action_stats(unnorm_key)["q01"])
    rng = np.random.default_rng(0)
    n_fail = 0
    for i in range(cfg.twin_calls):
        frame = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        ids = model.prepare_prompt_ids("pick up the object")[None].astype(np.int32)
        mask = np.ones_like(ids)
        pixels = np.asarray(preprocess_batch(frame[None], model.image_transform,
                                             dtype=jnp.float32))
        t0 = time.time()
        twin_toks, _ = twin_greedy_actions(twin, ids, pixels, n_tokens=action_dim,
                                           unnorm_key=unnorm_key)
        t1 = time.time()
        our_toks = np.asarray(model.generate_greedy(
            params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
            max_new_tokens=action_dim, cache_dtype=jnp.float32))[0]
        ok = bool(np.array_equal(our_toks, twin_toks))
        n_fail += not ok
        print(f"[verify] twin call {i}: {'MATCH' if ok else 'MISMATCH'} "
              f"ours={our_toks.tolist()} twin={twin_toks.tolist()} "
              f"(twin {t1-t0:.1f}s, ours {time.time()-t1:.1f}s)")
    verdict = "PASS" if n_fail == 0 else "FAIL"
    print(f"[verify] reference-twin parity: {cfg.twin_calls - n_fail}/{cfg.twin_calls} {verdict}")
    if n_fail:
        raise SystemExit(1)


def main(cfg: VerifyConfig) -> None:
    if cfg.reference_twin:
        _reference_twin_check(cfg)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.ops.image_ops import preprocess_batch

    model, params = _build_model(cfg)

    if cfg.golden_record:
        path = record_golden(model, params, cfg.golden_record, cfg.calls, unnorm_key=None)
        print(f"[verify] recorded golden bundle ({cfg.calls} records) -> {path}")
        return
    if cfg.speculative_stream:
        if cfg.golden:
            rec = np.load(cfg.golden, allow_pickle=False)
            frames = np.asarray(rec["frames"])
            instruction = str(rec["instructions"][0])
            unnorm_key = str(rec["unnorm_key"]) if "unnorm_key" in rec else None
        else:
            rng = np.random.default_rng(0)
            base = rng.integers(0, 255, size=(224, 224, 3), dtype=np.int16)
            frames = []
            for _ in range(max(cfg.calls, 8)):
                base = np.clip(base + rng.integers(-3, 4, size=base.shape), 0, 255)
                frames.append(base.astype(np.uint8))
            instruction, unnorm_key = "pick up the object", None
        accepts, lat = speculative_stream(model, params, frames, instruction, unnorm_key,
                                          margin_threshold=cfg.margin_threshold)
        p50 = float(np.percentile(lat, 50))
        adim = len(model.get_action_stats(unnorm_key)["q01"])
        print(f"[verify] speculative stream ({len(accepts)} ticks, margin={cfg.margin_threshold}): "
              f"mean accepted {accepts.mean():.2f}/{adim} "
              f"hist(k=1..{adim})={np.bincount(accepts, minlength=adim + 1)[1:].tolist()} "
              f"p50={p50*1e3:.1f}ms -> {1.0/p50:.2f} actions/s effective")
        return
    if cfg.golden:
        n_pass, n_total, failures = replay_golden(model, params, cfg.golden, atol=cfg.golden_atol)
        for f in failures[:20]:
            print(f"[verify] FAIL {f}")
        print(f"[verify] golden replay: {n_pass}/{n_total} records bit-exact "
              f"({'PASS' if n_pass == n_total else 'FAIL'})")
        if n_pass != n_total:
            raise SystemExit(1)
        return

    stats = model.get_action_stats("bridge_orig" if "bridge_orig" in model.norm_stats else None)
    q01 = jnp.asarray(stats["q01"], dtype=jnp.float32)
    q99 = jnp.asarray(stats["q99"], dtype=jnp.float32)
    smask = jnp.asarray(stats.get("mask", [True] * len(stats["q01"])))
    action_dim = len(stats["q01"])

    rng = np.random.default_rng(0)
    ids = np.full((1, model.prompt_bucket), model.cfg.llm.pad_token_id, np.int32)
    mask = np.zeros_like(ids)
    ids[0, 0], ids[0, 1:20] = 1, rng.integers(3, 31000, 19)
    ids[0, 20] = 29871
    mask[0, :21] = 1

    pre = jax.jit(lambda f: preprocess_batch(f, model.image_transform, dtype=model.dtype))
    predict = model._jitted_predict(action_dim, parallel_decode=cfg.parallel_decode)

    lat = []
    for i in range(cfg.calls):
        frame = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        t0 = time.time()
        pix = pre(jnp.asarray(frame[None]))
        action = np.asarray(predict(params, jnp.asarray(ids), jnp.asarray(mask), pix, q01, q99, smask))
        dt = time.time() - t0
        lat.append(dt)
        if i < 3 or i % 20 == 0:
            print(f"[call {i:03d}] {dt*1e3:7.1f} ms  action={np.round(action[0], 4)}")
        assert action.shape == (1, action_dim)
        assert np.isfinite(action).all()
    lat = np.asarray(lat[3:])  # drop warmup
    print(f"\n[verify] {cfg.calls} calls: p50={np.percentile(lat,50)*1e3:.1f}ms "
          f"p90={np.percentile(lat,90)*1e3:.1f}ms -> {1.0/np.percentile(lat,50):.2f} actions/s")


if __name__ == "__main__":
    main(parse_cli(VerifyConfig))
