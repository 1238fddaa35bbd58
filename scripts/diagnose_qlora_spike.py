"""Diagnose the round-3 13B QLoRA fixed-batch loss spike (VERDICT r03 item 3).

BENCH_r03's 13B QLoRA trajectory (b8, constant 5e-4, bf16 grads) was
10.78 -> 8.22 -> 6.95 -> 6.29 -> 9.39 -> 6.62 -> 6.10 — a +3.1 jump at step
5 — while the 7B int8-base run (b16) was monotone. Candidate causes named by
the judge: adapter-grad clipping, int4 STE forward/backward numerics
(ops/int4_matmul.py custom VJP), or LR.

This script separates them on a tiny model (CPU, minutes): the SAME LoRA
fixed-batch loop over three bases that differ ONLY in quantization path —
  int4   packed base through matmul_int4 + its custom VJP (the suspect),
  int8   per-channel int8 base (the monotone 7B reference point),
  bf16   the int4 base DEQUANTIZED to bf16 (identical loss landscape to
         int4, but standard XLA dots + autodiff — isolates the kernel/STE
         from the optimizer dynamics)
— across seeds and batch sizes, then an LR sweep on the int4 base.

Recorded tiny-scale result (2026-08-19, full table in docs/qlora_spike.md):
NO spikes reproduce at this scale in ANY base — and the int4 trajectories
match the bf16-dequant twin to ~0.01 nats per step across every seed, i.e.
the packed kernel + custom VJP trace the same optimization path as plain
bf16 autodiff over the identical landscape. That exonerates the int4
numerics but cannot adjudicate the b8-vs-noise question at 13B, so the
complement is the on-chip seed sweep of the REAL 13B QLoRA bench
(BENCH_LORA_SEED/BENCH_LORA_STEPS env knobs on `bench.py lora13b 8`),
recorded in the same doc. The custom VJP is separately pinned exact by
tests/test_training_components.py::test_int4_matmul_custom_vjp_matches_dequant_grad.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    # CPU on purpose: a tiny-model dynamics study must not queue behind (or
    # hold) the relay-tunneled TPU; sitecustomize preloads the axon platform,
    # so env vars are too late — flip the backend here (CLAUDE.md gotcha).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.llm.llama import LLMConfig
    from bridgelang_tpu.models.projector import init_projector_params
    from bridgelang_tpu.models.vision.vit import ViT, ViTConfig
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.quant import (
        dequantize_llm_int4,
        init_llm_params_int4,
        init_llm_params_int8,
    )
    from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask
    from bridgelang_tpu.training.trainer import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_vla_train_step,
    )

    tiny_vit = ViTConfig(image_size=32, patch_size=8, width=32, depth=4, num_heads=4,
                         mlp_dim=64, use_cls_token=True)
    tiny_llm = LLMConfig(vocab_size=512, padded_vocab_size=576, dim=128, n_layers=4,
                         n_heads=4, n_kv_heads=2, intermediate_size=256,
                         max_seq_len=256, pad_token_id=512)

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(tiny_vit, dtype=dtype), tiny_vit.width, tiny_vit.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=tiny_llm)
        norm_stats = {"bridge_orig": {"action": {
            "q01": [-0.1] * 6 + [0.0], "q99": [0.1] * 6 + [1.0],
            "mask": [True] * 6 + [False]}}}
        model = OpenVLA(cfg, norm_stats, dtype=jnp.bfloat16)
    finally:
        vlm_mod.build_vision_backbone = orig

    def make_llm_base(kind, key):
        if kind == "int8":
            return init_llm_params_int8(key, tiny_llm)
        base4 = init_llm_params_int4(key, tiny_llm)
        if kind == "int4":
            return base4
        assert kind == "bf16(deq-int4)"
        return dequantize_llm_int4(base4, dtype=jnp.bfloat16)

    def run(kind, seed, batch_size, lr, steps=14):
        k_vis, k_proj, k_llm, k_lora, k_data = jax.random.split(jax.random.key(seed), 5)
        dummy = jnp.zeros((1, 6, 32, 32), dtype=jnp.bfloat16)
        vision = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                              model.vision_module.init(k_vis, dummy)["params"])
        projector = init_projector_params(k_proj, cfg.arch_specifier, model.vision_dim,
                                          tiny_llm.dim, dtype=jnp.bfloat16)
        llm = add_lora_params(k_lora, make_llm_base(kind, k_llm), rank=32)
        params = {"vision": vision, "projector": projector, "llm": llm}
        trainable = lora_trainable_mask(params)
        optimizer = make_optimizer(OptimConfig(learning_rate=lr, lr_scheduler_type="constant",
                                               total_steps=1000), params, trainable_mask=trainable)
        # EXACTLY the bench recipe: bf16 grads, full remat, donated state
        step_fn = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=trainable,
                                              grad_dtype=jnp.bfloat16, remat_policy="full"),
                          donate_argnums=0)
        rng = np.random.default_rng(seed)
        t = 48
        ids = np.full((batch_size, t), tiny_llm.pad_token_id, np.int32)
        mask = np.zeros((batch_size, t), np.int32)
        ids[:, 0] = 1
        ids[:, 1:26] = rng.integers(3, 500, size=(batch_size, 25))
        ids[:, 26:34] = rng.integers(256, 512, size=(batch_size, 8))
        mask[:, :34] = 1
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
            "labels": jnp.asarray(np.where(mask == 1, ids, -100)),
            "pixel_values": jnp.asarray(rng.normal(size=(batch_size, 6, 32, 32)), dtype=jnp.bfloat16),
        }
        state = init_train_state(params, optimizer, trainable_mask=trainable)
        losses = []
        for _ in range(steps):
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
        return np.array(losses)

    def spike_stats(losses):
        jumps = np.diff(losses)
        return float(jumps.max()), int((jumps > 0.25).sum())

    header = f"{'base':>16} {'b':>3} {'lr':>7} {'seed':>4}  max_jump  n_up  trajectory"
    print(header)
    print("-" * len(header))
    summary = {}
    for kind in ("int4", "int8", "bf16(deq-int4)"):
        for seed in range(4):
            losses = run(kind, seed, batch_size=8, lr=5e-4)
            mj, nu = spike_stats(losses)
            summary.setdefault((kind, 8, 5e-4), []).append(mj)
            print(f"{kind:>16} {8:>3} {5e-4:>7} {seed:>4}  {mj:+8.3f}  {nu:>4}  "
                  + " ".join(f"{l:.2f}" for l in losses))
    # LR sweep on the int4 base: if spikes are Adam overshoot, lowering LR
    # removes them with the kernel/STE unchanged.
    for lr in (1e-4,):
        for seed in range(4):
            losses = run("int4", seed, batch_size=8, lr=lr)
            mj, nu = spike_stats(losses)
            summary.setdefault(("int4", 8, lr), []).append(mj)
            print(f"{'int4':>16} {8:>3} {lr:>7} {seed:>4}  {mj:+8.3f}  {nu:>4}  "
                  + " ".join(f"{l:.2f}" for l in losses))
    # b16 (the monotone 7B bench config) on the int4 base
    for seed in range(2):
        losses = run("int4", seed, batch_size=16, lr=5e-4)
        mj, nu = spike_stats(losses)
        summary.setdefault(("int4", 16, 5e-4), []).append(mj)
        print(f"{'int4':>16} {16:>3} {5e-4:>7} {seed:>4}  {mj:+8.3f}  {nu:>4}  "
              + " ".join(f"{l:.2f}" for l in losses))

    print()
    for (kind, b, lr), mjs in summary.items():
        print(f"[summary] {kind:>16} b{b:<3} lr{lr:<8} max_jump mean={np.mean(mjs):+.3f} "
              f"worst={np.max(mjs):+.3f} over {len(mjs)} seeds")
    int4_spikes = np.mean(summary[("int4", 8, 5e-4)])
    bf16_spikes = np.mean(summary[("bf16(deq-int4)", 8, 5e-4)])
    print()
    if int4_spikes > bf16_spikes + 0.5:
        print("[verdict] int4 path spikes HARDER than its bf16-dequant twin -> "
              "suspect the kernel/STE; investigate further.")
    else:
        print("[verdict] spike magnitude matches the bf16-dequant twin (same loss "
              "landscape, no kernel/STE in the loop) -> optimizer dynamics "
              "(Adam overshoot at constant 5e-4 on a fixed batch), not an int4 defect.")


if __name__ == "__main__":
    main()
