"""VLA pretraining / full fine-tuning entry point.

Counterpart of reference vla-scripts/train.py:106-259, rebuilt for SPMD:
one process per host, a jax.sharding.Mesh instead of torchrun ranks, the
whole optimization step jitted (see bridgelang_tpu.training.trainer), Orbax
checkpoints with optimizer state, per-dataset metrics on device.

Usage:
  python scripts/train.py --vla.type prism-dinosiglip-224px+mx-bridge \
      --data_root_dir /data/oxe --run_root_dir runs [--pretrained_checkpoint ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import VLAConfig, config_to_dict, parse_cli, save_config
from bridgelang_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass
class TrainConfig:
    vla: VLAConfig = field(default_factory=lambda: VLAConfig.get("prism-dinosiglip-224px+mx-oxe-magic-soup-plus"))
    data_root_dir: str = "data/oxe"
    run_root_dir: str = "runs"
    run_id: Optional[str] = None
    pretrained_checkpoint: Optional[str] = None
    tokenizer_path: Optional[str] = None  # HF tokenizer dir (Llama-2)
    is_resume: bool = True
    resume_step: Optional[int] = None
    resume_epoch: Optional[int] = None
    trackers: str = "jsonl"  # comma-separated: jsonl,wandb
    seed: int = 7
    max_steps_override: Optional[int] = None
    profile_dir: Optional[str] = None  # write a jax.profiler trace of steps 10-12
    log_interval: int = 10  # device->host metric sync only every N steps
    # Decoder-layer activation checkpointing: "dots" saves matmul outputs and
    # recomputes only elementwise/norm work in the backward — measured 5.9%
    # faster than full recompute on v5e at ~2x activation memory; "full"
    # (recompute everything, the reference fsdp.py:170-183 behavior) is the
    # fallback when activations don't fit.
    remat_policy: str = "dots"
    # Decoder attention override: e.g. "ring" (context-parallel attention over
    # the fsdp axis, for long-horizon variants) or "xla"; None = backend default.
    attention_impl: Optional[str] = None


def main(cfg: TrainConfig) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.conf.models import ModelConfig
    from bridgelang_tpu.parallel.mesh import initialize_distributed, make_mesh
    from bridgelang_tpu.parallel.sharding import batch_sharding, param_shardings
    from bridgelang_tpu.training.checkpointing import CheckpointManager, save_sidecars, validate_resume
    from bridgelang_tpu.training.metrics import VLAMetrics, build_trackers
    from bridgelang_tpu.training.trainer import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_vla_train_step,
    )
    from bridgelang_tpu.util import set_global_seed
    from bridgelang_tpu.vla.materialize import get_vla_dataset_and_collator

    initialize_distributed()
    set_global_seed(cfg.seed)
    vla = cfg.vla

    n_devices = jax.device_count()
    if n_devices != vla.expected_device_count:
        overwatch.warning(
            "Running %r on %d devices (config expects %d) — batch per device adjusts",
            vla.vla_id, n_devices, vla.expected_device_count,
        )

    run_id = cfg.run_id or f"{vla.vla_id}+n{jax.process_count()}+b{vla.per_device_batch_size}+x{cfg.seed}"
    run_dir = Path(cfg.run_root_dir) / run_id
    overwatch.info("Starting run %s on %d devices", run_id, n_devices)

    # --- model ---
    base = ModelConfig.get(vla.base_vlm) if vla.base_vlm in ModelConfig.available() else None
    vlm_cfg = VLMConfig.from_ids(
        model_id=vla.base_vlm,
        vision_backbone_id=base.vision_backbone_id if base else "dinosiglip-vit-so-224px",
        llm_backbone_id=base.llm_backbone_id if base else "llama2-7b-pure",
        arch_specifier=base.arch_specifier if base else "no-align+fused-gelu-mlp",
        image_resize_strategy=base.image_resize_strategy if base else "resize-naive",
    )
    if cfg.attention_impl:
        import dataclasses as _dc

        vlm_cfg = _dc.replace(vlm_cfg, attention_impl=cfg.attention_impl)
    model = PrismaticVLM(vlm_cfg, dtype=jnp.bfloat16)

    # --- tokenizer ---
    tokenizer = _load_tokenizer(cfg.tokenizer_path)

    # --- data (per-host pipeline) ---
    global_batch = vla.global_batch_size
    per_host_batch = global_batch // jax.process_count()
    dataset, action_tokenizer, collator = get_vla_dataset_and_collator(
        cfg.data_root_dir,
        vla.data_mix,
        base_tokenizer=tokenizer,
        llm_family=vlm_cfg.llm_family,
        batch_size=per_host_batch,
        shuffle_buffer_size=vla.shuffle_buffer_size // jax.process_count(),
        image_aug=vla.image_aug,
        pad_token_id=vlm_cfg.llm.pad_token_id,
    )

    if overwatch.is_rank_zero():
        save_sidecars(run_dir, config_to_dict(cfg), dataset.dataset_statistics)
        save_config(cfg, run_dir / "config.json")

    # --- stage / freezing (reference train.py:160-180) ---
    if vla.freeze_vision_backbone and vla.freeze_llm_backbone:
        stage = "vla-last-layer-train" if vla.unfreeze_last_llm_layer else "align"
    elif vla.freeze_vision_backbone:
        stage = "vla-train"
    elif vla.freeze_llm_backbone:
        stage = "vla-sandwich-train" if vla.unfreeze_last_llm_layer else "vla-train"
    else:
        stage = "vla-full-train"
    overwatch.info("Training stage: %s", stage)

    # --- params + sharding ---
    mesh = make_mesh(vla.mesh_shape)
    params = model.init_params(jax.random.key(cfg.seed), param_dtype=jnp.float32)
    params = jax.device_put(params, param_shardings(mesh, params))
    trainable = model.trainable_mask(params, stage)

    total_steps = cfg.max_steps_override or vla.max_steps or 200_000
    ocfg = OptimConfig(
        learning_rate=vla.learning_rate,
        weight_decay=vla.weight_decay,
        max_grad_norm=vla.max_grad_norm,
        lr_scheduler_type=vla.lr_scheduler_type,
        warmup_ratio=vla.warmup_ratio,
        total_steps=total_steps,
    )
    optimizer = make_optimizer(ocfg, params, trainable_mask=trainable)
    from bridgelang_tpu.parallel.sharding import with_ambient_mesh

    # The ambient mesh lets the model's seam activation constraints bind
    # (vision->projector->LLM; see parallel.sharding.constrain_batch).
    # donate_argnums=0: reuse the old TrainState's buffers for the new one —
    # otherwise the step transiently holds params+opt_state twice. Safe: every
    # caller rebinds `state, m = step_fn(state, batch)` and checkpoint saves
    # are synchronous (CheckpointManager.save -> wait_until_finished).
    step_fn = with_ambient_mesh(mesh, jax.jit(
        make_vla_train_step(model, optimizer, trainable_mask=trainable,
                            image_transform=model.image_transform, remat_policy=cfg.remat_policy),
        donate_argnums=0,
    ))
    state = init_train_state(params, optimizer, trainable_mask=trainable)

    ckpt = CheckpointManager(run_dir)
    start_step = 0
    if cfg.pretrained_checkpoint is not None:
        if cfg.is_resume and cfg.resume_step is not None:
            validate_resume(cfg.pretrained_checkpoint, cfg.resume_step, cfg.resume_epoch or 0)
            start_step = cfg.resume_step
        state = ckpt.restore(cfg.pretrained_checkpoint, state)
        overwatch.info("Restored checkpoint %s", cfg.pretrained_checkpoint)

    metrics = VLAMetrics(
        build_trackers(cfg.trackers.split(","), run_id, run_dir, config_to_dict(cfg)),
        run_id,
        is_rank_zero=overwatch.is_rank_zero(),
        resume_step=start_step,
    )

    # --- train loop (reference base_strategy.py:245-389; no grad accumulation
    # in the VLA loop by contract) ---
    sharding = batch_sharding(mesh)
    step = start_step
    t_last = time.time()
    try:
        step = _train_loop(cfg, vla, ocfg, dataset, step_fn, state, metrics, ckpt, mesh, sharding,
                           step, total_steps, t_last)
    except (KeyboardInterrupt, Exception) as e:  # noqa: BLE001
        # Failure containment the reference lacks (SURVEY.md §5: any rank
        # failure kills the job with nothing saved): emergency checkpoint.
        if _LAST_STATE[0] is not None:
            overwatch.error("Training interrupted at step %d (%s); saving emergency checkpoint", step, e)
            ckpt.save(_LAST_STATE[0], step=step, epoch=0, loss=0.0)
        raise
    if _LAST_STATE[0] is not None:
        ckpt.save(_LAST_STATE[0], step=step, epoch=0, loss=float(_LAST_LOSS[0]))
    metrics.finalize()
    overwatch.info("Training complete at step %d", step)


_LAST_STATE = [None]
_LAST_LOSS = [float("nan")]


def _train_loop(cfg, vla, ocfg, dataset, step_fn, state, metrics, ckpt, mesh, sharding,
                step, total_steps, t_last):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.training.trainer import make_lr_schedule

    lr_schedule = make_lr_schedule(ocfg)
    _LAST_STATE[0] = state
    # Per-step metrics stay ON DEVICE; device->host sync happens only at flush
    # (the reference syncs every step via .cpu().numpy(), base_strategy.py:323-329
    # — a pattern this framework's docstrings criticize, so don't repeat it).
    pending = []  # [(global_step, device_metric_pytree, dataset_names)]

    def flush():
        for s, dm, names in jax.device_get(pending):
            metrics.commit(
                global_step=s,
                loss=float(dm["loss"]),
                action_accuracy=float(dm["action_accuracy"]),
                l1_loss=float(dm["l1_loss"]),
                grad_norm=float(dm["grad_norm"]),
                lr=float(lr_schedule(s)),  # the SCHEDULED value, not the peak
            )
            ex_acc = np.asarray(dm["per_example_accuracy"])
            ex_l1 = np.asarray(dm["per_example_l1"])
            for name in set(names):
                idx = [i for i, n in enumerate(names) if n == name]
                metrics.commit_for_dataset(
                    name,
                    action_accuracy=float(ex_acc[idx].mean()),
                    l1_loss=float(ex_l1[idx].mean()),
                )
        pending.clear()

    m = None
    for batch in dataset:
        if step >= total_steps:
            break
        dataset_names = batch.pop("dataset_names")
        host_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if jax.process_count() > 1:
            from bridgelang_tpu.parallel.sharding import make_array_from_process_local

            device_batch = make_array_from_process_local(mesh, host_batch)
        else:
            device_batch = jax.device_put(host_batch, sharding)
        if cfg.profile_dir and step == 9:
            from bridgelang_tpu.util.profiling import trace as _profiler_trace

            _prof_cm = _profiler_trace(cfg.profile_dir)
            _prof_cm.__enter__()
        state, m = step_fn(state, device_batch)
        _LAST_STATE[0] = state
        _LAST_LOSS[0] = m["loss"]  # device array; converted lazily at save time
        step += 1
        if cfg.profile_dir and step == 12:
            jax.block_until_ready(m["loss"])
            _prof_cm.__exit__(None, None, None)
            overwatch.info("Wrote profiler trace to %s", cfg.profile_dir)

        pending.append((step, m, dataset_names))
        if step % cfg.log_interval == 0:
            flush()
            overwatch.info(metrics.push())

        if step % vla.save_interval == 0:
            # NOTE: every process participates — Orbax coordinates the
            # sharded write (rank-0-only gating would deadlock a pod).
            flush()
            ckpt.save(state, step=step, epoch=0, loss=float(m["loss"]))
            overwatch.info("Saved checkpoint at step %d (%.1fs)", step, time.time() - t_last)
            t_last = time.time()
    flush()
    return step


def _load_tokenizer(tokenizer_path: Optional[str]):
    if tokenizer_path:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(tokenizer_path)
    overwatch.warning("No --tokenizer_path; using the byte-fallback stand-in tokenizer (dev only)")
    from bridgelang_tpu.models.llm.tokenizer import ByteFallbackTokenizer

    return ByteFallbackTokenizer()


if __name__ == "__main__":
    main(parse_cli(TrainConfig))
