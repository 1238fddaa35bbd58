"""LoRA / full fine-tuning of a pretrained OpenVLA checkpoint.

Counterpart of reference vla-scripts/finetune.py:113-369 (PEFT r=32
"all-linear" LoRA through the HF twin + DDP). Here: adapters are extra pytree
leaves trained under the same jitted SPMD step; merge-and-unload happens at
save; the reference's 8-bit/4-bit base quantization maps to int8 weight-only
or packed int4 (bridgelang_tpu.ops.quant + ops/int4_matmul.py — the int4
base is how 13B LoRA fits one 16 GB chip).

Usage:
  python scripts/finetune.py --vla_path /ckpts/openvla-7b \
      --dataset_name libero_spatial_no_noops --data_root_dir /data/rlds \
      [--use_lora true] [--lora_rank 32] [--use_quantization true] \
      [--quantization_bits 4]
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli, config_to_dict
from bridgelang_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass
class FinetuneConfig:
    vla_path: str = "openvla-7b"
    data_root_dir: str = "data/rlds"
    dataset_name: str = "libero_spatial_no_noops"
    run_root_dir: str = "runs"
    tokenizer_path: Optional[str] = None

    batch_size: int = 16
    remat_policy: str = "dots"  # "dots" (faster) | "full" (min memory)
    max_steps: int = 200_000
    save_steps: int = 5000
    learning_rate: float = 5e-4
    grad_accumulation_steps: int = 1
    image_aug: bool = True
    shuffle_buffer_size: int = 100_000
    seed: int = 7

    # OFT-style parallel-decode fine-tuning: supervise every action dim from a
    # prefix-only query row (no teacher forcing between dims). The resulting
    # model serves with `deploy.py --parallel_decode` — one forward for all 7
    # action tokens (measured 18.7 a/s vs 8.8 sequential on the 7B).
    parallel_decode: bool = False
    # Action chunking: supervise the current + next (action_chunk-1) future
    # actions as one span (dataset future_action_window_size). Serve the whole
    # chunk in one forward via OpenVLA.predict_action_chunk — with
    # parallel_decode, effective actions/s multiply by the horizon.
    action_chunk: int = 1

    use_lora: bool = True
    lora_rank: int = 32
    lora_dropout: float = 0.0
    use_quantization: bool = False  # quantized frozen base (QLoRA analogue)
    # 8 = int8 weight-only; 4 = packed int4 (halves base HBM again — the
    # route to 13B LoRA on one 16 GB chip; reference finetune.py:142-148
    # uses bitsandbytes NF4 for the same purpose)
    quantization_bits: int = 8
    export_hf: bool = True  # also write HF-format checkpoints (reference finetune.py saves HF ckpts)
    mesh_shape: Optional[str] = None
    trackers: str = "jsonl"


def main(cfg: FinetuneConfig) -> None:
    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.models.load import load_vla
    from bridgelang_tpu.parallel.mesh import initialize_distributed, make_mesh
    from bridgelang_tpu.parallel.sharding import batch_sharding, param_shardings
    from bridgelang_tpu.training.checkpointing import CheckpointManager, save_sidecars
    from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask, merge_lora, split_lora
    from bridgelang_tpu.training.metrics import VLAMetrics, build_trackers
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer, make_vla_train_step
    from bridgelang_tpu.util import set_global_seed
    from bridgelang_tpu.vla.materialize import get_vla_dataset_and_collator
    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer

    initialize_distributed()
    set_global_seed(cfg.seed)

    exp_id = (
        f"{Path(cfg.vla_path).name}+{cfg.dataset_name}+b{cfg.batch_size}+lr-{cfg.learning_rate}"
        + (f"+lora-r{cfg.lora_rank}" if cfg.use_lora else "")
        + (f"+q-int{cfg.quantization_bits}" if cfg.use_quantization else "")
    )
    run_dir = Path(cfg.run_root_dir) / exp_id

    if cfg.use_quantization and cfg.quantization_bits not in (4, 8):
        raise ValueError(f"quantization_bits must be 4 or 8, got {cfg.quantization_bits}")
    model, params = load_vla(
        cfg.vla_path,
        quantize_int8=cfg.use_quantization and cfg.quantization_bits == 8,
        quantize_int4=cfg.use_quantization and cfg.quantization_bits == 4,
        # Training keeps bf16-activation matmuls over the quantized base:
        # the a8 serving path's STE backward assumes the forward it skews
        # (load.py defaults w8a8 on for quantized loads — the serving posture).
        w8a8=False,
    )
    if params is None:
        raise FileNotFoundError(f"No weights found at {cfg.vla_path}")

    if cfg.use_lora:
        params = dict(params, llm=add_lora_params(jax.random.key(cfg.seed), params["llm"], rank=cfg.lora_rank))
        trainable = lora_trainable_mask(params)
    else:
        trainable = model.trainable_mask(params, "vla-full-train")

    tokenizer = get_tokenizer(cfg.tokenizer_path)
    dataset, action_tokenizer, collator = get_vla_dataset_and_collator(
        cfg.data_root_dir,
        cfg.dataset_name,
        base_tokenizer=tokenizer,
        llm_family=model.cfg.llm_family,
        batch_size=cfg.batch_size // jax.process_count(),
        shuffle_buffer_size=cfg.shuffle_buffer_size,
        image_aug=cfg.image_aug,
        pad_token_id=model.cfg.llm.pad_token_id,
        action_chunk=cfg.action_chunk,
    )
    if overwatch.is_rank_zero():
        save_sidecars(run_dir, config_to_dict(cfg), dataset.dataset_statistics)

    mesh = make_mesh(cfg.mesh_shape)
    params = jax.device_put(params, param_shardings(mesh, params))
    ocfg = OptimConfig(learning_rate=cfg.learning_rate, lr_scheduler_type="constant", total_steps=cfg.max_steps)
    optimizer = make_optimizer(ocfg, params, trainable_mask=trainable, grad_accum_steps=cfg.grad_accumulation_steps)
    from bridgelang_tpu.parallel.sharding import with_ambient_mesh

    # donate_argnums=0: without it the step holds the int8 base + adapters +
    # Adam TWICE transiently — measured to OOM full-depth 7B LoRA on a 16 GB
    # chip. Saves are synchronous, so donating the pre-save state is safe.
    step_fn = with_ambient_mesh(mesh, jax.jit(
        make_vla_train_step(model, optimizer, trainable_mask=trainable,
                            image_transform=model.image_transform, remat_policy=cfg.remat_policy,
                            parallel_decode_objective=cfg.parallel_decode),
        donate_argnums=0,
    ))
    state = init_train_state(params, optimizer, trainable_mask=trainable)
    ckpt = CheckpointManager(run_dir)
    metrics = VLAMetrics(
        build_trackers(cfg.trackers.split(","), exp_id, run_dir, config_to_dict(cfg)),
        exp_id, is_rank_zero=overwatch.is_rank_zero(),
    )

    sharding = batch_sharding(mesh)
    step = 0
    for batch in dataset:
        if step >= cfg.max_steps:
            break
        batch.pop("dataset_names", None)
        host_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if jax.process_count() > 1:
            from bridgelang_tpu.parallel.sharding import make_array_from_process_local

            device_batch = make_array_from_process_local(mesh, host_batch)
        else:
            device_batch = jax.device_put(host_batch, sharding)
        state, m = step_fn(state, device_batch)
        step += 1
        metrics.commit(global_step=step, loss=float(m["loss"]),
                       action_accuracy=float(m["action_accuracy"]), l1_loss=float(m["l1_loss"]))
        if step % 10 == 0:
            overwatch.info(metrics.push())
        if step % cfg.save_steps == 0:
            # all processes participate in the sharded Orbax write
            _save(ckpt, state, step, float(m["loss"]), cfg.use_lora, model,
                  run_dir if (cfg.export_hf and overwatch.is_rank_zero()) else None,
                  source_hf=cfg.vla_path if Path(cfg.vla_path).is_dir() else None)
    _save(ckpt, state, step, float(m["loss"]), cfg.use_lora, model,
          run_dir if (cfg.export_hf and overwatch.is_rank_zero()) else None,
          source_hf=cfg.vla_path if Path(cfg.vla_path).is_dir() else None)
    metrics.finalize()


def _save(ckpt, state, step, loss, use_lora, model=None, hf_export_dir=None, source_hf=None):
    """LoRA runs save the MERGED model (reference finetune.py:320-364
    merge_and_unload-and-save); optionally also exports the HF-format
    checkpoint the reference's serving stack consumes."""
    from bridgelang_tpu.training.lora import merge_lora

    if use_lora:
        save_state = state.replace(params=dict(state.params, llm=merge_lora(state.params["llm"])))
    else:
        save_state = state
    ckpt.save(save_state, step=step, epoch=0, loss=loss)
    if hf_export_dir is not None and model is not None:
        import jax

        from bridgelang_tpu.extern.hf_export import export_checkpoint

        # latest-only HF export (reference keeps latest only, finetune.py:328);
        # the source checkpoint supplies the dead tensors our pytree never
        # materializes, so the export loads strict=True under HF.
        export_checkpoint(model, jax.device_get(save_state.params), Path(hf_export_dir) / "hf_export",
                          source_hf=source_hf)


if __name__ == "__main__":
    main(parse_cli(FinetuneConfig))
