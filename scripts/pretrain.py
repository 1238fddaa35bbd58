"""VLM pretraining (align / finetune stages) entry point.

Counterpart of reference scripts/pretrain.py:117-238: stage-specific hparams
from the ModelConfig registry, map-style LLaVA data with modality-split
batching, grad accumulation (allowed in the VLM loop, unlike VLA), cosine
schedule, epoch-end checkpoints.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import DatasetConfig, ModelConfig, config_to_dict, parse_cli
from bridgelang_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass
class PretrainConfig:
    model: ModelConfig = field(default_factory=lambda: ModelConfig.get("prism-dinosiglip-224px+7b"))
    dataset: DatasetConfig = field(default_factory=lambda: DatasetConfig.get("llava-v15"))
    stage: str = "finetune"  # align | finetune | full-finetune
    run_root_dir: str = "runs"
    run_id: Optional[str] = None
    tokenizer_path: Optional[str] = None
    pretrained_checkpoint: Optional[str] = None  # align-stage projector ckpt
    seed: int = 7
    remat_policy: str = "dots"  # "dots" (faster) | "full" (min memory)
    max_steps_override: Optional[int] = None
    mesh_shape: Optional[str] = None
    trackers: str = "jsonl"


def main(cfg: PretrainConfig) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.parallel.mesh import initialize_distributed, make_mesh
    from bridgelang_tpu.parallel.sharding import batch_sharding, param_shardings
    from bridgelang_tpu.preprocessing import get_dataset_and_collator
    from bridgelang_tpu.preprocessing.datasets import SplitModalityBatcher
    from bridgelang_tpu.training.checkpointing import CheckpointManager, save_sidecars
    from bridgelang_tpu.training.metrics import Metrics, build_trackers
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer, make_vla_train_step
    from bridgelang_tpu.util import set_global_seed

    initialize_distributed()
    set_global_seed(cfg.seed)
    m = cfg.model
    stage = cfg.stage

    # Stage hparams (reference pretrain.py:81-113)
    if stage == "align":
        epochs, global_bsz, per_dev_bsz = m.align_epochs, m.align_global_batch_size, m.align_per_device_batch_size
        lr, wd, grad_clip = m.align_learning_rate, m.align_weight_decay, m.align_max_grad_norm
        schedule, warmup = m.align_lr_scheduler_type, m.align_warmup_ratio
    else:
        epochs, global_bsz, per_dev_bsz = m.finetune_epochs, m.finetune_global_batch_size, m.finetune_per_device_batch_size
        lr, wd, grad_clip = m.finetune_learning_rate, m.finetune_weight_decay, m.finetune_max_grad_norm
        schedule, warmup = m.finetune_lr_scheduler_type, m.finetune_warmup_ratio

    run_id = cfg.run_id or f"{cfg.dataset.dataset_id}+{m.model_id}+stage-{stage}+x{cfg.seed}"
    run_dir = Path(cfg.run_root_dir) / run_id

    vlm_cfg = VLMConfig.from_ids(
        model_id=m.model_id,
        vision_backbone_id=m.vision_backbone_id,
        llm_backbone_id=m.llm_backbone_id,
        arch_specifier=m.arch_specifier,
        image_resize_strategy=m.image_resize_strategy,
        llm_max_length=m.llm_max_length,
    )
    model = PrismaticVLM(vlm_cfg, dtype=jnp.bfloat16)
    tokenizer = get_tokenizer(cfg.tokenizer_path)

    dataset, collator = get_dataset_and_collator(
        "align" if stage == "align" else "finetune",
        cfg.dataset, tokenizer, vlm_cfg.llm_family,
        max_length=m.llm_max_length, pad_token_id=vlm_cfg.llm.pad_token_id,
    )

    mesh = make_mesh(cfg.mesh_shape)
    params = model.init_params(jax.random.key(cfg.seed), param_dtype=jnp.float32)
    params = jax.device_put(params, param_shardings(mesh, params))
    trainable = model.trainable_mask(params, stage)

    n_devices = jax.device_count()
    micro_bsz = per_dev_bsz * n_devices
    grad_accum = max(1, global_bsz // micro_bsz)
    steps_per_epoch = len(dataset) // global_bsz
    total_steps = cfg.max_steps_override or (epochs * steps_per_epoch) or 1000

    ocfg = OptimConfig(learning_rate=lr, weight_decay=wd, max_grad_norm=grad_clip,
                       lr_scheduler_type=schedule, warmup_ratio=warmup, total_steps=total_steps)
    optimizer = make_optimizer(ocfg, params, trainable_mask=trainable, grad_accum_steps=grad_accum)
    from bridgelang_tpu.parallel.sharding import with_ambient_mesh

    # donate_argnums=0: see scripts/train.py — halves transient state memory.
    step_fn = with_ambient_mesh(mesh, jax.jit(
        make_vla_train_step(model, optimizer, trainable_mask=trainable,
                            image_transform=model.image_transform,
                            remat_policy=cfg.remat_policy),
        donate_argnums=0))
    state = init_train_state(params, optimizer, trainable_mask=trainable)
    ckpt = CheckpointManager(run_dir)
    if overwatch.is_rank_zero():
        save_sidecars(run_dir, config_to_dict(cfg))
    metrics = Metrics(build_trackers(cfg.trackers.split(","), run_id, run_dir, config_to_dict(cfg)),
                      run_id, is_rank_zero=overwatch.is_rank_zero())

    batcher = SplitModalityBatcher(dataset.get_modality_lengths(), micro_bsz, seed=cfg.seed,
                                   process_index=jax.process_index(), process_count=jax.process_count())
    sharding = batch_sharding(mesh)
    step = 0
    for epoch in range(epochs):
        for batch_indices in batcher.batches(epoch):
            if step >= total_steps:
                break
            batch = collator([dataset[i] for i in batch_indices])
            device_batch = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()
                                           if k != "multimodal_indices"}, sharding)
            state, mtr = step_fn(state, device_batch)
            step += 1
            metrics.commit(global_step=step, loss=float(mtr["loss"]), lr=lr)
            if step % 10 == 0:
                overwatch.info(metrics.push())
        ckpt.save(state, step=step, epoch=epoch, loss=float(mtr["loss"]))  # all procs participate
    metrics.finalize()


if __name__ == "__main__":
    main(parse_cli(PretrainConfig))
