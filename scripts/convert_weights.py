"""Checkpoint conversion CLI: Orbax run dir <-> HF OpenVLA format.

Counterpart of reference vla-scripts/extern/convert_openvla_weights_to_hf.py
(:73-272) and scripts/extern/convert_prismatic_weights_to_hf.py, both
directions:

  # our Orbax training checkpoint -> HF-format directory
  python scripts/convert_weights.py --direction to_hf \
      --run_dir runs/myrun --out_dir /ckpts/myrun-hf

  # HF checkpoint -> verify it loads and round-trips (conversion happens
  # lazily at load time in this framework, so "from_hf" is a verification)
  python scripts/convert_weights.py --direction verify_hf --checkpoint /ckpts/openvla-7b
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class ConvertConfig:
    direction: str = "to_hf"  # to_hf | verify_hf
    run_dir: Optional[str] = None
    checkpoint: Optional[str] = None  # specific checkpoint dir (default: latest)
    out_dir: str = "hf_export"
    base_vlm: str = "prism-dinosiglip-224px+7b"
    # Original HF checkpoint dir: passes through the dead tensors (final ViT
    # blocks, SigLIP pool head) so the export loads strict=True under HF.
    source_hf: Optional[str] = None


def main(cfg: ConvertConfig) -> None:
    import jax
    import jax.numpy as jnp

    if cfg.direction == "verify_hf":
        from bridgelang_tpu.models.load import load_vla

        model, params = load_vla(cfg.checkpoint, dtype=jnp.bfloat16)
        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
        print(f"verify_hf: loaded {cfg.checkpoint} ({n/1e9:.2f}B params, "
              f"norm_stats keys: {list(model.norm_stats)})")
        return

    assert cfg.direction == "to_hf"
    from bridgelang_tpu.conf.models import ModelConfig
    from bridgelang_tpu.extern.hf_export import export_checkpoint
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.training.checkpointing import CheckpointManager, load_dataset_statistics
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer

    run_dir = Path(cfg.run_dir)
    base = ModelConfig.get(cfg.base_vlm)
    vlm_cfg = VLMConfig.from_ids(
        model_id=base.model_id,
        vision_backbone_id=base.vision_backbone_id,
        llm_backbone_id=base.llm_backbone_id,
        arch_specifier=base.arch_specifier,
        image_resize_strategy=base.image_resize_strategy,
    )
    stats_file = run_dir / "dataset_statistics.json"
    norm_stats = load_dataset_statistics(stats_file) if stats_file.exists() else {}
    model = OpenVLA(vlm_cfg, norm_stats, dtype=jnp.bfloat16)

    mgr = CheckpointManager(run_dir)
    ckpt_path = Path(cfg.checkpoint) if cfg.checkpoint else mgr.latest()
    assert ckpt_path is not None, f"no checkpoint under {run_dir}"
    params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)
    optimizer = make_optimizer(OptimConfig(), params)
    state = mgr.restore(ckpt_path, init_train_state(params, optimizer))
    out = export_checkpoint(model, jax.device_get(state.params), cfg.out_dir, source_hf=cfg.source_hf)
    print(f"to_hf: wrote {out}")


if __name__ == "__main__":
    main(parse_cli(ConvertConfig))
