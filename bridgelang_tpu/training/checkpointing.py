"""Orbax-based checkpoint save/restore with sidecar artifacts.

Counterpart of the reference's checkpoint machinery
(reference: fsdp.py:95-133 FULL_STATE_DICT rank-0 torch.save named
`step-XXXXXX-epoch-XX-loss=Y.pt`; ddp.py:38-53; resume cross-checks at
train.py:143-150). Improvements by design:

* Sharded, parallel-IO Orbax checkpoints — no rank-0 gather, no 30 GB
  single-file save; restore re-shards to any mesh.
* Optimizer state IS saved (the reference's FSDP path silently drops it —
  SURVEY.md §5 "Checkpoint / resume").
* Same sidecars: config.json + dataset_statistics.json in the run dir.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax

CKPT_DIR_RE = re.compile(r"step-(\d+)-epoch-(\d+)-loss=([0-9.]+)")


def checkpoint_name(step: int, epoch: int, loss: float) -> str:
    """Keeps the reference's naming contract so resume validation works the
    same way (train.py:146-148)."""
    return f"step-{step:06d}-epoch-{epoch:02d}-loss={loss:.4f}"


def parse_checkpoint_name(name: str) -> Tuple[int, int, float]:
    m = CKPT_DIR_RE.search(str(name))
    if not m:
        raise ValueError(f"Un-parsable checkpoint name {name!r}")
    return int(m.group(1)), int(m.group(2)), float(m.group(3))


class CheckpointManager:
    def __init__(self, run_dir, keep: int = 5):
        import orbax.checkpoint as ocp

        self.run_dir = Path(run_dir)
        self.ckpt_root = self.run_dir / "checkpoints"
        self.ckpt_root.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ocp = ocp
        self._ckptr = ocp.StandardCheckpointer()

    def _enforce_retention(self) -> None:
        if not self.keep:
            return
        ckpts = sorted(self.ckpt_root.glob("step-*"), key=lambda p: parse_checkpoint_name(p.name)[0])
        import shutil

        for old in ckpts[: max(0, len(ckpts) - self.keep)]:
            shutil.rmtree(old, ignore_errors=True)

    def save(self, state, step: int, epoch: int, loss: float, only_trainable_mask: Optional[Any] = None) -> Path:
        """Save a TrainState (params + optimizer state + step). If
        `only_trainable_mask` is given, frozen params are dropped (reference
        `only_trainable` default, base_strategy.py:252)."""
        payload = state
        if only_trainable_mask is not None:
            import jax.numpy as jnp

            def keep(p, m):
                return p if bool(jnp.all(jnp.asarray(m))) else None

            payload = state.replace(params=jax.tree.map(keep, state.params, only_trainable_mask))
        path = self.ckpt_root / checkpoint_name(step, epoch, loss)
        self._ckptr.save(path.absolute(), payload)
        self._ckptr.wait_until_finished()
        # Orbax coordinates the sharded write across processes, but the
        # sidecar marker + retention sweep are plain-filesystem operations:
        # single-writer them on a pod (every process rmtree-ing concurrently
        # on shared storage is a race).
        if jax.process_index() == 0:
            latest = self.run_dir / "latest-checkpoint.txt"
            latest.write_text(path.name)
            self._enforce_retention()
        return path

    def restore(self, path, target_state):
        """Restore into the (possibly sharded) structure of `target_state` —
        Orbax re-shards to the target's NamedShardings on load (any mesh
        shape, not just the one it was saved on)."""
        # Uncommitted scalars in the target (e.g. a fresh TrainState.step from
        # jnp.zeros) carry a single-device sharding; Orbax restores them
        # there, and the next jitted train step then sees params on the mesh
        # but step on device 0 — "incompatible devices". Pin such leaves to a
        # replicated sharding over the params' mesh before restoring.
        from jax.sharding import NamedSharding, PartitionSpec

        meshes = {
            leaf.sharding.mesh
            for leaf in jax.tree.leaves(target_state)
            if isinstance(getattr(leaf, "sharding", None), NamedSharding)
        }
        if len(meshes) == 1:
            (mesh,) = meshes
            rep = NamedSharding(mesh, PartitionSpec())

            def pin(leaf):
                if hasattr(leaf, "sharding") and not isinstance(leaf.sharding, NamedSharding):
                    return jax.device_put(leaf, rep)
                return leaf

            target_state = jax.tree.map(pin, target_state)
        return self._ckptr.restore(Path(path).absolute(), target_state)

    def latest(self) -> Optional[Path]:
        marker = self.run_dir / "latest-checkpoint.txt"
        if marker.exists():
            p = self.ckpt_root / marker.read_text().strip()
            if p.exists():
                return p
        ckpts = sorted(self.ckpt_root.glob("step-*"), key=lambda p: parse_checkpoint_name(p.name)[0])
        return ckpts[-1] if ckpts else None


def _jsonable(obj):
    """numpy arrays/scalars -> lists/floats (statistics pytrees carry ndarrays)."""
    import numpy as np

    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer, np.bool_)):
        return obj.item()
    return str(obj)


def save_sidecars(run_dir, config: Dict[str, Any], dataset_statistics: Optional[Dict[str, Any]] = None) -> None:
    """config.json (+yaml-ish) and dataset_statistics.json next to checkpoints
    (reference: train.py:133-138, 203-204)."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    from bridgelang_tpu.ops.quant import pack_layout_tag

    # self-describing artifacts: packed-int4 leaves dequantize to silently
    # row-permuted garbage under any other byte layout, so every run records
    # the layout version — including the pack shard count (shard-blocked
    # packing IS a different byte layout) — and resume checks it
    # (validate_resume).
    config = {**config, "int4_pack_layout": pack_layout_tag(config.get("int4_shards", 1))}
    with open(run_dir / "config.json", "w") as f:
        json.dump(config, f, indent=2, default=str)
    if dataset_statistics is not None:
        with open(run_dir / "dataset_statistics.json", "w") as f:
            json.dump(dataset_statistics, f, indent=2, default=_jsonable)


def load_dataset_statistics(path) -> Dict[str, Any]:
    """Consume a dataset_statistics.json (ours or one produced by the
    reference — same schema, so published openvla checkpoints' stats work)."""
    with open(path) as f:
        return json.load(f)


def validate_resume(checkpoint_path, resume_step: int, resume_epoch: int) -> None:
    """reference train.py:146-148 asserts the filename matches the claimed
    resume step/epoch; keep that guard. Additionally reject a run whose
    recorded packed-int4 byte layout differs from this build's — restoring
    such params would produce row-permuted weights with no shape/dtype error
    (quant.py::INT4_PACK_LAYOUT)."""
    step, epoch, _ = parse_checkpoint_name(Path(checkpoint_path).name)
    assert step == resume_step, f"checkpoint step {step} != resume_step {resume_step}"
    assert epoch == resume_epoch, f"checkpoint epoch {epoch} != resume_epoch {resume_epoch}"
    ckpt = Path(checkpoint_path)
    # checkpoints live at <run_dir>/checkpoints/step-*; sidecars at <run_dir>/
    candidates = [ckpt.parent / "config.json", ckpt.parent.parent / "config.json"]
    cfg_file = next((c for c in candidates if c.exists()), None)
    if cfg_file is not None:
        from bridgelang_tpu.ops.quant import pack_layout_tag

        with open(cfg_file) as f:
            run_cfg = json.load(f)
        recorded = run_cfg.get("int4_pack_layout")
        expected = pack_layout_tag(run_cfg.get("int4_shards", 1))
        quantized4 = run_cfg.get("use_quantization") and run_cfg.get("quantization_bits") == 4
        if quantized4 and recorded != expected:
            raise ValueError(
                f"checkpoint was written with int4 pack layout {recorded!r}, this build "
                f"would read it as {expected!r} — re-quantize from the source checkpoint "
                "instead of resuming (restored packed weights would be permuted)."
            )
