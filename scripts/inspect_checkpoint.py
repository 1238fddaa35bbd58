"""Checkpoint inspector: list tensors, shapes, dtypes, and sidecar metadata.

Works on both checkpoint layouts this framework touches:

  * HF OpenVLA format (config.json + model*.safetensors [+ dataset_statistics
    .json]) — published reference checkpoints and our extern/hf_export output;
  * BridgeLang-TPU Orbax run dirs (runs/<id>/checkpoints/step-*).

Useful for weight-conversion debugging (which keys exist on each side, where
the bytes go) without loading anything onto a device. The reference has no
equivalent tooling — its converters fail with raw torch key errors.

  python scripts/inspect_checkpoint.py --path /ckpts/openvla-7b [--filter llm]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class InspectConfig:
    path: str = ""
    filter: Optional[str] = None  # substring filter on tensor names
    limit: int = 40               # max tensor rows printed (0 = all)


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def _summarize(rows, cfg) -> None:
    by_prefix = defaultdict(lambda: [0, 0])  # prefix -> [count, bytes]
    total = [0, 0]
    shown = matched = 0
    for name, shape, dtype, nbytes in rows:
        prefix = name.split(".")[0].split("/")[0]
        by_prefix[prefix][0] += 1
        by_prefix[prefix][1] += nbytes
        total[0] += 1
        total[1] += nbytes
        if cfg.filter and cfg.filter not in name:
            continue
        matched += 1
        if not cfg.limit or shown < cfg.limit:
            print(f"  {name:70s} {str(shape):24s} {dtype:10s} {_fmt_bytes(nbytes)}")
            shown += 1
    hidden = matched - shown
    if hidden > 0:
        print(f"  ... {hidden} more (raise --limit or use --filter)")
    print("\nper top-level module:")
    for prefix, (count, nbytes) in sorted(by_prefix.items(), key=lambda kv: -kv[1][1]):
        print(f"  {prefix:20s} {count:5d} tensors  {_fmt_bytes(nbytes)}")
    print(f"  {'TOTAL':20s} {total[0]:5d} tensors  {_fmt_bytes(total[1])}")


def inspect_hf(ckpt_dir: Path, cfg: InspectConfig) -> None:
    from safetensors import safe_open

    files = sorted(ckpt_dir.glob("*.safetensors"))
    print(f"[inspect] HF-format checkpoint: {len(files)} safetensors file(s)")
    rows = []
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for name in sf.keys():
                sl = sf.get_slice(name)
                shape = tuple(sl.get_shape())
                dtype = str(sl.get_dtype()).lower()
                itemsize = {"f32": 4, "float32": 4, "f16": 2, "float16": 2, "bf16": 2,
                            "bfloat16": 2, "i8": 1, "int8": 1, "i32": 4, "int32": 4,
                            "f64": 8, "float64": 8}.get(dtype, 4)
                nbytes = itemsize * int(__import__("math").prod(shape) if shape else 1)
                rows.append((name, shape, dtype, nbytes))
    _summarize(sorted(rows), cfg)
    for sidecar in ("config.json", "dataset_statistics.json"):
        p = ckpt_dir / sidecar
        if p.exists():
            obj = json.loads(p.read_text())
            keys = list(obj)[:12]
            print(f"\n{sidecar}: {len(obj)} top-level keys: {keys}")


def inspect_orbax(ckpt_dir: Path, cfg: InspectConfig) -> None:
    import orbax.checkpoint as ocp

    print(f"[inspect] Orbax checkpoint: {ckpt_dir.name}")
    meta = ocp.StandardCheckpointer().metadata(ckpt_dir.absolute())
    rows = []

    def walk(node, path):
        if hasattr(node, "shape") and hasattr(node, "dtype"):
            shape = tuple(node.shape)
            import numpy as _np

            nbytes = int(_np.dtype(node.dtype).itemsize) * int(max(1, int(_np.prod(shape)) if shape else 1))
            rows.append(("/".join(path), shape, str(node.dtype), nbytes))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])

    walk(meta.item_metadata if hasattr(meta, "item_metadata") else meta, [])
    _summarize(sorted(rows), cfg)


def main(cfg: InspectConfig) -> None:
    path = Path(cfg.path)
    if not path.exists():
        raise SystemExit(f"no such path: {path}")
    if list(path.glob("*.safetensors")):
        inspect_hf(path, cfg)
    elif (path / "_METADATA").exists() or (path / "_CHECKPOINT_METADATA").exists() or list(path.glob("*/_METADATA")):
        inspect_orbax(path, cfg)
    elif (path / "checkpoints").exists():
        ckpts = sorted((path / "checkpoints").glob("step-*"))
        if not ckpts:
            raise SystemExit(f"{path}/checkpoints holds no step-* dirs")
        inspect_orbax(ckpts[-1], cfg)
    else:
        raise SystemExit(f"{path}: neither HF safetensors nor an Orbax run dir")


if __name__ == "__main__":
    main(parse_cli(InspectConfig))
