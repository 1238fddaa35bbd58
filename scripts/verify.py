"""Inference smoke + perf verification (the reference's de-facto test).

Counterpart of reference vla-scripts/extern/verify_openvla.py:30-89 and
scripts/extern/verify_prismatic.py: load a checkpoint (or a random-init
flagship), run N predict_action calls on random frames, print per-call
latency and sanity-check output ranges.

  python scripts/verify.py [--checkpoint /ckpts/openvla-7b] [--calls 100]
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
    parallel_decode: bool = False


def main(cfg: VerifyConfig) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.ops.image_ops import preprocess_batch

    if cfg.checkpoint:
        from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
        from bridgelang_tpu.models.load import load_vla

        model, params = load_vla(cfg.checkpoint, quantize_int8=cfg.quantize_int8)
        model.tokenizer = get_tokenizer(cfg.tokenizer_path)
    else:
        print("[verify] no checkpoint; random-init DEPTH-TRIMMED flagship "
              "(8/32 decoder layers — smoke timing only; bench.py measures the full model)")
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import importlib.util

        spec = importlib.util.spec_from_file_location("graft", Path(__file__).parent.parent / "__graft_entry__.py")
        graft = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(graft)
        model = graft._flagship_model(llm_layers=8, vit_depth=8)
        params = model.init_params(jax.random.key(0), param_dtype=jnp.bfloat16)

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
