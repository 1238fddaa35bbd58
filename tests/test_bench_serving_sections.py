"""CPU smoke tests for bench.py's server-harness sections (closedloop /
loadtest) on a tiny model: the sections must run end-to-end — HTTP loop,
client-side crop, gripper conversion, concurrent mixed traffic, recompile
accounting — and print well-formed metric lines. The real-chip numbers come
from `bench.py all`; this pins the machinery so a TPU run can't die on a
code bug."""

import dataclasses
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer


def _tiny_model(norm_stats):
    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, norm_stats, tokenizer=StubTokenizer(),
                        dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    return model, params


def _metric_lines(capsys):
    return [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
            if ln.startswith('{"metric"')]


def test_closed_loop_section_runs_and_reports_four_modes(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_build_flagship_int8", _tiny_model)
    bench._closed_loop_bench(TINY_NORM_STATS)
    metrics = {m["metric"]: m for m in _metric_lines(capsys)}
    assert set(metrics) == {"closed_loop_hz_sequential", "closed_loop_hz_speculative",
                            "closed_loop_hz_speculative_replayed", "closed_loop_hz_chunked8"}
    assert all(m["value"] > 0 for m in metrics.values())


def test_load_test_section_counts_recompiles_and_p99(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_build_flagship_int8", _tiny_model)
    bench._load_test_bench(TINY_NORM_STATS, duration_s=3.0, n_clients=4)
    (m,) = _metric_lines(capsys)
    assert m["metric"] == "serving_p99_ms"
    assert m["value"] > 0  # /stats reported a real p99
    assert "0 post-warmup XLA compiles" in m["unit"]
    assert "0 client errors" in m["unit"]
