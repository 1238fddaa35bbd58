"""The REST-driven bench sections (closedloop, loadtest) run end-to-end on a
tiny model.

Regression for the round-4 canonical capture: both sections crashed on-chip
with "predict_action from strings requires a tokenizer" because they take the
REST string-instruction path (unlike _serving_bench's pre-tokenized prompt
ids) and `_build_flagship_int8` returns a model without a tokenizer. The
sections must be self-contained — a bench that only works when a prior
section (or deploy.py) happened to configure the model is exactly the r03
broken-artifact failure mode again.
"""

import dataclasses
import importlib.util
import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


@pytest.fixture()
def bench(monkeypatch):
    """bench.py with its flagship builder swapped for a tiny CPU model.

    The builder mirrors the real `_build_flagship_int8` contract: it does NOT
    set a tokenizer (that's each REST section's job — the bug under test).
    """
    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT

    spec = importlib.util.spec_from_file_location("blx_bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["blx_bench"] = mod
    spec.loader.exec_module(mod)

    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width,
                                        TINY_VIT.num_patches))

    def tiny_builder(norm_stats):
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, norm_stats, dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
        return model, params

    monkeypatch.setattr(mod, "_build_flagship_int8", tiny_builder)
    mod.TINY_NORM_STATS = TINY_NORM_STATS
    return mod


def _metric_lines(captured):
    return [json.loads(ln) for ln in captured.splitlines()
            if ln.startswith("{") and '"metric"' in ln]


def test_closed_loop_bench_runs_end_to_end(bench, capsys):
    bench._closed_loop_bench(bench.TINY_NORM_STATS, ticks=5)
    metrics = {m["metric"]: m for m in _metric_lines(capsys.readouterr().out)}
    assert set(metrics) == {"closed_loop_hz_sequential", "closed_loop_hz_speculative",
                            "closed_loop_hz_speculative_replayed", "closed_loop_hz_chunked8"}
    for m in metrics.values():
        assert m["value"] > 0
    # the replayed mode must state its acceptance-injection mechanism and the
    # calibrated margin in the unit string (honesty contract)
    unit = metrics["closed_loop_hz_speculative_replayed"]["unit"]
    assert "replayed" in unit and "margin" in unit and "crafted" in unit


def test_load_test_bench_runs_end_to_end(bench, capsys):
    bench._load_test_bench(bench.TINY_NORM_STATS, duration_s=2.0, n_clients=2)
    (m,) = _metric_lines(capsys.readouterr().out)
    assert m["metric"] == "serving_p99_ms"
    assert m["value"] > 0  # -1 = /stats had no latency window (no request served)
    assert "0 client errors" in m["unit"]
