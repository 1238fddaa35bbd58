"""Entry-point smoke tests: every script imports, parses its CLI, and the
serving stack round-trips a request in-process."""

import importlib.util
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent


def _load(name):
    mod_name = f"blx_script_{name}"
    spec = importlib.util.spec_from_file_location(mod_name, ROOT / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod  # dataclasses resolves annotations via sys.modules
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("script,cfg_cls,overrides", [
    ("train", "TrainConfig", ["--vla.type", "debug", "--seed", "3"]),
    ("finetune", "FinetuneConfig", ["--use_lora", "false", "--lora_rank", "16"]),
    ("deploy", "DeployConfig", ["--port", "8123"]),
    ("pretrain", "PretrainConfig", ["--stage", "align"]),
    ("generate", "GenerateConfig", ["--max_new_tokens", "16"]),
    ("verify", "VerifyConfig", ["--calls", "5"]),
    ("demo", "DemoConfig", ["--instruction", "wave"]),
    ("preprocess", "PreprocessConfig", ["--dataset_id", "llava-v15"]),
])
def test_script_config_parses(script, cfg_cls, overrides):
    from bridgelang_tpu.conf import parse_cli

    mod = _load(script)
    cfg = parse_cli(getattr(mod, cfg_cls), overrides)
    assert cfg is not None


def test_serving_roundtrip_tiny_model():
    """Boot the REST server on a tiny random model and act through the client
    — the full deploy.py wire path without the 7B weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    server = VLAServer(model, params, default_unnorm_key="bridge_orig")
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        img = np.random.default_rng(0).integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        action = client_act("127.0.0.1", port, img, "push the button")
        assert action.shape == (7,)
        assert np.isfinite(action).all()
        # nested-list payload path too (reference json_numpy style)
        action2 = client_act("127.0.0.1", port, img, "push the button", use_b64=False)
        np.testing.assert_allclose(action, action2, atol=1e-6)
    finally:
        httpd.shutdown()


def test_convert_weights_config_parses():
    from bridgelang_tpu.conf import parse_cli

    mod = _load("convert_weights")
    cfg = parse_cli(mod.ConvertConfig, ["--direction", "to_hf", "--run_dir", "runs/x"])
    assert cfg.run_dir == "runs/x"
