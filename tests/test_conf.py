"""Config registry + CLI parsing tests."""

import json

import pytest

from bridgelang_tpu.conf import DatasetConfig, ModelConfig, VLAConfig, config_to_dict, parse_cli, save_config
from bridgelang_tpu.conf.registry import ChoiceRegistry
from dataclasses import dataclass, field


def test_model_registry_has_flagship():
    assert "prism-dinosiglip-224px+7b" in ModelConfig.available()
    cfg = ModelConfig.get("prism-dinosiglip-224px+7b")
    assert cfg.vision_backbone_id == "dinosiglip-vit-so-224px"
    assert cfg.llm_backbone_id == "llama2-7b-pure"
    assert cfg.arch_specifier == "no-align+fused-gelu-mlp"
    assert cfg.image_resize_strategy == "resize-naive"


def test_vla_registry_flagship_scale():
    cfg = VLAConfig.get("prism-dinosiglip-224px+mx-oxe-magic-soup-plus")
    assert cfg.expected_device_count == 64
    assert cfg.global_batch_size == 2048
    assert cfg.per_device_batch_size == 32
    assert cfg.data_mix == "oxe_magic_soup_plus_minus"
    assert cfg.shuffle_buffer_size == 1_000_000


def test_registry_overrides():
    cfg = VLAConfig.get("debug", per_device_batch_size=4)
    assert cfg.per_device_batch_size == 4
    assert cfg.data_mix == "bridge"


def test_unknown_id_raises():
    with pytest.raises(KeyError):
        ModelConfig.get_choice_class("nope")


def test_config_serialization_roundtrip(tmp_path):
    cfg = VLAConfig.get("debug")
    save_config(cfg, tmp_path / "config.json")
    loaded = json.loads((tmp_path / "config.json").read_text())
    assert loaded["vla_id"] == "debug"
    assert loaded["type"] == "debug"


def test_parse_cli_nested_choice():
    @dataclass
    class TrainCfg:
        vla: VLAConfig = field(default_factory=lambda: VLAConfig.get("debug"))
        run_root_dir: str = "runs"
        seed: int = 7

    cfg = parse_cli(
        TrainCfg,
        ["--vla.type", "prism-dinosiglip-224px+mx-bridge", "--vla.per_device_batch_size", "8", "--seed=42"],
    )
    assert cfg.vla.vla_id == "prism-dinosiglip-224px+mx-bridge"
    assert cfg.vla.per_device_batch_size == 8
    assert cfg.seed == 42
    assert cfg.run_root_dir == "runs"


def test_parse_cli_rejects_unknown_keys():
    @dataclass
    class C:
        a: int = 1

    with pytest.raises(ValueError):
        parse_cli(C, ["--bogus", "1"])


def test_available_models_registry():
    from bridgelang_tpu.models.load import available_models, MODEL_REGISTRY

    models = available_models()
    assert "openvla-7b" in models and len(models) == len(MODEL_REGISTRY) >= 50


def test_load_vla_missing_path_message():
    """A bare model id with no local dir tries the openvla/<id> Hub repo; in
    a zero-egress environment the failure must name the repo and tell the
    user what to pre-stage (models/load.py::resolve_checkpoint_dir)."""
    import pytest as _pytest

    from bridgelang_tpu.models.load import load_vla

    with _pytest.raises(FileNotFoundError, match="openvla/openvla-7b.*zero-egress"):
        load_vla("openvla-7b")
