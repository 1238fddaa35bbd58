"""Full-lifecycle integration: export an HF-format checkpoint to disk,
load it back through the public `load_vla` path, serve predictions, fine-tune
with LoRA, merge, re-export — the complete user journey end to end."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bridgelang_tpu.models.load as load_mod
import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.extern.hf_export import export_checkpoint
from bridgelang_tpu.models.vision.vit import VIT_CONFIGS, ViT, ViTConfig
from bridgelang_tpu.models.vla import OpenVLA
from bridgelang_tpu.models.vlm import VLMConfig
from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer, random_image

TINY_SINGLE_VIT = dataclasses.replace(TINY_VIT, num_reg_tokens=0, no_embed_class=False, layerscale_init=None)


def _tiny_openvla(seed=0):
    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_SINGLE_VIT, dtype=dtype), TINY_SINGLE_VIT.width, TINY_SINGLE_VIT.num_patches
    )
    try:
        cfg = dataclasses.replace(
            VLMConfig(
                vision_backbone_id="siglip-vit-so400m",
                arch_specifier="no-align+fused-gelu-mlp",
            ),
            llm=TINY_LLM,
        )
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(seed))
    finally:
        vlm_mod.build_vision_backbone = orig
    return model, params


def test_export_load_predict_finetune_reexport(tmp_path, monkeypatch):
    model, params = _tiny_openvla()
    img = random_image(40, 40)
    baseline = model.predict_action(params, img, "stack the cups")

    # 1. export HF-format checkpoint to disk
    ckpt_dir = export_checkpoint(model, params, tmp_path / "ckpt")
    files = {p.name for p in ckpt_dir.iterdir()}
    assert {"config.json", "model.safetensors", "dataset_statistics.json"} <= files

    # 2. load back through the PUBLIC loader (patch registries so the tiny
    #    vision/llm configs resolve under their real ids)
    monkeypatch.setitem(VIT_CONFIGS, "siglip-vit-so400m", TINY_SINGLE_VIT)
    import bridgelang_tpu.models.llm.llama as llama_mod

    monkeypatch.setitem(llama_mod.LLM_CONFIGS, "llama2-7b-pure", TINY_LLM)
    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_SINGLE_VIT, dtype=dtype), TINY_SINGLE_VIT.width, TINY_SINGLE_VIT.num_patches),
    )
    model2, params2 = load_mod.load_vla(str(ckpt_dir), dtype=jnp.float32)
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    model2.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
    model2.tokenizer = StubTokenizer()

    # 3. loaded model reproduces the original actions exactly
    reloaded = model2.predict_action(params2, img, "stack the cups")
    np.testing.assert_allclose(reloaded, baseline, atol=1e-5)
    assert model2.norm_stats.keys() == TINY_NORM_STATS.keys()

    # 4. LoRA fine-tune a few steps, merge, actions change but stay in range
    from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask, merge_lora
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer, make_vla_train_step

    lora_params = dict(params2, llm=add_lora_params(jax.random.key(1), params2["llm"], rank=4))
    mask = lora_trainable_mask(lora_params)
    optimizer = make_optimizer(OptimConfig(learning_rate=5e-2), lora_params, trainable_mask=mask)
    step = jax.jit(make_vla_train_step(model2, optimizer, trainable_mask=mask,
                                       compute_dtype=jnp.float32, image_transform=model2.image_transform))
    state = init_train_state(lora_params, optimizer, trainable_mask=mask)
    rng = np.random.default_rng(0)
    b = 2
    ids = np.full((b, 32), TINY_LLM.pad_token_id, np.int32)
    msk = np.zeros((b, 32), np.int32)
    lbl = np.full((b, 32), -100, np.int32)
    for i in range(b):
        ids[i, 0] = 1
        ids[i, 1:8] = rng.integers(3, 400, 7)
        ids[i, 8:15] = rng.integers(TINY_LLM.vocab_size - 256, TINY_LLM.vocab_size, 7)
        msk[i, :15] = 1
        lbl[i, 8:15] = ids[i, 8:15]
    batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(msk), "labels": jnp.asarray(lbl),
             "frames": jnp.asarray(np.stack([random_image(40, 40, seed=i) for i in range(b)]))}
    for _ in range(4):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    merged_params = dict(state.params, llm=merge_lora(state.params["llm"]))
    tuned = model2.predict_action(merged_params, img, "stack the cups")
    assert tuned.shape == (7,)

    # 5. re-export the tuned model; round-trips through the loader again
    ckpt2 = export_checkpoint(model2, merged_params, tmp_path / "ckpt2")
    model3, params3 = load_mod.load_vla(str(ckpt2), dtype=jnp.float32)
    model3.image_transform = model2.image_transform
    model3.tokenizer = StubTokenizer()
    np.testing.assert_allclose(model3.predict_action(params3, img, "stack the cups"), tuned, atol=1e-5)


def test_resolve_checkpoint_dir_contract(tmp_path):
    """Hub-layout resolution (reference load.py:52-76): local dirs pass
    through untouched; a bare id maps to the openvla/<id> repo and, with no
    egress, fails with a FileNotFoundError naming the repo and the files to
    pre-stage (never a bare network traceback)."""
    import pytest

    from bridgelang_tpu.models.load import resolve_checkpoint_dir

    assert resolve_checkpoint_dir(str(tmp_path)) == tmp_path

    with pytest.raises(FileNotFoundError) as exc:
        resolve_checkpoint_dir("openvla-7b-nonexistent-xyz")
    msg = str(exc.value)
    assert "openvla/openvla-7b-nonexistent-xyz" in msg
    assert "safetensors" in msg

    with pytest.raises(FileNotFoundError) as exc2:
        resolve_checkpoint_dir("some-org/some-model-xyz")
    assert "some-org/some-model-xyz" in str(exc2.value)


@pytest.mark.parametrize("qbits", [8, 4])
@pytest.mark.slow
def test_finetune_script_main_end_to_end(tmp_path, monkeypatch, qbits):
    """scripts/finetune.py main() on a tiny checkpoint + injected dataset:
    load -> quantized base (int8 and packed-int4 QLoRA) + LoRA adapters ->
    donated jitted steps -> merged Orbax save + HF re-export. The reference's
    most-used workflow as ONE script call (reference
    vla-scripts/finetune.py:113-369; NF4 base :142-148)."""
    from bridgelang_tpu.models.vision.vit import VIT_CONFIGS
    import bridgelang_tpu.models.llm.llama as llama_mod
    import bridgelang_tpu.models.llm.tokenizer as tok_mod
    import bridgelang_tpu.vla.materialize as mat_mod
    from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer
    from bridgelang_tpu.vla.datasets.datasets import (
        DummyDataset,
        PaddedCollatorForActionPrediction,
        RLDSBatchTransform,
    )
    from tests.test_scripts import _load

    model, params = _tiny_openvla()
    ckpt_dir = export_checkpoint(model, params, tmp_path / "base_ckpt")

    monkeypatch.setitem(VIT_CONFIGS, "siglip-vit-so400m", TINY_SINGLE_VIT)
    monkeypatch.setitem(llama_mod.LLM_CONFIGS, "llama2-7b-pure", TINY_LLM)
    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_SINGLE_VIT, dtype=dtype),
                                        TINY_SINGLE_VIT.width, TINY_SINGLE_VIT.num_patches),
    )
    monkeypatch.setattr(tok_mod, "get_tokenizer", lambda path=None: StubTokenizer())
    # This container sets TPU_WORKER_HOSTNAMES, which initialize_distributed
    # reads as "on a pod" — in-process the backend is already up, so clear it.
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    monkeypatch.setattr(
        vlm_mod, "transform_config_for_backbone",
        lambda bid, strategy: ImageTransformConfig(strategy, (ImageTowerSpec(size=32),)))

    tok = StubTokenizer()
    bt = RLDSBatchTransform(ActionTokenizer(tok), tok)
    coll = PaddedCollatorForActionPrediction(max_length=32, pad_token_id=TINY_LLM.pad_token_id)

    class _Batches:
        dataset_statistics = TINY_NORM_STATS

        def __iter__(self):
            frames = list(DummyDataset(bt, n=8, image_hw=(32, 32)))
            while True:
                yield coll(frames)

    monkeypatch.setattr(mat_mod, "get_vla_dataset_and_collator",
                        lambda *a, **k: (_Batches(), ActionTokenizer(tok), coll))

    finetune = _load("finetune")
    cfg = finetune.FinetuneConfig(
        vla_path=str(ckpt_dir), run_root_dir=str(tmp_path / "runs"),
        max_steps=10, save_steps=100, batch_size=8, learning_rate=5e-3,
        use_lora=True, lora_rank=2, use_quantization=True, image_aug=False,
        quantization_bits=qbits,
        shuffle_buffer_size=4, export_hf=True, trackers="jsonl",
    )
    finetune.main(cfg)

    run_dirs = list((tmp_path / "runs").iterdir())
    assert len(run_dirs) == 1
    run = run_dirs[0]
    names = {p.name for p in run.iterdir()}
    assert "config.json" in names and "dataset_statistics.json" in names
    ckpts = {p.name for p in (run / "checkpoints").iterdir()}
    assert any(n.startswith("step-") for n in ckpts), ckpts  # merged Orbax ckpt
    hf = run / "hf_export"
    assert (hf / "config.json").exists() and (hf / "model.safetensors").exists()
    jsonl = [p for p in run.iterdir() if p.suffix == ".jsonl"]
    assert jsonl, names
    lines = [json.loads(l) for p in jsonl for l in open(p) if l.strip()]
    assert any("train/loss" in l for l in lines)


@pytest.mark.slow
def test_train_script_main_end_to_end(tmp_path, monkeypatch):
    """scripts/train.py main() (the reference's primary entry point) on the
    debug VLA config with a tiny registry + injected dataset: mesh + sharded
    params -> donated jitted steps -> Orbax checkpoint with optimizer state +
    sidecars + jsonl metrics (reference vla-scripts/train.py:106-259)."""
    import dataclasses as dc

    from bridgelang_tpu.conf import VLAConfig
    from bridgelang_tpu.models.vision.vit import VIT_CONFIGS
    import bridgelang_tpu.models.llm.llama as llama_mod
    import bridgelang_tpu.vla.materialize as mat_mod
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer
    from bridgelang_tpu.vla.datasets.datasets import (
        DummyDataset,
        PaddedCollatorForActionPrediction,
        RLDSBatchTransform,
    )
    from tests.test_scripts import _load

    monkeypatch.setitem(VIT_CONFIGS, "siglip-vit-so400m", TINY_SINGLE_VIT)
    monkeypatch.setitem(llama_mod.LLM_CONFIGS, "llama2-7b-pure", TINY_LLM)
    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_SINGLE_VIT, dtype=dtype),
                                        TINY_SINGLE_VIT.width, TINY_SINGLE_VIT.num_patches),
    )
    monkeypatch.setattr(
        vlm_mod, "transform_config_for_backbone",
        lambda bid, strategy: ImageTransformConfig(strategy, (ImageTowerSpec(size=32),)))
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)

    tok = StubTokenizer()
    bt = RLDSBatchTransform(ActionTokenizer(tok), tok)
    coll = PaddedCollatorForActionPrediction(max_length=32, pad_token_id=TINY_LLM.pad_token_id)

    class _Batches:
        dataset_statistics = TINY_NORM_STATS

        def __iter__(self):
            frames = list(DummyDataset(bt, n=8, image_hw=(32, 32)))
            while True:
                yield coll(frames)

    monkeypatch.setattr(mat_mod, "get_vla_dataset_and_collator",
                        lambda *a, **k: (_Batches(), ActionTokenizer(tok), coll))

    train = _load("train")
    monkeypatch.setattr(train, "_load_tokenizer", lambda path=None: StubTokenizer())
    debug = dc.replace(VLAConfig.get("debug"), global_batch_size=8, per_device_batch_size=1,
                       expected_device_count=8)
    cfg = train.TrainConfig(vla=debug, run_root_dir=str(tmp_path / "runs"), run_id="e2e",
                            is_resume=False, max_steps_override=12, log_interval=5,
                            trackers="jsonl", seed=3)
    train.main(cfg)

    run = tmp_path / "runs" / "e2e"
    names = {p.name for p in run.iterdir()}
    assert "config.json" in names and "dataset_statistics.json" in names
    ckpts = {p.name for p in (run / "checkpoints").iterdir()}
    assert any(n.startswith("step-") for n in ckpts), ckpts
    jsonl = [p for p in run.iterdir() if p.suffix == ".jsonl"]
    assert jsonl, names
    lines = [json.loads(l) for p in jsonl for l in open(p) if l.strip()]
    assert any("train/loss" in l for l in lines)


def test_load_vla_quantize_int4(tmp_path, monkeypatch):
    """load_vla(quantize_int4=True): the reference's load_in_4bit analogue —
    decoder matrices come back packed ([in//2]) with group scales and the
    serving path still predicts."""
    from bridgelang_tpu.models.vision.vit import VIT_CONFIGS
    import bridgelang_tpu.models.llm.llama as llama_mod
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    model, params = _tiny_openvla()
    ckpt_dir = export_checkpoint(model, params, tmp_path / "ckpt")

    monkeypatch.setitem(VIT_CONFIGS, "siglip-vit-so400m", TINY_SINGLE_VIT)
    monkeypatch.setitem(llama_mod.LLM_CONFIGS, "llama2-7b-pure", TINY_LLM)
    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_SINGLE_VIT, dtype=dtype),
                                        TINY_SINGLE_VIT.width, TINY_SINGLE_VIT.num_patches))
    model2, params2 = load_mod.load_vla(str(ckpt_dir), dtype=jnp.float32, quantize_int4=True)
    model2.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
    model2.tokenizer = StubTokenizer()

    layers = params2["llm"]["layers"]
    assert layers["wq"].dtype == jnp.int8
    assert layers["wq"].shape[2] == TINY_LLM.n_heads * TINY_LLM.head_dim // 2  # out-paired packing
    assert "wq_scale4" in layers and "wq_scale" not in layers

    action = model2.predict_action(params2, random_image(40, 40), "stack the cups")
    assert action.shape == (7,) and np.isfinite(action).all()
