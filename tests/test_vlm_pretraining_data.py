"""VLM pretraining data layer: align/finetune datasets, LM collator,
modality-split batching, and an end-to-end align-stage train smoke."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.models.vision.vit import ViT
from bridgelang_tpu.models.vlm import IGNORE_INDEX, PrismaticVLM, VLMConfig
from bridgelang_tpu.preprocessing.datasets import (
    AlignDataset,
    FinetuneDataset,
    PaddedCollatorForLanguageModeling,
    SplitModalityBatcher,
)
from tests.helpers import TINY_LLM, TINY_VIT, StubTokenizer


@pytest.fixture(scope="module")
def llava_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("llava")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    examples = []
    for i in range(6):
        name = f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_dir / name)
        ex = {
            "image": name,
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is shown?"},
                {"from": "gpt", "value": f"A colorful pattern number {i}."},
            ],
        }
        examples.append(ex)
    # two text-only examples (unimodal co-training)
    for i in range(2):
        examples.append({
            "conversations": [
                {"from": "human", "value": "Say hi."},
                {"from": "gpt", "value": "hi there"},
            ],
        })
    chat = root / "chat.json"
    chat.write_text(json.dumps(examples))
    return chat, img_dir


def test_align_dataset(llava_data):
    chat, img_dir = llava_data
    ds = AlignDataset(chat, img_dir, StubTokenizer(), image_size=32)
    # text-only examples lack images -> align stage indexes only the first 6 safely
    ex = ds[0]
    assert ex["frames"].shape == (32, 32, 3)
    assert ex["labels"][0] == IGNORE_INDEX  # BOS unsupervised
    assert ex["input_ids"][-1] == 2  # EOS
    assert len(ds.get_modality_lengths()) == len(ds)


def test_finetune_dataset_supervises_gpt_turns_only(llava_data):
    chat, img_dir = llava_data
    ds = FinetuneDataset(chat, img_dir, StubTokenizer(), llm_family="llama2-pure", image_size=32)
    ex = ds[0]
    sup = ex["labels"] != IGNORE_INDEX
    assert sup.any() and not sup.all()
    assert ex["multimodal"] is True
    ex_text = ds[6]
    assert ex_text["multimodal"] is False and ex_text["frames"] is None


def test_collator_multimodal_indices(llava_data):
    chat, img_dir = llava_data
    ds = FinetuneDataset(chat, img_dir, StubTokenizer(), image_size=32)
    coll = PaddedCollatorForLanguageModeling(max_length=64, pad_token_id=512, image_hw=(32, 32))
    batch = coll([ds[0], ds[6]])
    assert batch["input_ids"].shape == (2, 64)
    assert list(batch["multimodal_indices"]) == [0]
    assert batch["frames"][1].sum() == 0  # dummy pixels for the unimodal row


def test_split_modality_batcher(llava_data):
    chat, img_dir = llava_data
    ds = FinetuneDataset(chat, img_dir, StubTokenizer(), image_size=32)
    batcher = SplitModalityBatcher(ds.get_modality_lengths(), batch_size=2, seed=0)
    batches = batcher.batches(epoch=0)
    lengths = ds.get_modality_lengths()
    for b in batches:
        mods = {lengths[i][0] for i in b}
        assert len(mods) == 1, "batch mixes modalities"
    # process sharding: two processes see disjoint batches
    b0 = SplitModalityBatcher(lengths, 2, seed=0, process_index=0, process_count=2).batches(0)
    b1 = SplitModalityBatcher(lengths, 2, seed=0, process_index=1, process_count=2).batches(0)
    assert not (set(map(tuple, b0)) & set(map(tuple, b1)))


def test_align_stage_training_smoke(llava_data):
    chat, img_dir = llava_data
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer, make_vla_train_step

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    ds = AlignDataset(chat, img_dir, StubTokenizer(), image_size=32)
    coll = PaddedCollatorForLanguageModeling(max_length=48, pad_token_id=TINY_LLM.pad_token_id, image_hw=(32, 32))
    batch = coll([ds[i] for i in range(4)])
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "multimodal_indices"}

    mask = model.trainable_mask(params, "align")
    optimizer = make_optimizer(OptimConfig(learning_rate=5e-3), params, trainable_mask=mask)
    step = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=mask,
                                       compute_dtype=jnp.float32, image_transform=model.image_transform))
    state = init_train_state(params, optimizer, trainable_mask=mask)
    state, m0 = step(state, jb)
    for _ in range(8):
        state, m = step(state, jb)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


@pytest.mark.slow
def test_pretrain_script_main_end_to_end(tmp_path, monkeypatch):
    """scripts/pretrain.py main() (align stage) end to end: registry model
    with tiny overrides, injected LLaVA-style data, modality-split batching,
    donated jitted steps on the virtual mesh, checkpoint + sidecars + jsonl
    (reference scripts/pretrain.py:117-238)."""
    from PIL import Image as PILImage

    import bridgelang_tpu.models.llm.llama as llama_mod
    import bridgelang_tpu.models.llm.tokenizer as tok_mod
    import bridgelang_tpu.preprocessing as prep_mod
    from bridgelang_tpu.conf import DatasetConfig, ModelConfig
    from tests.test_scripts import _load

    # tiny LLaVA-style corpus: 16 image-text pairs
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    examples = []
    for i in range(16):
        name = f"img{i}.jpg"
        PILImage.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_dir / name)
        examples.append({"image": name, "conversations": [
            {"from": "human", "value": "<image>\nWhat is shown?"},
            {"from": "gpt", "value": f"Pattern {i}."},
        ]})
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(examples))

    monkeypatch.setitem(llama_mod.LLM_CONFIGS, "llama2-7b-pure", TINY_LLM)
    monkeypatch.setattr(
        vlm_mod, "build_vision_backbone",
        lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches))
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    monkeypatch.setattr(
        vlm_mod, "transform_config_for_backbone",
        lambda bid, strategy: ImageTransformConfig(strategy, (ImageTowerSpec(size=32),)))
    monkeypatch.setattr(tok_mod, "get_tokenizer", lambda path=None: StubTokenizer())
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)

    def fake_get_dataset_and_collator(stage, dataset_cfg, tokenizer, llm_family, **kw):
        assert stage == "align"
        ds = AlignDataset(chat, img_dir, StubTokenizer(), image_size=32)
        coll = PaddedCollatorForLanguageModeling(
            max_length=48, pad_token_id=TINY_LLM.pad_token_id, image_hw=(32, 32))
        return ds, coll

    monkeypatch.setattr(prep_mod, "get_dataset_and_collator", fake_get_dataset_and_collator)

    pretrain = _load("pretrain")
    m = dataclasses.replace(ModelConfig.get("prism-dinosiglip-224px+7b"),
                            align_epochs=8, align_global_batch_size=8,
                            align_per_device_batch_size=1)
    cfg = pretrain.PretrainConfig(model=m, dataset=DatasetConfig.get("llava-v15"),
                                  stage="align", run_root_dir=str(tmp_path / "runs"),
                                  run_id="e2e", max_steps_override=12, trackers="jsonl", seed=3)
    pretrain.main(cfg)

    run = tmp_path / "runs" / "e2e"
    names = {p.name for p in run.iterdir()}
    assert "config.json" in names
    ckpts = {p.name for p in (run / "checkpoints").iterdir()}
    assert any(n.startswith("step-") for n in ckpts), ckpts
    jsonl = [p for p in run.iterdir() if p.suffix == ".jsonl"]
    assert jsonl, names
    lines = [json.loads(l) for l in open(jsonl[0]) if l.strip()]
    assert any("train/loss" in l for l in lines)
