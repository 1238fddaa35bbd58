"""LoRA / metrics / checkpointing component tests."""

import pytest
import json

import jax
import jax.numpy as jnp
import numpy as np

from bridgelang_tpu.models.llm.llama import embed_tokens, init_llm_params, llm_forward, lm_logits
from bridgelang_tpu.training.checkpointing import (
    CheckpointManager,
    checkpoint_name,
    parse_checkpoint_name,
    save_sidecars,
    validate_resume,
)
from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask, merge_lora, split_lora
from bridgelang_tpu.training.metrics import JSONLinesTracker, Metrics, VLAMetrics
from bridgelang_tpu.training.trainer import OptimConfig, TrainState, init_train_state, make_lr_schedule, make_optimizer
from tests.helpers import TINY_LLM


def _causal(b, t):
    m = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    return jnp.broadcast_to(m[None, None], (b, 1, t, t))


def _fwd(params, ids):
    x = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    h, _ = llm_forward(params, TINY_LLM, x, pos, _causal(*ids.shape))
    return lm_logits(params, h, TINY_LLM)


def test_lora_zero_init_is_identity():
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    ids = jnp.asarray([[1, 5, 9, 12]], dtype=jnp.int32)
    base_out = _fwd(params, ids)
    lora_params = add_lora_params(jax.random.key(1), params, rank=4)
    lora_out = _fwd(lora_params, ids)
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out), atol=1e-6)


def test_lora_changes_output_after_b_update_and_merge_matches():
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    lora_params = add_lora_params(jax.random.key(1), params, rank=4)
    # Simulate a training update on B
    layers = dict(lora_params["layers"])
    layers["wq_lora_b"] = layers["wq_lora_b"] + 0.05
    lora_params = dict(lora_params, layers=layers)

    ids = jnp.asarray([[1, 5, 9, 12]], dtype=jnp.int32)
    adapted = _fwd(lora_params, ids)
    base = _fwd(params, ids)
    assert not np.allclose(np.asarray(adapted), np.asarray(base))

    merged = merge_lora(lora_params)
    assert "wq_lora_a" not in merged["layers"]
    merged_out = _fwd(merged, ids)
    np.testing.assert_allclose(np.asarray(merged_out), np.asarray(adapted), atol=1e-4)


def test_lora_merge_int8_base_applies_scales():
    """QLoRA-analogue merge: int8 base weights dequantize (codes * scale)
    before the delta add and requantize after (ADVICE.md — round 1 added fp32
    deltas to raw int8 codes, corrupting every exported checkpoint)."""
    from bridgelang_tpu.ops.quant import dequantize_llm_int8, quantize_llm_int8

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    qparams = quantize_llm_int8(params)
    lora_q = add_lora_params(jax.random.key(1), qparams, rank=4)
    layers = dict(lora_q["layers"])
    layers["wq_lora_b"] = layers["wq_lora_b"] + 0.05
    lora_q = dict(lora_q, layers=layers)

    merged_q = merge_lora(lora_q)
    assert merged_q["layers"]["wq"].dtype == jnp.int8
    assert "wq_lora_a" not in merged_q["layers"]

    # Ground truth: merge in float on the dequantized base.
    deq = dequantize_llm_int8(qparams, dtype=jnp.float32)
    lora_f = dict(deq, layers=dict(deq["layers"],
                                   wq_lora_a=layers["wq_lora_a"], wq_lora_b=layers["wq_lora_b"]))
    expect = merge_lora(lora_f)["layers"]["wq"]

    got = dequantize_llm_int8(merged_q, dtype=jnp.float32)["layers"]["wq"]
    # requantization error only: bounded by one int8 step of the new absmax
    step = np.abs(np.asarray(expect)).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(np.asarray(got) - np.asarray(expect)) <= step + 1e-6).all()
    # un-adapted matrices keep their original codes + scales
    np.testing.assert_array_equal(np.asarray(merged_q["layers"]["wk"]), np.asarray(qparams["layers"]["wk"]))
    np.testing.assert_array_equal(np.asarray(merged_q["layers"]["wk_scale"]), np.asarray(qparams["layers"]["wk_scale"]))


def test_lora_trainable_mask_selects_only_adapters():
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    lora_params = add_lora_params(jax.random.key(1), params, rank=4)
    mask = lora_trainable_mask(lora_params)
    assert mask["layers"]["wq_lora_a"] is True
    assert mask["layers"]["wq"] is False
    assert mask["embed"] is False
    base, adapters = split_lora(lora_params)
    assert set(adapters["layers"]) == {n for n in lora_params["layers"] if "_lora_" in n}


def test_lr_schedules():
    c = make_lr_schedule(OptimConfig(learning_rate=1e-4, lr_scheduler_type="constant"))
    assert float(c(0)) == 1e-4 and float(c(10_000)) == 1e-4
    w = make_lr_schedule(OptimConfig(learning_rate=1e-4, lr_scheduler_type="linear-warmup+cosine-decay",
                                     warmup_ratio=0.1, total_steps=1000))
    assert float(w(0)) == 0.0
    assert abs(float(w(100)) - 1e-4) < 1e-9  # peak after warmup
    assert float(w(1000)) < 1e-5  # decayed


def test_jsonl_tracker_and_metrics(tmp_path):
    tr = JSONLinesTracker("run1", tmp_path)
    tr.write_hyperparameters({"lr": 1e-4})
    m = VLAMetrics([tr], "run1", window_size=4)
    for step in range(3):
        m.commit(global_step=step, lr=1e-4, loss=2.0 - step * 0.5, action_accuracy=0.5, l1_loss=0.1)
        m.commit_for_dataset("bridge_orig", action_accuracy=0.6)
        status = m.push()
    assert "Loss" in status and "Acc" in status
    m.finalize()
    lines = [json.loads(l) for l in open(tmp_path / "run1.jsonl")]
    assert any("train/loss" in l for l in lines)
    assert any("train-bridge_orig/action_accuracy" in l for l in lines)


def test_checkpoint_roundtrip(tmp_path):
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    opt = make_optimizer(OptimConfig(), params)
    state = init_train_state(params, opt)
    mgr = CheckpointManager(tmp_path)
    path = mgr.save(state, step=100, epoch=1, loss=0.1234)
    assert path.name == "step-000100-epoch-01-loss=0.1234"
    assert mgr.latest() == path

    # Restore into an abstract target with the same structure
    restored = mgr.restore(path, state)
    np.testing.assert_allclose(
        np.asarray(restored.params["layers"]["wq"]), np.asarray(state.params["layers"]["wq"])
    )
    assert int(restored.step) == 0  # step counter round-trips

    validate_resume(path, 100, 1)
    try:
        validate_resume(path, 99, 1)
        raise RuntimeError("should have failed")
    except AssertionError:
        pass

    # packed-int4 layout tripwire: a run recorded under a different byte
    # layout must refuse to resume (weights would be silently row-permuted)
    import json as _json

    from bridgelang_tpu.training.checkpointing import save_sidecars

    save_sidecars(tmp_path, {"use_quantization": True, "quantization_bits": 4})
    with open(tmp_path / "config.json") as f:
        cfg = _json.load(f)
    from bridgelang_tpu.ops.quant import INT4_PACK_LAYOUT

    assert cfg["int4_pack_layout"] == INT4_PACK_LAYOUT
    validate_resume(path, 100, 1)  # matching layout: fine
    cfg["int4_pack_layout"] = "adjacent-rows/v0"
    with open(tmp_path / "config.json", "w") as f:
        _json.dump(cfg, f)
    try:
        validate_resume(path, 100, 1)
        raise RuntimeError("should have failed")
    except ValueError as e:
        assert "pack layout" in str(e)

    # shard-blocked packing IS a different byte layout: the sidecar tag must
    # carry the pack shard count, and a recorded tag that disagrees with the
    # recorded shard count (hand-edited config / cross-build artifact) must
    # refuse to resume.
    from bridgelang_tpu.ops.quant import pack_layout_tag

    save_sidecars(tmp_path, {"use_quantization": True, "quantization_bits": 4,
                             "int4_shards": 2})
    with open(tmp_path / "config.json") as f:
        cfg = _json.load(f)
    assert cfg["int4_pack_layout"] == pack_layout_tag(2) != INT4_PACK_LAYOUT
    validate_resume(path, 100, 1)  # self-consistent: fine
    cfg["int4_shards"] = 1  # now claims global pairing but bytes are blocked
    with open(tmp_path / "config.json", "w") as f:
        _json.dump(cfg, f)
    try:
        validate_resume(path, 100, 1)
        raise RuntimeError("should have failed")
    except ValueError as e:
        assert "pack layout" in str(e)


def test_checkpoint_name_parse():
    assert parse_checkpoint_name(checkpoint_name(2500, 3, 0.5)) == (2500, 3, 0.5)


def test_sidecars(tmp_path):
    save_sidecars(tmp_path, {"vla_id": "debug"}, {"bridge_orig": {"action": {"q01": [0.0]}}})
    assert json.load(open(tmp_path / "config.json"))["vla_id"] == "debug"
    assert "bridge_orig" in json.load(open(tmp_path / "dataset_statistics.json"))


def test_int8_quantized_forward_close_to_fp():
    from bridgelang_tpu.ops.quant import quantize_llm_int8

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    qparams = quantize_llm_int8(params)
    assert qparams["layers"]["wq"].dtype == jnp.int8
    assert qparams["embed"].dtype == jnp.int8
    ids = jnp.asarray([[1, 5, 9, 12, 44, 101]], dtype=jnp.int32)
    base = np.asarray(_fwd(params, ids), dtype=np.float32)
    quant = np.asarray(_fwd(qparams, ids), dtype=np.float32)
    # int8 weight-only should track the fp forward closely in direction
    denom = np.linalg.norm(base) + 1e-6
    rel = np.linalg.norm(base - quant) / denom
    assert rel < 0.1, f"relative error {rel}"
    # argmax over logits mostly agrees
    agree = (base.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.5


def test_int8_init_structure():
    from bridgelang_tpu.ops.quant import init_llm_params_int8

    qp = init_llm_params_int8(jax.random.key(1), TINY_LLM)
    assert qp["layers"]["w_down"].dtype == jnp.int8
    assert qp["layers"]["w_down_scale"].shape == (TINY_LLM.n_layers, 1, TINY_LLM.dim)
    ids = jnp.asarray([[1, 3, 7]], dtype=jnp.int32)
    out = _fwd(qp, ids)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_profiling_utils():
    from bridgelang_tpu.util.profiling import StepTimer, annotate, device_memory_stats

    t = StepTimer()
    with annotate("test_phase"):
        x = jnp.ones((8, 8)) * 2
    dt = t.tick(sync_on=x)
    assert dt >= 0
    assert t.avg is not None
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_noop_filter():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from experiments.robot.libero.regenerate_libero_dataset import is_noop

    assert is_noop(np.array([0, 0, 0, 0, 0, 0, -1.0]))
    assert not is_noop(np.array([0.1, 0, 0, 0, 0, 0, -1.0]))
    # gripper change alone is NOT a no-op
    assert not is_noop(np.array([0, 0, 0, 0, 0, 0, 1.0]), np.array([0, 0, 0, 0, 0, 0, -1.0]))


def test_sidecar_handles_numpy_statistics(tmp_path):
    stats = {"ds": {"action": {"q01": np.array([-0.1, 0.2]), "mask": np.array([True, False]),
                               "mean": np.float32(0.5)},
                    "num_transitions": np.int64(100)}}
    save_sidecars(tmp_path, {"a": 1}, stats)
    loaded = json.load(open(tmp_path / "dataset_statistics.json"))
    assert loaded["ds"]["action"]["q01"] == [-0.10000000149011612, 0.20000000298023224] or \
        abs(loaded["ds"]["action"]["q01"][0] + 0.1) < 1e-6
    assert loaded["ds"]["action"]["mask"] == [True, False]


def test_checkpoint_retention(tmp_path):
    params = init_llm_params(jax.random.key(0), TINY_LLM)
    opt = make_optimizer(OptimConfig(), params)
    state = init_train_state(params, opt)
    mgr = CheckpointManager(tmp_path, keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(state, step=step, epoch=0, loss=0.5)
    remaining = sorted(p.name for p in (tmp_path / "checkpoints").glob("step-*"))
    assert len(remaining) == 2
    assert remaining[-1].startswith("step-000004")


def test_w8a8_forward_close_to_w8():
    import dataclasses

    from bridgelang_tpu.models.llm.llama import llm_forward as _llmf
    from bridgelang_tpu.ops.quant import quantize_llm_int8

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    qparams = quantize_llm_int8(params)
    cfg8 = dataclasses.replace(TINY_LLM, w8a8=True)
    ids = jnp.asarray([[1, 5, 9, 12, 44, 101]], dtype=jnp.int32)

    def fwd(cfg, p):
        x = embed_tokens(p, ids)
        pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
        h, _ = _llmf(p, cfg, x, pos, _causal(*ids.shape))
        return np.asarray(lm_logits(p, h, cfg), dtype=np.float32)

    w8 = fwd(TINY_LLM, qparams)
    w8a8 = fwd(cfg8, qparams)
    rel = np.linalg.norm(w8 - w8a8) / (np.linalg.norm(w8) + 1e-6)
    assert rel < 0.15, f"w8a8 drifted {rel}"
    assert (w8.argmax(-1) == w8a8.argmax(-1)).mean() >= 0.5


def test_chunked_ce_matches_dense():
    import dataclasses

    from bridgelang_tpu.training.trainer import chunked_ce_and_metrics, cross_entropy_ignore_index, vla_metrics_on_device
    from bridgelang_tpu.vla.action_tokenizer import make_bins

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    rng = np.random.default_rng(0)
    b, f, d = 2, 37, TINY_LLM.dim  # deliberately not a multiple of the chunk
    hidden = jnp.asarray(rng.normal(size=(b, f, d)), jnp.float32)
    labels = np.full((b, f), -100, np.int32)
    labels[:, 20:28] = rng.integers(TINY_LLM.vocab_size - 256, TINY_LLM.vocab_size, (b, 8))
    labels[:, 10:14] = rng.integers(2, 400, (b, 4))
    labels = jnp.asarray(labels)
    _, centers = make_bins()
    begin = TINY_LLM.vocab_size - 257

    logits = lm_logits(params, hidden, TINY_LLM)
    dense_loss = cross_entropy_ignore_index(logits, labels)
    dense_m = vla_metrics_on_device(logits, labels, begin, centers, TINY_LLM.vocab_size)

    loss, m = chunked_ce_and_metrics(params, TINY_LLM, hidden, labels, begin, centers, chunk=16)
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=1e-5)
    np.testing.assert_allclose(float(m["action_accuracy"]), float(dense_m["action_accuracy"]), atol=1e-6)
    np.testing.assert_allclose(float(m["l1_loss"]), float(dense_m["l1_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m["per_example_accuracy"]),
                               np.asarray(dense_m["per_example_accuracy"]), atol=1e-6)

    # gradients flow through the chunked path
    g = jax.grad(lambda h: chunked_ce_and_metrics(params, TINY_LLM, h, labels, begin, centers, chunk=16)[0])(hidden)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_remat_policy_matches_full_remat():
    """remat_policy='dots' (save matmul outputs) must be numerically identical
    to full recompute — it only changes WHAT the backward recomputes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bridgelang_tpu.models.llm.llama import LLMConfig, init_llm_params, llm_forward

    cfg = LLMConfig(vocab_size=64, padded_vocab_size=128, dim=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, intermediate_size=64, max_seq_len=32, pad_token_id=64)
    params = init_llm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(16), (2, 16))
    mask = (jnp.arange(16)[None, :] <= jnp.arange(16)[:, None])[None, None]

    def loss(params, policy):
        h, _ = llm_forward(params, cfg, x, pos, mask, remat=True, remat_policy=policy)
        return jnp.sum(h ** 2)

    l_full, g_full = jax.value_and_grad(lambda p: loss(p, None))(params)
    l_dots, g_dots = jax.value_and_grad(lambda p: loss(p, "dots"))(params)
    assert float(l_full) == float(l_dots)
    for a, b in zip(jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_qlora_train_step_int8_base_full_remat():
    """The QLoRA analogue at the bench/finetune wiring: int8 frozen base +
    LoRA adapters as the ONLY trainable leaves, full-remat activations, bf16
    grads. Loss must drop on a repeated batch, the int8 base and its scales
    must stay bit-identical, and only adapter leaves may change
    (scripts/finetune.py --use_quantization; bench.py _lora_bench)."""
    import dataclasses

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.ops.quant import init_llm_params_int8
    from bridgelang_tpu.training.trainer import make_vla_train_step
    from tests.helpers import TINY_VIT

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    params = dict(params, llm=add_lora_params(
        jax.random.key(1), init_llm_params_int8(jax.random.key(2), TINY_LLM), rank=4))
    mask = lora_trainable_mask(params)
    optimizer = make_optimizer(OptimConfig(learning_rate=5e-2, lr_scheduler_type="constant"),
                               params, trainable_mask=mask)
    # donate_argnums=0 is the production pattern (scripts/finetune.py): the
    # old state's buffers are reused for the new state, halving peak memory.
    step = jax.jit(make_vla_train_step(model, optimizer, trainable_mask=mask,
                                       compute_dtype=jnp.float32, grad_dtype=jnp.bfloat16,
                                       remat_policy="full"),
                   donate_argnums=0)
    state = init_train_state(params, optimizer, trainable_mask=mask)

    rng = np.random.default_rng(0)
    b, t = 2, 16
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    msk = np.zeros((b, t), np.int32)
    lbl = np.full((b, t), -100, np.int32)
    for i in range(b):
        ids[i, 0] = 1
        ids[i, 1:8] = rng.integers(3, 400, 7)
        ids[i, 8:12] = rng.integers(TINY_LLM.vocab_size - 256, TINY_LLM.vocab_size, 4)
        msk[i, :12] = 1
        lbl[i, 8:12] = ids[i, 8:12]
    batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(msk),
             "labels": jnp.asarray(lbl),
             "pixel_values": jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32)}

    # Donation deletes the input buffers — snapshot to host numpy first.
    flat0 = {p: np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(state.params["llm"])}
    state, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"]), "adapters should overfit a repeated batch"
    flat1 = dict(jax.tree_util.tree_leaves_with_path(state.params["llm"]))
    changed = {jax.tree_util.keystr(p): not np.array_equal(np.asarray(flat0[p]), np.asarray(v))
               for p, v in flat1.items()}
    assert any(c for k, c in changed.items() if "_lora_b" in k), "adapter B must train"
    for k, c in changed.items():
        if "_lora_" not in k:
            assert not c, f"frozen base leaf {k} changed"


def test_donated_step_checkpoint_save_interplay(tmp_path):
    """The production loop donates the train state AND saves checkpoints
    between steps (scripts/finetune.py): the synchronous save must have
    materialized the bytes before the next donated step reuses the buffers,
    so a restore after further (donating) steps returns the SAVED values."""
    from functools import partial

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    opt = make_optimizer(OptimConfig(learning_rate=1e-2), params)
    state = init_train_state(params, opt)

    @partial(jax.jit, donate_argnums=0)
    def step(state):
        return TrainState(step=state.step + 1,
                          params=jax.tree.map(lambda p: p * 0.9, state.params),
                          opt_state=state.opt_state)

    state = step(state)
    expected_wq = np.asarray(state.params["layers"]["wq"])  # host copy pre-donation
    mgr = CheckpointManager(tmp_path)
    path = mgr.save(state, step=1, epoch=0, loss=1.0)
    state = step(state)  # donates (invalidates) the buffers just saved
    state = step(state)
    restored = mgr.restore(path, state)
    np.testing.assert_allclose(np.asarray(restored.params["layers"]["wq"]), expected_wq)
    # and the live state kept training past the save
    np.testing.assert_allclose(np.asarray(state.params["layers"]["wq"]),
                               expected_wq * 0.81, rtol=1e-6)


def test_int4_pack_roundtrip_and_dequant_groups():
    from bridgelang_tpu.ops.quant import INT4_GROUP, dequant_int4, pack_int4, unpack_int4, _quantize4_2d

    rng = np.random.default_rng(0)
    codes = rng.integers(-8, 8, size=(6, 256, 10)).astype(np.int8)
    packed = pack_int4(jnp.asarray(codes))
    assert packed.shape == (6, 256, 5) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), codes)

    w = rng.normal(size=(256, 12)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
    assert q4.shape == (256, 6) and s4.shape == (2, 12)
    deq = np.asarray(dequant_int4(q4, s4, dtype=jnp.float32))
    # error bounded by half an int4 step of each group's absmax
    step = np.abs(w).reshape(2, 128, 12).max(axis=1, keepdims=True) / 7.0
    bound = np.repeat(step, 128, axis=1).reshape(256, 12)
    assert (np.abs(deq - w) <= bound * 0.5 + 1e-5).all()


def test_int4_pallas_matmul_matches_dequant_reference():
    """The fused kernel (interpret mode on CPU) is numerically equivalent to
    the XLA dequant-then-dot fallback — same codes, same group scales."""
    from bridgelang_tpu.ops.int4_matmul import int4_kernel_eligible, matmul_int4
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    rng = np.random.default_rng(3)
    K, N = 512, 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
    assert int4_kernel_eligible(K, N, s4.shape[0])
    ref_w = np.asarray(dequant_int4(q4, s4, dtype=jnp.float32))
    for M in (1, 8, 48):  # sub-tile (padded), tile, multi-row
        x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
        out = np.asarray(matmul_int4(x, q4, s4), dtype=np.float32)
        ref = np.asarray(x, dtype=np.float32) @ ref_w
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2 * np.abs(ref).max())
    # leading batch dims route through the same kernel
    x3 = jnp.asarray(rng.normal(size=(2, 3, K)), dtype=jnp.bfloat16)
    out3 = matmul_int4(x3, q4, s4)
    assert out3.shape == (2, 3, N)
    np.testing.assert_allclose(
        np.asarray(out3, np.float32).reshape(6, N),
        np.asarray(matmul_int4(x3.reshape(6, K), q4, s4), np.float32),
        rtol=1e-6)
    # unaligned shapes fall back to the dequant path (tiny test configs)
    w_small = rng.normal(size=(64, 32)).astype(np.float32)
    q_s, s_s = _quantize4_2d(jnp.asarray(w_small), group=32)
    assert not int4_kernel_eligible(64, 32, s_s.shape[0])
    x_s = jnp.asarray(rng.normal(size=(2, 64)), dtype=jnp.bfloat16)
    out_s = matmul_int4(x_s, q_s, s_s)
    assert out_s.shape == (2, 32)


def test_int4_prefill_shape_pads_rows_and_tiles_groups():
    """Prefill-sized M routes through the multi-block path: the tile chooser
    may pick a block_m that does NOT divide M (rows are padded, then sliced
    off) and a kg > 1 (several 128-row quantization groups per grid step —
    the DMA-amortization lever added after 7B decode measured grid-overhead-
    bound at one group/step). Both paths must stay numerically equivalent to
    the dequant reference."""
    from bridgelang_tpu.ops.int4_matmul import GROUP, _choose_tiles, matmul_int4, matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    rng = np.random.default_rng(7)
    K, N, M = 256, 512, 300  # n_g=2, packed_w=256; M=300 forces multi-block + row padding
    tiles = _choose_tiles(M, N // 2, K // GROUP, 32, 4, True)
    assert tiles is not None
    block_m, _block_n, kg, m_eff = tiles
    assert m_eff >= M and m_eff % block_m == 0
    assert M % block_m != 0 or kg > 1  # the test exercises at least one new path

    w = rng.normal(size=(K, N)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=GROUP)
    ref_w = np.asarray(dequant_int4(q4, s4, dtype=jnp.float32))
    x = jnp.asarray(rng.normal(size=(1, M, K)), dtype=jnp.bfloat16)
    ref = np.asarray(x, np.float32).reshape(M, K) @ ref_w
    out = np.asarray(matmul_int4(x, q4, s4), np.float32).reshape(M, N)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2 * np.abs(ref).max())
    out8 = np.asarray(matmul_int4_a8(x, q4, s4), np.float32).reshape(M, N)
    np.testing.assert_allclose(out8, ref, rtol=5e-2, atol=5e-2 * np.abs(ref).max())


def test_int4_tuned_decode_tiles_are_valid():
    """The measured-best decode tile table (_TUNED_DECODE_TILES, from
    scripts/sweep_int4_tiles.py on the real chip) must stay consistent with
    the kernel's tiling contract as the kernel evolves: every entry's block_n
    must tile the packed half-width, kg must tile the group count, the tile
    must fit the VMEM budget, and the chooser must actually return it for
    decode-M a8 calls. Catches table drift (e.g. a GROUP change) at CPU-test
    time instead of as a Mosaic compile error on the chip."""
    from bridgelang_tpu.ops.int4_matmul import (
        _TUNED_DECODE_TILES,
        _VMEM_BUDGET,
        _choose_tiles,
    )

    flagship = {(128, 40, 2560), (128, 40, 6912), (128, 108, 2560),
                (128, 32, 2048), (128, 32, 5504), (128, 86, 2048)}
    assert flagship <= set(_TUNED_DECODE_TILES), "flagship decode shapes must stay tuned"
    for (group, n_g, packed_w), (bn, kg) in _TUNED_DECODE_TILES.items():
        assert packed_w % bn == 0, (group, n_g, packed_w)
        assert n_g % kg == 0, (group, n_g, packed_w)
        tile_b = kg * group * bn
        assert 2 * tile_b + 8 * 8 * bn <= _VMEM_BUDGET, (group, n_g, packed_w)
        picked = _choose_tiles(8, packed_w, n_g, 8, 4, True, group=group)
        assert picked == (8, bn, kg, 8), (group, n_g, packed_w, picked)


def test_int4_a8_matmul_matches_integer_reference():
    """The w4a8 kernel (int8 MXU dots + exact int32 nibble recovery) must
    match an XLA emulation of the same math: quantize x per-token to int8,
    integer-dot against the dequantized codes, re-apply the token scale."""
    from bridgelang_tpu.ops.int4_matmul import int4_kernel_eligible, matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    rng = np.random.default_rng(7)
    K, N = 512, 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
    assert int4_kernel_eligible(K, N, s4.shape[0])
    ref_w = np.asarray(dequant_int4(q4, s4, dtype=jnp.float32))
    for M in (1, 32, 48):  # sub-tile (padded to the int8 sublane tile), tile, multi
        x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
        out = np.asarray(matmul_int4_a8(x, q4, s4), dtype=np.float32)
        xf = np.asarray(x, np.float32)
        xs = np.abs(xf).max(-1, keepdims=True) / 127.0
        xs[xs == 0] = 1.0
        qx = np.round(xf / xs)
        ref = (qx @ ref_w) * xs
        # integer path is exact; tolerance is the final cast to x.dtype (bf16)
        np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2 * np.abs(ref).max())
        # and a8 stays close to the bf16-activation truth (int8 act noise only)
        np.testing.assert_allclose(out, xf @ ref_w, rtol=3e-2, atol=3e-2 * np.abs(xf @ ref_w).max())
    # leading batch dims + ineligible-shape fallback keep a8 semantics
    x3 = jnp.asarray(rng.normal(size=(2, 3, K)), dtype=jnp.bfloat16)
    assert matmul_int4_a8(x3, q4, s4).shape == (2, 3, N)
    w_small = rng.normal(size=(64, 32)).astype(np.float32)
    q_s, s_s = _quantize4_2d(jnp.asarray(w_small), group=32)
    assert not int4_kernel_eligible(64, 32, s_s.shape[0])
    out_s = np.asarray(matmul_int4_a8(jnp.asarray(rng.normal(size=(2, 64)), jnp.bfloat16), q_s, s_s))
    assert out_s.shape == (2, 32) and np.isfinite(out_s).all()


def test_int4_a8_forward_close_to_bf16_kernel():
    """cfg.w8a8 routes the int4 base through the a8 kernel (llama.py::proj);
    logits must stay close to the bf16-dot int4 forward."""
    import dataclasses

    from bridgelang_tpu.ops.quant import quantize_llm_int4

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    q4 = quantize_llm_int4(params, group=32)
    ids = jnp.asarray([[1, 5, 9, 12, 44, 101]], dtype=jnp.int32)
    cfg_a8 = dataclasses.replace(TINY_LLM, w8a8=True)

    def fwd(cfg):
        x = embed_tokens(q4, ids)
        pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
        h, _ = llm_forward(q4, cfg, x, pos, _causal(*ids.shape))
        return lm_logits(q4, h, cfg)

    out_bf = np.asarray(fwd(TINY_LLM), np.float32)
    out_a8 = np.asarray(fwd(cfg_a8), np.float32)
    assert np.isfinite(out_a8).all()
    rel = np.linalg.norm(out_a8 - out_bf) / (np.linalg.norm(out_bf) + 1e-6)
    assert rel < 0.1, f"a8 vs bf16-dot relative error {rel}"


def test_int4_matmul_custom_vjp_matches_dequant_grad():
    """d/dx of the kernel path equals d/dx through the XLA dequant reference
    (both the aligned Pallas route and the tiny-shape fallback)."""
    from bridgelang_tpu.ops.int4_matmul import matmul_int4
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    rng = np.random.default_rng(7)
    for K, N, group in ((512, 256, 128), (64, 32, 32)):  # kernel + fallback
        w = rng.normal(size=(K, N)).astype(np.float32)
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=group)
        x = jnp.asarray(rng.normal(size=(4, K)), dtype=jnp.float32)
        co = jnp.asarray(rng.normal(size=(4, N)), dtype=jnp.float32)

        g_kernel = jax.grad(lambda x: jnp.sum(matmul_int4(x, q4, s4) * co))(x)
        g_ref = jax.grad(lambda x: jnp.sum((x @ dequant_int4(q4, s4, jnp.float32)) * co))(x)
        np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_lora_over_int4_base_trains_and_merges():
    """QLoRA over a packed-int4 frozen base (scripts/finetune.py
    --quantization_bits 4): adapters get FULL input dims despite the packed
    storage, grads flow through the int4 matmul into the adapters, and
    merge_lora requantizes group-wise so the merged model matches the
    adapter model."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4
    from bridgelang_tpu.training.lora import add_lora_params, lora_trainable_mask, merge_lora

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    q4 = quantize_llm_int4(params, group=32)
    lora = add_lora_params(jax.random.key(1), q4, rank=2)
    D, I = TINY_LLM.dim, TINY_LLM.intermediate_size
    assert lora["layers"]["w_gate_lora_a"].shape == (TINY_LLM.n_layers, D, 2)
    assert lora["layers"]["w_down_lora_a"].shape == (TINY_LLM.n_layers, I, 2)

    mask = lora_trainable_mask(lora)
    assert jax.tree_util.tree_reduce(
        lambda a, b: a + b, jax.tree_util.tree_map(int, mask)) == 14  # 7 targets x a,b

    ids = jnp.asarray([[1, 5, 9, 12]], dtype=jnp.int32)

    def loss(p):
        return jnp.sum(jnp.abs(_fwd(p, ids).astype(jnp.float32)))

    grads = jax.grad(loss, allow_int=True)(lora)  # int leaves -> float0 (as the trainer partitions)
    # B = 0 at init, so dL/dA == 0 exactly; dL/dB = (x@A)^T g flows through
    # the int4 matmul's custom VJP and must be nonzero.
    gb = np.asarray(grads["layers"]["w_gate_lora_b"], dtype=np.float32)
    assert np.isfinite(gb).all() and np.abs(gb).sum() > 0

    # make adapters nonzero, then merge: in WEIGHT space the merged packed
    # base must equal dequant(base) + A@B up to the requantization step
    # (output-space comparison would compound int4 noise across layers)
    from bridgelang_tpu.ops.quant import dequant_int4

    bumped = dict(lora, layers={
        k: (v + 0.05 if k.endswith("_lora_b") else v) for k, v in lora["layers"].items()})
    merged = merge_lora(bumped)
    assert "w_gate_lora_a" not in merged["layers"]
    assert merged["layers"]["w_gate"].shape[2] == I // 2  # still packed (out-paired)
    base_w = np.asarray(dequant_int4(q4["layers"]["w_gate"], q4["layers"]["w_gate_scale4"], jnp.float32))
    delta = np.einsum("lir,lro->lio",
                      np.asarray(bumped["layers"]["w_gate_lora_a"], np.float32),
                      np.asarray(bumped["layers"]["w_gate_lora_b"], np.float32))
    expected = base_w + delta
    merged_w = np.asarray(dequant_int4(merged["layers"]["w_gate"], merged["layers"]["w_gate_scale4"], jnp.float32))
    L_, d_in, d_out = expected.shape  # [L, D, intermediate]
    group = d_in // merged["layers"]["w_gate_scale4"].shape[1]
    grouped = expected.reshape(L_, d_in // group, group, d_out)
    step = np.abs(grouped).max(axis=2, keepdims=True) / 7.0
    bound = np.broadcast_to(step, grouped.shape).reshape(expected.shape)
    # half an int4 step plus bf16 scale-storage rounding
    assert (np.abs(merged_w - expected) <= bound * 0.5 + 0.01 * np.abs(expected) + 1e-5).all()


def test_int4_quantize_from_int8_source():
    """quantize_llm_int4 accepts an ALREADY int8-quantized decoder (the
    serving default): each target dequantizes from its int8 codes layer by
    layer and re-quantizes to packed int4 — close to int4-from-fp (one extra
    8-bit rounding), with no *_scale leaves left behind."""
    from bridgelang_tpu.ops.quant import dequant_int4, quantize_llm_int4, quantize_llm_int8

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    q4_direct = quantize_llm_int4(params, group=32)
    q4_via_int8 = quantize_llm_int4(quantize_llm_int8(params), group=32)
    assert "wq_scale" not in q4_via_int8["layers"]
    assert q4_via_int8["layers"]["wq"].shape == q4_direct["layers"]["wq"].shape
    a = np.asarray(dequant_int4(q4_direct["layers"]["wq"], q4_direct["layers"]["wq_scale4"], jnp.float32))
    b = np.asarray(dequant_int4(q4_via_int8["layers"]["wq"], q4_via_int8["layers"]["wq_scale4"], jnp.float32))
    # each is within half an int4 step (= half the group scale) of its
    # source, the int8 detour adds half an int8 step, and the bf16 scale
    # storage adds ~0.4% — so the dequantized weights agree to one int4 step
    # plus that slack (garbage, e.g. a permuted layout, would be many steps)
    step = np.maximum(np.asarray(q4_direct["layers"]["wq_scale4"], np.float32),
                      np.asarray(q4_via_int8["layers"]["wq_scale4"], np.float32))
    bound = np.repeat(step, 32, axis=1)  # [L, n_groups, out] -> per-row step
    assert (np.abs(a - b) <= 1.05 * bound + 2e-3).all()


def test_int4_quantized_forward_close_to_fp():
    """int4 weight-only forward tracks the fp forward (looser than int8) and
    the packed leaves halve the decoder matrix bytes."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4

    params = init_llm_params(jax.random.key(0), TINY_LLM)
    q4 = quantize_llm_int4(params, group=32)  # tiny dims -> small group
    assert q4["layers"]["wq"].shape[2] == params["layers"]["wq"].shape[2] // 2
    assert "wq_scale4" in q4["layers"] and "wq_scale" not in q4["layers"]

    ids = jnp.asarray([[1, 5, 9, 12, 44, 101]], dtype=jnp.int32)
    base = np.asarray(_fwd(params, ids), dtype=np.float32)
    quant = np.asarray(_fwd(q4, ids), dtype=np.float32)
    rel = np.linalg.norm(base - quant) / (np.linalg.norm(base) + 1e-6)
    assert rel < 0.35, f"relative error {rel}"  # 4-bit on a tiny random model
    agree = (base.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.5


def test_int4_init_and_dequant_roundtrip():
    from bridgelang_tpu.ops.quant import dequantize_llm_int4, init_llm_params_int4

    qp = init_llm_params_int4(jax.random.key(1), TINY_LLM, group=32)
    assert qp["layers"]["w_down"].dtype == jnp.int8
    assert qp["layers"]["w_down"].shape[1:] == (TINY_LLM.intermediate_size, TINY_LLM.dim // 2)
    ids = jnp.asarray([[1, 3, 7]], dtype=jnp.int32)
    out = _fwd(qp, ids)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
    deq = dequantize_llm_int4(qp)
    assert deq["layers"]["w_down"].shape == (TINY_LLM.n_layers, TINY_LLM.intermediate_size, TINY_LLM.dim)
    assert "w_down_scale4" not in deq["layers"]


def test_int4_kernel_eligible_at_flagship_geometry():
    """The fused kernel (not the XLA dequant fallback) must cover every
    decoder matmul of the shipped models: 7B (4096/11008) and 13B
    (5120/13824) projections, including the fused gate|up and q|k|v stacks."""
    from bridgelang_tpu.ops.int4_matmul import GROUP, int4_kernel_eligible

    for k, n in [
        (4096, 4096), (4096, 11008), (11008, 4096),   # 7B attn + MLP
        (5120, 5120), (5120, 13824), (13824, 5120),   # 13B attn + MLP
    ]:
        assert int4_kernel_eligible(k, n, k // GROUP), (k, n)


def test_int4_kernel_supports_pack_time_group_256_and_512():
    """The kernel derives the scale-group size from the scales shape, so the
    pack-time group knob (quantize_llm_int4(group=...) — the only lever on
    the w4a8 prefill per-group fixup cost, docs/int4.md) runs through the
    same fused path. group=256/512 must stay eligible and numerically
    equivalent to the dequant reference at both decode and prefill M."""
    from bridgelang_tpu.ops.int4_matmul import int4_kernel_eligible, matmul_int4, matmul_int4_a8
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4

    rng = np.random.default_rng(11)
    K, N = 512, 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    for group in (256, 512):
        q4, s4 = _quantize4_2d(jnp.asarray(w), group=group)
        assert s4.shape == (K // group, N)
        assert int4_kernel_eligible(K, N, s4.shape[0])
        ref_w = np.asarray(dequant_int4(q4, s4, dtype=jnp.float32))
        for M in (1, 48):
            x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
            ref = np.asarray(x, np.float32) @ ref_w
            out = np.asarray(matmul_int4(x, q4, s4), np.float32)
            np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2 * np.abs(ref).max())
            out8 = np.asarray(matmul_int4_a8(x, q4, s4), np.float32)
            np.testing.assert_allclose(out8, ref, rtol=5e-2, atol=5e-2 * np.abs(ref).max())
