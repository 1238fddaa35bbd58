"""OFT-style parallel-decode objective: train/serve geometry contract.

The objective (PrismaticVLM.forward_hidden parallel_actions=True) replaces
supervised positions with prefix-only query rows; generate_parallel serves
the same geometry (query token, positions, prefix-only attention). Reference
cites this as an external 25-50x recipe it does not implement
(reference README.md:16-17)."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.models.vision.vit import ViT
from bridgelang_tpu.models.vlm import IGNORE_INDEX, PrismaticVLM, VLMConfig
from bridgelang_tpu.training.trainer import (
    OptimConfig,
    init_train_state,
    make_optimizer,
    make_vla_train_step,
)
from tests.helpers import TINY_LLM, TINY_VIT


def _tiny_model():
    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    return model, params


def _batch(n_act=4):
    """Two rows sharing a prompt shape: [BOS, 5 words, 29871, actions, EOS]."""
    rng = np.random.default_rng(7)
    b, t = 2, 16
    prompt_len = 7  # BOS + 5 + 29871
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    mask = np.zeros((b, t), np.int32)
    labels = np.full((b, t), IGNORE_INDEX, np.int32)
    actions = rng.integers(TINY_LLM.vocab_size - 200, TINY_LLM.vocab_size - 10, size=(b, n_act))
    for i in range(b):
        ids[i, 0] = 1
        ids[i, 1:6] = rng.integers(3, 400, 5)
        ids[i, 6] = 29871
        ids[i, prompt_len:prompt_len + n_act] = actions[i]
        ids[i, prompt_len + n_act] = 2  # EOS
        mask[i, : prompt_len + n_act + 1] = 1
        labels[i, prompt_len:prompt_len + n_act + 1] = ids[i, prompt_len:prompt_len + n_act + 1]
    pixels = rng.normal(size=(b, 3, 32, 32)).astype(np.float32)
    return ids, mask, labels, pixels, actions, prompt_len


def test_parallel_objective_no_teacher_forcing_leak():
    """With parallel_actions=True the supervised positions' TOKEN VALUES must
    not influence the loss: their embeddings are replaced by the query token
    and they are excluded as attention keys (unknown at serve time)."""
    from bridgelang_tpu.training.trainer import chunked_ce_and_metrics
    from bridgelang_tpu.vla.action_tokenizer import make_bins

    model, params = _tiny_model()
    ids, mask, labels, pixels, actions, p0 = _batch()
    _, centers = make_bins(256)
    begin = TINY_LLM.vocab_size - 257

    def loss(ids_np):
        hidden, fl = model.forward_hidden(
            params, jnp.asarray(ids_np), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(labels), remat=False, parallel_actions=True)
        return float(chunked_ce_and_metrics(params["llm"], TINY_LLM, hidden, fl, begin,
                                            jnp.asarray(centers))[0])

    # NOTE: labels stay fixed — only the INPUT copies of the action tokens
    # change, so a loss difference would mean the graph read them.
    ids2 = ids.copy()
    ids2[:, p0:p0 + 4] = (ids2[:, p0:p0 + 4] + 37) % (TINY_LLM.vocab_size - 1)
    assert loss(ids) == loss(ids2)

    # sanity: the SEQUENTIAL objective (teacher forcing) DOES read them
    def loss_seq(ids_np):
        hidden, fl = model.forward_hidden(
            params, jnp.asarray(ids_np), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(labels), remat=False)
        return float(chunked_ce_and_metrics(params["llm"], TINY_LLM, hidden, fl, begin,
                                            jnp.asarray(centers))[0])

    assert loss_seq(ids) != loss_seq(ids2)


@pytest.mark.slow
def test_parallel_objective_overfit_then_parallel_decode_serves_it():
    """Fine-tune with parallel_decode_objective on a fixed batch, then
    generate_parallel on the PROMPT-ONLY inputs must emit the trained action
    tokens — the end-to-end train/serve geometry contract behind
    `finetune.py --parallel_decode` + `deploy.py --parallel_decode`."""
    model, params = _tiny_model()
    ids, mask, labels, pixels, actions, p0 = _batch()

    optimizer = make_optimizer(OptimConfig(learning_rate=3e-3, lr_scheduler_type="constant",
                                           max_grad_norm=1.0), params)
    step = jax.jit(make_vla_train_step(model, optimizer, compute_dtype=jnp.float32,
                                       parallel_decode_objective=True))
    state = init_train_state(params, optimizer)
    batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels), "pixel_values": jnp.asarray(pixels)}
    losses = []
    for _ in range(120):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.05, f"objective failed to overfit: {losses[::20]}"

    # Serve: prompt-only inputs (no action tokens exist client-side).
    ids_p = ids.copy()
    mask_p = mask.copy()
    ids_p[:, p0:] = TINY_LLM.pad_token_id
    mask_p[:, p0:] = 0
    toks = np.asarray(model.generate_parallel(
        state.params, jnp.asarray(ids_p), jnp.asarray(mask_p), jnp.asarray(pixels),
        max_new_tokens=4))
    np.testing.assert_array_equal(toks, actions)


def test_parallel_objective_unlabeled_eos_not_attendable():
    """predict_stop_token=False leaves EOS valid-but-unlabeled after the
    actions; serve-time sequences have no EOS at all, so the objective must
    exclude EVERYTHING from the first supervised position onward as keys —
    the loss with the unlabeled EOS present must equal the loss with it
    removed entirely."""
    from bridgelang_tpu.training.trainer import chunked_ce_and_metrics
    from bridgelang_tpu.vla.action_tokenizer import make_bins

    model, params = _tiny_model()
    ids, mask, labels, pixels, actions, p0 = _batch()
    labels = labels.copy()
    labels[:, p0 + 4] = IGNORE_INDEX  # un-supervise the EOS (predict_stop_token=False)
    _, centers = make_bins(256)
    begin = TINY_LLM.vocab_size - 257

    def loss(ids_np, mask_np):
        hidden, fl = model.forward_hidden(
            params, jnp.asarray(ids_np), jnp.asarray(mask_np), jnp.asarray(pixels),
            jnp.asarray(labels), remat=False, parallel_actions=True)
        return float(chunked_ce_and_metrics(params["llm"], TINY_LLM, hidden, fl, begin,
                                            jnp.asarray(centers))[0])

    ids_no_eos, mask_no_eos = ids.copy(), mask.copy()
    ids_no_eos[:, p0 + 4] = TINY_LLM.pad_token_id
    mask_no_eos[:, p0 + 4] = 0
    assert loss(ids, mask) == loss(ids_no_eos, mask_no_eos)


@pytest.mark.slow
def test_chunk_objective_overfit_then_predict_action_chunk():
    """Train a 2-step action chunk (14 supervised tokens) with the parallel
    objective, then the HOST serving API predict_action_chunk must return the
    de-normalized [2, 7] chunk those tokens encode — closing the train/serve
    loop for `finetune.py --parallel_decode --action_chunk 2`."""
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.vla.action_tokenizer import token_ids_to_actions, unnormalize_actions
    from tests.helpers import TINY_NORM_STATS, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32,
                        prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    rng = np.random.default_rng(11)
    H, A = 2, 7
    prompt = model.prepare_prompt_ids("push")
    chunk_tokens = rng.integers(TINY_LLM.vocab_size - 200, TINY_LLM.vocab_size - 10,
                                size=H * A).astype(np.int32)
    seq = np.concatenate([prompt, chunk_tokens, [2]])  # + EOS
    assert len(seq) <= 64
    ids = np.full((1, 64), TINY_LLM.pad_token_id, np.int32)
    mask = np.zeros((1, 64), np.int32)
    labels = np.full((1, 64), IGNORE_INDEX, np.int32)
    ids[0, : len(seq)] = seq
    mask[0, : len(seq)] = 1
    labels[0, len(prompt): len(seq)] = seq[len(prompt):]
    frame = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    from bridgelang_tpu.ops.image_ops import preprocess_batch

    pixels = np.asarray(preprocess_batch(jnp.asarray(frame[None]), model.image_transform,
                                         dtype=jnp.float32))

    optimizer = make_optimizer(OptimConfig(learning_rate=3e-3, lr_scheduler_type="constant",
                                           max_grad_norm=1.0), params)
    step = jax.jit(make_vla_train_step(model, optimizer, compute_dtype=jnp.float32,
                                       parallel_decode_objective=True))
    state = init_train_state(params, optimizer)
    batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels), "pixel_values": jnp.asarray(pixels)}
    for _ in range(120):
        state, m = step(state, batch)
    assert float(m["loss"]) < 0.05, f"chunk objective failed to overfit: {float(m['loss'])}"

    got = model.predict_action_chunk(state.params, frame, "push", horizon=H,
                                     unnorm_key="bridge_orig")
    stats = TINY_NORM_STATS["bridge_orig"]["action"]
    normalized = token_ids_to_actions(jnp.asarray(chunk_tokens.reshape(H, A)),
                                      jnp.asarray(model.bin_centers), TINY_LLM.vocab_size)
    expect = np.asarray(unnormalize_actions(
        np.asarray(normalized, np.float32), np.asarray(stats["q01"], np.float32),
        np.asarray(stats["q99"], np.float32), np.asarray(stats["mask"])))
    np.testing.assert_allclose(got, expect, atol=1e-5)
