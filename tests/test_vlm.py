"""VLM fusion / generation / predict_action tests on a tiny model.

The load-bearing checks:
  * fuse-after-BOS layout matches the reference contract
  * generate_greedy is invariant to right padding (same tokens regardless of
    prompt bucket size) — this validates the positions/cache-index plumbing
  * predict_action returns unnormalized actions consistent with the formulas
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.models.vision.vit import ViT
from bridgelang_tpu.models.vla import OpenVLA
from bridgelang_tpu.models.vlm import IGNORE_INDEX, PrismaticVLM, VLMConfig
from bridgelang_tpu.vla.action_tokenizer import make_bins, token_ids_to_actions, unnormalize_actions
from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer, random_image


@pytest.fixture(scope="module")
def tiny_vlm(monkeypatch_module=None):
    # Patch the vision builder so the registered flagship id maps to a tiny ViT.
    orig = vlm_mod.build_vision_backbone

    def tiny_builder(backbone_id, dtype=jnp.float32):
        return ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches

    vlm_mod.build_vision_backbone = tiny_builder
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    return model, params


def _prompt(model, b=1, t=10, pad_to=None, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.concatenate([[1], rng.integers(3, 400, size=t - 1)]).astype(np.int32)
    pad_to = pad_to or t
    out = np.full((b, pad_to), TINY_LLM.pad_token_id, np.int32)
    mask = np.zeros((b, pad_to), np.int32)
    for i in range(b):
        out[i, :t] = ids
        mask[i, :t] = 1
    return jnp.asarray(out), jnp.asarray(mask)


def _pixels(b=1):
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.normal(size=(b, 3, 32, 32)), dtype=jnp.float32)


def test_fuse_after_bos_layout(tiny_vlm):
    model, params = tiny_vlm
    ids, mask = _prompt(model, t=6)
    tok = jnp.arange(6 * TINY_LLM.dim, dtype=jnp.float32).reshape(1, 6, TINY_LLM.dim)
    patches = jnp.ones((1, 16, TINY_LLM.dim)) * -5.0
    labels = jnp.asarray([[7, 8, 9, 10, 11, 12]])
    fused, fmask, flabels = model.fuse_after_bos(tok, patches, mask[:, :6], labels)
    assert fused.shape == (1, 22, TINY_LLM.dim)
    np.testing.assert_allclose(np.asarray(fused[0, 0]), np.asarray(tok[0, 0]))      # BOS first
    np.testing.assert_allclose(np.asarray(fused[0, 1:17]), -5.0)                    # patches after BOS
    np.testing.assert_allclose(np.asarray(fused[0, 17:]), np.asarray(tok[0, 1:]))   # then text
    assert (np.asarray(flabels[0, 1:17]) == IGNORE_INDEX).all()
    assert np.asarray(fmask).sum() == 6 + 16


def test_forward_train_shapes_and_grad_flow(tiny_vlm):
    model, params = tiny_vlm
    ids, mask = _prompt(model, t=8, pad_to=10)
    labels = jnp.where(mask == 1, ids, IGNORE_INDEX)
    logits, flabels = model.forward_train(params, ids, mask, _pixels(), labels, remat=True)
    assert logits.shape == (1, 10 + 16, TINY_LLM.padded_vocab_size)
    assert flabels.shape == (1, 26)

    def loss_fn(p):
        lg, lb = model.forward_train(p, ids, mask, _pixels(), labels, remat=True)
        shift_lg, shift_lb = lg[:, :-1], lb[:, 1:]
        valid = shift_lb != IGNORE_INDEX
        logp = jax.nn.log_softmax(shift_lg.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, jnp.maximum(shift_lb, 0)[..., None], axis=-1)[..., 0]
        return -jnp.sum(tok_lp * valid) / jnp.maximum(valid.sum(), 1)

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


@pytest.mark.slow
def test_generate_padding_invariance(tiny_vlm):
    """Same prompt padded to different bucket lengths must emit identical tokens."""
    model, params = tiny_vlm
    pix = _pixels()
    ids_a, mask_a = _prompt(model, t=9, pad_to=9)
    ids_b, mask_b = _prompt(model, t=9, pad_to=16)
    out_a = model.generate_greedy(params, ids_a, mask_a, pix, max_new_tokens=5, cache_dtype=jnp.float32)
    out_b = model.generate_greedy(params, ids_b, mask_b, pix, max_new_tokens=5, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


@pytest.mark.slow
def test_generate_matches_naive_argmax_rollout(tiny_vlm):
    """Greedy decode via cache == naive 'recompute full forward each step' rollout."""
    model, params = tiny_vlm
    pix = _pixels()
    ids, mask = _prompt(model, t=7)
    out = np.asarray(model.generate_greedy(params, ids, mask, pix, max_new_tokens=4, cache_dtype=jnp.float32))

    # Naive: repeatedly run forward_train on the growing sequence.
    cur_ids = np.asarray(ids)
    for step in range(4):
        m = jnp.ones_like(jnp.asarray(cur_ids))
        logits, _ = model.forward_train(params, jnp.asarray(cur_ids), m, pix, jnp.asarray(cur_ids), remat=False)
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        assert nxt == out[0, step], f"step {step}: cache={out[0, step]} naive={nxt}"
        cur_ids = np.concatenate([cur_ids, [[nxt]]], axis=1)


def test_batched_generation(tiny_vlm):
    model, params = tiny_vlm
    ids, mask = _prompt(model, b=3, t=9)
    out = model.generate_greedy(params, ids, mask, _pixels(3), max_new_tokens=4, cache_dtype=jnp.float32)
    assert out.shape == (3, 4)


@pytest.mark.slow
def test_generate_pallas_prefill_long_cache(tiny_vlm):
    """The TPU serving path prefills through the Pallas kernel with a cache
    longer than the prompt (f_len + max_new_tokens). Round 1 crashed here with
    a negative pad width for max_new_tokens=128 (ADVICE.md high); the pallas
    (interpreter) and xla paths must now agree."""
    model, params = tiny_vlm
    pix = _pixels()
    ids, mask = _prompt(model, t=9, pad_to=12)
    out_xla = model.generate_greedy(params, ids, mask, pix, max_new_tokens=128, cache_dtype=jnp.float32)
    orig = model.attention_impl
    model.attention_impl = "pallas"
    try:
        out_pallas = model.generate_greedy(params, ids, mask, pix, max_new_tokens=128, cache_dtype=jnp.float32)
    finally:
        model.attention_impl = orig
    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_pallas))


def test_trainable_mask_stages(tiny_vlm):
    model, params = tiny_vlm
    m_align = model.trainable_mask(params, "align")
    assert all(not v for v in jax.tree_util.tree_leaves(m_align["vision"]))
    assert all(bool(np.all(v)) for v in jax.tree_util.tree_leaves(m_align["projector"]))
    assert all(not np.any(v) for v in jax.tree_util.tree_leaves(m_align["llm"]))

    m_last = model.trainable_mask(params, "vla-last-layer-train")
    wq_mask = np.asarray(m_last["llm"]["layers"]["wq"])
    assert wq_mask[-1].all() and not wq_mask[:-1].any()
    assert m_last["llm"]["lm_head"] is True


def _tiny_openvla():
    orig = vlm_mod.build_vision_backbone

    def tiny_builder(backbone_id, dtype=jnp.float32):
        return ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches

    vlm_mod.build_vision_backbone = tiny_builder
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

        model.image_transform = ImageTransformConfig(strategy="resize-naive", towers=(ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    return model, params


def test_predict_action_end_to_end():
    model, params = _tiny_openvla()
    action = model.predict_action(params, random_image(40, 52), "pick up the cup")
    assert action.shape == (7,)
    stats = TINY_NORM_STATS["bridge_orig"]["action"]
    # Masked dims land within [q01, q99]; unmasked dim (gripper) stays in [-1, 1]
    for d in range(6):
        assert stats["q01"][d] - 1e-6 <= action[d] <= stats["q99"][d] + 1e-6
    assert -1.0 <= action[6] <= 1.0


def test_predict_action_device_matches_formula():
    model, params = _tiny_openvla()
    stats = TINY_NORM_STATS["bridge_orig"]["action"]
    ids, mask = model.pad_prompt([model.prepare_prompt_ids("do the thing")])
    pix = jnp.zeros((1, 3, 32, 32), dtype=jnp.float32)
    token_ids = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(mask), pix, max_new_tokens=7)
    _, centers = make_bins()
    expected = unnormalize_actions(
        token_ids_to_actions(token_ids, jnp.asarray(centers), TINY_LLM.vocab_size).astype(jnp.float32),
        jnp.asarray(stats["q01"]), jnp.asarray(stats["q99"]), jnp.asarray(stats["mask"]),
    )
    got = model.predict_action_device(
        params, jnp.asarray(ids), jnp.asarray(mask), pix,
        jnp.asarray(stats["q01"], dtype=jnp.float32), jnp.asarray(stats["q99"], dtype=jnp.float32),
        jnp.asarray(stats["mask"]), action_dim=7,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected)[0:1], atol=1e-6)


def test_parallel_decode_shape_and_independence():
    """Parallel decode: one forward, outputs independent of query count prefix."""
    model, params = _tiny_openvla()
    ids, mask = model.pad_prompt([model.prepare_prompt_ids("do the thing")])
    pix = jnp.zeros((1, 3, 32, 32), dtype=jnp.float32)
    out7 = np.asarray(model.generate_parallel(params, jnp.asarray(ids), jnp.asarray(mask), pix, max_new_tokens=7))
    out3 = np.asarray(model.generate_parallel(params, jnp.asarray(ids), jnp.asarray(mask), pix, max_new_tokens=3))
    assert out7.shape == (1, 7)
    # conditional independence given prefix: first 3 tokens identical
    np.testing.assert_array_equal(out7[:, :3], out3)
    # first token must equal sequential greedy's first token (same context)
    seq = np.asarray(model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(mask), pix, max_new_tokens=1,
                                           cache_dtype=jnp.float32))
    assert out7[0, 0] == seq[0, 0]


@pytest.mark.slow
def test_temperature_sampling(tiny_vlm):
    model, params = tiny_vlm
    pix = _pixels()
    ids, mask = _prompt(model, t=9)
    greedy = model.generate_greedy(params, ids, mask, pix, max_new_tokens=6, cache_dtype=jnp.float32)
    # temperature=0 path unchanged
    greedy2 = model.generate_greedy(params, ids, mask, pix, max_new_tokens=6, cache_dtype=jnp.float32,
                                    temperature=0.0, rng=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(greedy2))
    # high temperature with different keys gives different rollouts
    s1 = model.generate_greedy(params, ids, mask, pix, max_new_tokens=6, cache_dtype=jnp.float32,
                               temperature=5.0, rng=jax.random.key(1))
    s2 = model.generate_greedy(params, ids, mask, pix, max_new_tokens=6, cache_dtype=jnp.float32,
                               temperature=5.0, rng=jax.random.key(2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


@pytest.mark.slow
def test_speculative_decode_bit_exact(tiny_vlm):
    """generate_speculative must equal generate_greedy REGARDLESS of draft
    quality: perfect draft (1 verify pass), garbage draft (full sequential
    fix-up), and partial draft (mixed)."""
    model, params = tiny_vlm
    pix = _pixels()
    ids, mask = _prompt(model, t=9, pad_to=12)
    n = 7
    greedy = np.asarray(model.generate_greedy(params, ids, mask, pix, max_new_tokens=n,
                                              cache_dtype=jnp.float32))

    # perfect draft: the greedy tokens themselves
    out = model.generate_speculative(params, ids, mask, pix, jnp.asarray(greedy),
                                     cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), greedy)

    # garbage draft
    garbage = jnp.full_like(jnp.asarray(greedy), 3)
    out = model.generate_speculative(params, ids, mask, pix, garbage, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), greedy)

    # partial draft: correct prefix, then wrong
    partial = np.array(greedy)
    partial[:, 4:] = 7
    out = model.generate_speculative(params, ids, mask, pix, jnp.asarray(partial),
                                     cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), greedy)

    # mismatch in the middle only (suffix accidentally right) — still exact
    mid = np.array(greedy)
    mid[:, 2] = (mid[:, 2] + 1) % 500
    out = model.generate_speculative(params, ids, mask, pix, jnp.asarray(mid),
                                     cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), greedy)


def test_speculative_decode_batched_and_jittable(tiny_vlm):
    model, params = tiny_vlm
    ids, mask = _prompt(model, b=3, t=9)
    pix = _pixels(3)
    greedy = np.asarray(model.generate_greedy(params, ids, mask, pix, max_new_tokens=5,
                                              cache_dtype=jnp.float32))
    drafts = np.array(greedy)
    drafts[1] = 3  # one example gets a garbage draft; others stay perfect
    fn = jax.jit(lambda p, i, m, px, d: model.generate_speculative(p, i, m, px, d,
                                                                   cache_dtype=jnp.float32))
    out = np.asarray(fn(params, ids, mask, pix, jnp.asarray(drafts)))
    np.testing.assert_array_equal(out, greedy)


@pytest.mark.slow
def test_speculative_bit_exact_over_int4_a8():
    """The server's default mode (speculative) over the int4 w4a8 path:
    greedy-equivalence must survive the a8 kernel — per-token activation
    quant is row-independent and the nibble recovery is exact int32, so the
    T=1 decode steps and the T=7 verify chunk see identical logits."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(
            VLMConfig(), llm=dataclasses.replace(TINY_LLM, w8a8=True))
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    params = dict(params, llm=quantize_llm_int4(params["llm"], group=32))

    pix = _pixels()
    ids, mask = _prompt(model, t=9, pad_to=12)
    greedy = np.asarray(model.generate_greedy(params, ids, mask, pix, max_new_tokens=7,
                                              cache_dtype=jnp.float32))
    for draft in (jnp.asarray(greedy),                       # perfect
                  jnp.full_like(jnp.asarray(greedy), 3)):   # garbage
        out = model.generate_speculative(params, ids, mask, pix, draft,
                                         cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), greedy)


@pytest.mark.slow
def test_int4_a8_batched_rows_match_unbatched():
    """Micro-batched serving contract over w4a8: each batch row's greedy
    tokens equal its single-example run. a8 quantizes activations PER TOKEN
    ROW (absmax/127), so batching must not couple examples."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(
            VLMConfig(), llm=dataclasses.replace(TINY_LLM, w8a8=True))
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    params = dict(params, llm=quantize_llm_int4(params["llm"], group=32))

    ids, mask = _prompt(model, b=3, t=9, seed=5)
    pix = _pixels(3)
    batched = np.asarray(model.generate_greedy(params, ids, mask, pix, max_new_tokens=5,
                                               cache_dtype=jnp.float32))
    for r in range(3):
        single = np.asarray(model.generate_greedy(
            params, ids[r:r + 1], mask[r:r + 1], pix[r:r + 1], max_new_tokens=5,
            cache_dtype=jnp.float32))
        np.testing.assert_array_equal(single[0], batched[r])
