"""Golden tests for the action tokenizer bit-fidelity contract.

The encode/decode formulas are re-derived independently here (straight from
the math documented at reference prismatic/vla/action_tokenizer.py:13-72 and
modeling_prismatic.py:521-534) and checked bin-for-bin against both the host
(numpy) and device (jnp, jitted) implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgelang_tpu.vla.action_tokenizer import (
    ActionTokenizer,
    LLAMA2_VOCAB_SIZE,
    bin_actions,
    make_bins,
    normalize_actions_q99,
    token_ids_to_actions,
    unnormalize_actions,
)


class VocabOnlyTokenizer:
    vocab_size = LLAMA2_VOCAB_SIZE

    def decode(self, ids):
        return " ".join(str(i) for i in ids)

    def batch_decode(self, batch):
        return [self.decode(ids) for ids in batch]


@pytest.fixture(scope="module")
def at():
    return ActionTokenizer(VocabOnlyTokenizer())


def test_bin_edges_and_centers(at):
    assert at.bins.shape == (256,)
    assert at.bin_centers.shape == (255,)
    assert at.bins[0] == -1.0 and at.bins[-1] == 1.0
    np.testing.assert_allclose(at.bin_centers, (at.bins[:-1] + at.bins[1:]) / 2)
    assert at.action_token_begin_idx == LLAMA2_VOCAB_SIZE - 257


def test_encode_range_occupies_last_256_ids(at):
    actions = np.linspace(-1.5, 1.5, 10_001)  # includes out-of-range -> clipped
    ids = at.encode_to_ids(actions)
    assert ids.min() >= LLAMA2_VOCAB_SIZE - 256
    assert ids.max() <= LLAMA2_VOCAB_SIZE - 1
    # Extremes: action=-1 -> digitize=1 -> id=31999; action=+1 -> digitize=256 -> id=31744
    assert at.encode_to_ids(np.array([-1.0]))[0] == LLAMA2_VOCAB_SIZE - 1
    assert at.encode_to_ids(np.array([1.0]))[0] == LLAMA2_VOCAB_SIZE - 256


def test_roundtrip_error_bounded_by_half_bin(at):
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, size=(512, 7))
    ids = at.encode_to_ids(actions)
    recovered = at.decode_token_ids_to_actions(ids)
    bin_width = 2.0 / 255
    assert np.max(np.abs(recovered - actions)) <= bin_width  # center of adjacent interval


def test_device_encode_matches_host(at):
    rng = np.random.default_rng(1)
    actions = rng.uniform(-1.2, 1.2, size=(64, 7)).astype(np.float32)
    bins, centers = make_bins()
    ids_dev = jax.jit(lambda a: bin_actions(a, jnp.asarray(bins)))(actions)
    np.testing.assert_array_equal(np.asarray(ids_dev), at.encode_to_ids(actions))
    # decode parity, including deliberately out-of-range ids (e.g. non-action tokens)
    ids_all = np.concatenate([np.asarray(ids_dev).ravel(), np.array([0, 1, 31743, 31999, 2])])
    dec_dev = jax.jit(lambda i: token_ids_to_actions(i, jnp.asarray(centers)))(ids_all)
    np.testing.assert_allclose(np.asarray(dec_dev), at.decode_token_ids_to_actions(ids_all), rtol=0, atol=1e-7)


def test_unnormalize_matches_reference_formula():
    # reference modeling_prismatic.py:527-534
    rng = np.random.default_rng(2)
    normalized = rng.uniform(-1, 1, size=(7,)).astype(np.float32)
    q01 = np.array([-0.2, -0.1, -0.3, -1.0, -0.5, -0.4, 0.0], dtype=np.float32)
    q99 = np.array([0.2, 0.3, 0.1, 1.0, 0.5, 0.6, 1.0], dtype=np.float32)
    mask = np.array([1, 1, 1, 1, 1, 1, 0], dtype=bool)
    expected = np.where(mask, 0.5 * (normalized + 1) * (q99 - q01) + q01, normalized)
    got = jax.jit(lambda n: unnormalize_actions(n, q01, q99, mask))(normalized)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_normalize_unnormalize_roundtrip():
    rng = np.random.default_rng(3)
    q01 = np.float32([-0.3] * 7)
    q99 = np.float32([0.4] * 7)
    raw = rng.uniform(-0.3, 0.4, size=(32, 7)).astype(np.float32)
    normed = normalize_actions_q99(jnp.asarray(raw), q01, q99)
    back = unnormalize_actions(normed, q01, q99)
    np.testing.assert_allclose(np.asarray(back), raw, atol=1e-5)


def test_degenerate_range_matches_training_normalizer():
    """Mirror the tf pipeline: a q01==q99 dim with min!=max is NOT zeroed (it
    clips), only dataset-min==max dims are — and only when the caller passes
    the degenerate mask built from those stats."""
    q01 = np.float32([0.5, -1.0])
    q99 = np.float32([0.5, 1.0])
    raw = np.float32([[0.9, 0.0]])
    # no degenerate mask: q01==q99 dim clips to +1 (value above the range)
    normed = np.asarray(normalize_actions_q99(jnp.asarray(raw), q01, q99))
    assert normed[0, 0] == 1.0
    np.testing.assert_allclose(normed[0, 1], 0.0, atol=1e-6)
    # with min==max degenerate mask: zeroed like the training pipeline
    normed = np.asarray(normalize_actions_q99(jnp.asarray(raw), q01, q99,
                                              degenerate_mask=np.array([True, False])))
    assert normed[0, 0] == 0.0


def test_call_returns_decoded_string(at):
    out = at(np.zeros(7))
    assert isinstance(out, str)
    outs = at(np.zeros((2, 7)))
    assert isinstance(outs, list) and len(outs) == 2
