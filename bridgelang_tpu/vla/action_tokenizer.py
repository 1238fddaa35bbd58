"""Discrete action tokenization: continuous 7-DoF actions <-> LLM token ids.

Re-design of the reference ActionTokenizer
(reference: prismatic/vla/action_tokenizer.py:13-72) with a TPU-first split:

* `bin_actions` / `token_ids_to_actions` are pure jnp functions, so action
  de-tokenization + q01/q99 un-normalization run ON DEVICE inside the jitted
  decode loop (the reference round-trips token ids to CPU/numpy per call,
  modeling_prismatic.py:521-534 — a known inefficiency we avoid).
* `ActionTokenizer` keeps the exact host-side contract (same bin math, same
  "overwrite the last 256 token ids of the ORIGINAL vocab" mapping) for data
  pipelines and string round-trips.

Bit-fidelity contract (must match the reference exactly or every action is
silently corrupted):
  bins        = linspace(min, max, n_bins)                    # 256 edges
  bin_centers = midpoints                                     # 255 centers
  token_id    = vocab_size - digitize(clip(action), bins)     # digitize in [1, 256]
  decode      = bin_centers[clip(vocab_size - id - 1, 0, 254)]
where `vocab_size` is the ORIGINAL LLM vocab (32000 for Llama-2), not the
pad_to_multiple_of=64-resized embedding table
(reference: modeling_prismatic.py:503-504; llama2.py:73-76).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

LLAMA2_VOCAB_SIZE = 32000
DEFAULT_N_BINS = 256


# --- pure functions (host numpy or device jnp; used inside jit) --------------


def make_bins(n_bins: int = DEFAULT_N_BINS, min_action: float = -1.0, max_action: float = 1.0):
    bins = np.linspace(min_action, max_action, n_bins)
    bin_centers = (bins[:-1] + bins[1:]) / 2.0
    return bins, bin_centers


def bin_actions(
    actions: jnp.ndarray,
    bins: jnp.ndarray,
    vocab_size: int = LLAMA2_VOCAB_SIZE,
    min_action: float = -1.0,
    max_action: float = 1.0,
) -> jnp.ndarray:
    """Continuous actions -> token ids. jnp.digitize(right=False) matches
    np.digitize used at reference action_tokenizer.py:44."""
    clipped = jnp.clip(actions, min_action, max_action)
    discretized = jnp.digitize(clipped, jnp.asarray(bins))  # in [1, n_bins]
    return (vocab_size - discretized).astype(jnp.int32)


def token_ids_to_actions(
    token_ids: jnp.ndarray,
    bin_centers: jnp.ndarray,
    vocab_size: int = LLAMA2_VOCAB_SIZE,
) -> jnp.ndarray:
    """Token ids -> normalized continuous actions in [-1, 1]; device-safe.
    Mirrors reference action_tokenizer.py:49-68 incl. the off-by-one clip."""
    bin_centers = jnp.asarray(bin_centers)
    discretized = vocab_size - token_ids
    idx = jnp.clip(discretized - 1, 0, bin_centers.shape[0] - 1)
    return bin_centers[idx]


def unnormalize_actions(
    normalized: jnp.ndarray,
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q01/q99 bounds un-normalization (reference: modeling_prismatic.py:527-534):
    action = 0.5*(a+1)*(q99-q01)+q01 where mask, else passthrough (gripper)."""
    q01 = jnp.asarray(q01)
    q99 = jnp.asarray(q99)
    unnormed = 0.5 * (normalized + 1.0) * (q99 - q01) + q01
    if mask is None:
        return unnormed
    return jnp.where(jnp.asarray(mask), unnormed, normalized)


def normalize_actions_q99(
    actions: jnp.ndarray,
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    degenerate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse of `unnormalize_actions`: raw -> [-1, 1], mirroring the tf
    training normalizer EXACTLY (rlds/utils/data_utils.py BOUNDS_Q99 path):
    denominator (q99 - q01 + 1e-8), and dims zeroed only where the DATASET
    min == max (pass `degenerate_mask` built from those stats) — a dim with
    q01 == q99 but min != max normalizes to clipped +/-1 in training, so it
    must here too."""
    q01 = jnp.asarray(q01, dtype=actions.dtype)
    q99 = jnp.asarray(q99, dtype=actions.dtype)
    scaled = 2.0 * (actions - q01) / (q99 - q01 + 1e-8) - 1.0
    clipped = jnp.clip(scaled, -1.0, 1.0)
    if mask is not None:
        clipped = jnp.where(jnp.asarray(mask), clipped, actions)
    if degenerate_mask is not None:
        clipped = jnp.where(jnp.asarray(degenerate_mask), 0.0, clipped)
    return clipped


# --- host-side class (data pipeline / string round-trip) ---------------------


class ActionTokenizer:
    """Host-side action tokenizer with the reference's exact interface
    (reference: prismatic/vla/action_tokenizer.py:13-72).

    `tokenizer` may be any object with `.vocab_size`, `.decode`, and
    `.batch_decode` (an HF tokenizer or our lightweight stand-in); only
    `vocab_size` participates in the id math.
    """

    def __init__(self, tokenizer, bins: int = DEFAULT_N_BINS, min_action: float = -1.0, max_action: float = 1.0):
        self.tokenizer, self.n_bins = tokenizer, bins
        self.min_action, self.max_action = min_action, max_action
        self.bins, self.bin_centers = make_bins(bins, min_action, max_action)
        # Contract: action tokens overwrite the final n_bins ids of the vocab.
        self.action_token_begin_idx: int = int(self.tokenizer.vocab_size - (self.n_bins + 1))

    def encode_to_ids(self, action: np.ndarray) -> np.ndarray:
        action = np.clip(action, float(self.min_action), float(self.max_action))
        discretized = np.digitize(action, self.bins)
        return (self.tokenizer.vocab_size - discretized).astype(np.int64)

    def __call__(self, action: np.ndarray) -> Union[str, List[str]]:
        ids = self.encode_to_ids(action)
        if ids.ndim == 1:
            return self.tokenizer.decode(list(ids))
        return self.tokenizer.batch_decode(ids.tolist())

    def decode_token_ids_to_actions(self, action_token_ids: np.ndarray) -> np.ndarray:
        discretized = self.tokenizer.vocab_size - action_token_ids
        discretized = np.clip(discretized - 1, a_min=0, a_max=self.bin_centers.shape[0] - 1)
        return self.bin_centers[discretized]

    @property
    def vocab_size(self) -> int:
        return self.n_bins
