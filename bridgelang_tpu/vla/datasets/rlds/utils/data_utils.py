"""RLDS data utilities: normalization, gripper relabeling, dataset statistics.

Counterpart of reference prismatic/vla/datasets/rlds/utils/data_utils.py:49-330
(itself derived from the public Octo/dlimp data stack). Same behavioral
contract — statistics schema, q01/q99 bounds normalization with masked dims,
sha256-keyed statistics cache — implemented against tf.data on the host CPU
(the C++ tf.data runtime feeds TPU hosts; SURVEY.md §2.9).
"""

from __future__ import annotations

import hashlib
import json
import os
from enum import Enum
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import tensorflow as tf


class NormalizationType(str, Enum):
    NORMAL = "normal"            # mean 0, std 1
    BOUNDS = "bounds"            # min/max -> [-1, 1]
    BOUNDS_Q99 = "bounds_q99"    # q01/q99 -> [-1, 1] (the VLA default)


def to_padding(tensor: tf.Tensor) -> tf.Tensor:
    if tf.debugging.is_numeric_tensor(tensor):
        return tf.zeros_like(tensor)
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    raise ValueError(f"Cannot pad tensor of dtype {tensor.dtype}")


# --- gripper action relabeling ------------------------------------------------


def binarize_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    """Continuous gripper [0,1] -> binary {0,1}, resolving intermediate values
    by looking AHEAD to the next definitive (open/closed) position — a reverse
    scan seeded with the trajectory's LAST action, so a trajectory that ends
    mid-transition keeps its final value instead of being relabeled closed
    (reference data_utils.py:106-135; semantics must match so bridge-style
    datasets train identically)."""
    open_mask = actions > 0.95
    closed_mask = actions < 0.05
    in_between = tf.logical_not(tf.logical_or(open_mask, closed_mask))
    is_open_float = tf.cast(open_mask, tf.float32)

    def scan_fn(carry, i):
        return tf.cond(in_between[i], lambda: tf.cast(carry, tf.float32), lambda: is_open_float[i])

    return tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), actions[-1], reverse=True)


def invert_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    return 1.0 - actions


def rel2abs_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    """Relative gripper commands (+1 closing / -1 opening / ~0 hold) ->
    absolute open state in [0, 1] (1 = open). Forward scan carrying the
    current state; the pre-first-command state is the inverse of the first
    command (all-hold trajectories default to open). Must match the reference
    exactly (data_utils.py:141-162) — RT-1-family gripper labels depend on it."""
    opening_mask, closing_mask = actions < -0.1, actions > 0.1
    thresholded = tf.where(opening_mask, 1, tf.where(closing_mask, -1, 0))

    def scan_fn(carry, i):
        return tf.cond(thresholded[i] == 0, lambda: carry, lambda: thresholded[i])

    start = -1 * thresholded[tf.argmax(thresholded != 0, axis=0)]
    start = tf.cond(start == 0, lambda: 1, lambda: start)
    new_actions = tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), start)
    return tf.cast(new_actions, tf.float32) / 2 + 0.5


def relabel_bridge_actions(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Bridge-style relabeling: action[t] = state[t+1] - state[t] for the
    movement dims; final step dropped by the caller's truncation."""
    movement = traj["observation"]["state"][1:, :6] - traj["observation"]["state"][:-1, :6]
    traj_truncated = tf.nest.map_structure(lambda x: x[:-1], traj)
    traj_truncated["action"] = tf.concat([movement, traj["action"][:-1, -1:]], axis=1)
    return traj_truncated


# --- normalization ------------------------------------------------------------


def normalize_action_and_proprio(
    traj: Dict[str, Any],
    metadata: Dict[str, Dict[str, np.ndarray]],
    normalization_type: NormalizationType,
) -> Dict[str, Any]:
    """Apply per-dataset statistics; masked dims (e.g. gripper) pass through
    (reference data_utils.py:49-110; degenerate dims produce zeros)."""
    keys = {"action": "action"}
    if "proprio" in traj.get("observation", {}):
        keys["proprio"] = "proprio"

    def apply(tensor, mask, fn):
        mask_t = tf.constant(np.asarray(mask, dtype=bool))
        return tf.where(mask_t, fn(tensor), tensor)

    out = dict(traj)
    for traj_key, stats_key in keys.items():
        stats = {k: np.asarray(v, dtype=np.float32) for k, v in metadata[stats_key].items() if k != "mask"}
        mask = metadata[stats_key].get("mask", np.ones_like(stats["q01"] if "q01" in stats else stats["mean"], dtype=bool))
        target = out["observation"][traj_key] if traj_key == "proprio" else out[traj_key]

        if normalization_type == NormalizationType.NORMAL:
            fn = lambda x, s=stats: (x - s["mean"]) / (s["std"] + 1e-8)  # noqa: E731
        elif normalization_type == NormalizationType.BOUNDS:
            fn = lambda x, s=stats: tf.clip_by_value(  # noqa: E731
                2.0 * (x - s["min"]) / (s["max"] - s["min"] + 1e-8) - 1.0, -1.0, 1.0
            )
        elif normalization_type == NormalizationType.BOUNDS_Q99:
            fn = lambda x, s=stats: tf.clip_by_value(  # noqa: E731
                2.0 * (x - s["q01"]) / (s["q99"] - s["q01"] + 1e-8) - 1.0, -1.0, 1.0
            )
        else:
            raise ValueError(f"Unknown normalization {normalization_type}")

        normalized = apply(target, mask, fn)
        # Unused dims (min == max over the whole dataset) map to zero — keyed
        # on min/max for BOTH bounds modes and applied regardless of `mask`,
        # matching reference data_utils.py:95-99 (a q01==q99 dim with
        # min != max is NOT zeroed; it normalizes to clipped +/-1).
        if normalization_type in (NormalizationType.BOUNDS, NormalizationType.BOUNDS_Q99):
            degenerate = tf.constant(np.asarray(stats["min"]) == np.asarray(stats["max"]))
            normalized = tf.where(degenerate, tf.zeros_like(normalized), normalized)
        if traj_key == "proprio":
            out["observation"] = dict(out["observation"], proprio=normalized)
        else:
            out[traj_key] = normalized
    return out


# --- statistics ---------------------------------------------------------------


def get_dataset_statistics(
    dataset: tf.data.Dataset,
    hash_dependencies: List[str],
    save_dir: Optional[str] = None,
    force_recompute: bool = False,
) -> Dict[str, Any]:
    """Full-scan statistics over action/proprio (mean/std/min/max/q01/q99 +
    counts) with a sha256-keyed JSON cache (reference data_utils.py:185-271).
    `dataset` yields trajectories with "action" (and optionally
    "observation/proprio")."""
    unique_hash = hashlib.sha256("".join(hash_dependencies).encode("utf-8")).hexdigest()
    cache_paths = []
    if save_dir:
        cache_paths.append(Path(save_dir) / f"dataset_statistics_{unique_hash}.json")
    cache_paths.append(Path.home() / ".cache" / "bridgelang_tpu" / f"dataset_statistics_{unique_hash}.json")

    if not force_recompute:
        for p in cache_paths:
            if p.exists():
                with open(p) as f:
                    return json.load(f)

    actions, proprios = [], []
    num_transitions, num_trajectories = 0, 0
    for traj in dataset.as_numpy_iterator():
        actions.append(np.asarray(traj["action"]))
        if isinstance(traj.get("observation"), dict) and "proprio" in traj["observation"]:
            proprios.append(np.asarray(traj["observation"]["proprio"]))
        num_transitions += len(traj["action"])
        num_trajectories += 1
    actions = np.concatenate(actions, axis=0)

    def stats_of(x):
        return {
            "mean": x.mean(0).tolist(),
            "std": x.std(0).tolist(),
            "max": x.max(0).tolist(),
            "min": x.min(0).tolist(),
            "q01": np.quantile(x, 0.01, axis=0).tolist(),
            "q99": np.quantile(x, 0.99, axis=0).tolist(),
        }

    metadata = {
        "action": stats_of(actions),
        "num_transitions": num_transitions,
        "num_trajectories": num_trajectories,
    }
    if proprios:
        metadata["proprio"] = stats_of(np.concatenate(proprios, axis=0))

    for p in cache_paths:
        try:
            p.parent.mkdir(parents=True, exist_ok=True)
            with open(p, "w") as f:
                json.dump(metadata, f)
            break
        except OSError:
            continue
    return metadata


def save_dataset_statistics(run_dir, statistics: Dict[str, Any]) -> None:
    """Write the inference-time sidecar (reference data_utils.py:274-293)."""
    out = Path(run_dir) / "dataset_statistics.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(statistics, f, indent=2, default=float)


# --- mixture utilities --------------------------------------------------------


def allocate_threads(n: Optional[int], weights: np.ndarray) -> np.ndarray:
    """Distribute n threads over datasets proportional to weights, each
    getting at least one (reference data_utils.py:296-330)."""
    if n is None:
        return np.array([tf.data.AUTOTUNE] * len(weights))
    assert n >= len(weights), "more datasets than threads"
    weights = np.asarray(weights, dtype=np.float32)
    weights = weights / weights.sum()
    allocation = np.zeros_like(weights, dtype=np.int64)
    while True:
        mask = (weights * n < 1) & (weights > 0)
        if not mask.any():
            break
        n -= mask.sum()
        allocation += mask
        weights[mask] = 0.0
        if weights.sum() > 0:
            weights = weights / weights.sum()
    fractional, integral = np.modf(weights * n)
    allocation += integral.astype(np.int64)
    n -= int(integral.sum())
    for i in np.argsort(fractional)[::-1][:n]:
        allocation[i] += 1
    return allocation


def pprint_data_mixture(dataset_kwargs_list: List[Dict[str, Any]], dataset_weights: List[float]) -> str:
    lines = ["", "#" * 80, "# Loading the following dataset mixture (name: weight):", "#" * 80]
    total = sum(dataset_weights) or 1.0
    for kw, w in zip(dataset_kwargs_list, dataset_weights):
        lines.append(f"#  {kw['name']}: {w / total:.5f}")
    lines.append("#" * 80)
    return "\n".join(lines)
