"""Trajectory-level transforms: windowing, subsampling, pad masks.

Counterpart of reference prismatic/vla/datasets/rlds/traj_transforms.py:14-104.
Operates on whole trajectories (dicts of [T, ...] tensors) inside tf.data.
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def chunk_act_obs(traj: Dict[str, Any], window_size: int = 1, future_action_window_size: int = 0) -> Dict[str, Any]:
    """Each frame gets a history window of observations and a
    history+future window of actions, with pad masks; actions beyond an
    (optional) goal timestep become neutral (reference traj_transforms.py:14-71).

    observation[t] -> [window_size, ...]   (frames t-w+1 .. t, padded at start)
    action[t]      -> [window_size + future, action_dim]
    """
    traj_len = tf.shape(traj["action"])[0]
    action_dim = traj["action"].shape[-1]

    history_indices = tf.range(traj_len)[:, None] + tf.range(-window_size + 1, 1)[None, :]
    timestep_pad_mask = history_indices >= 0

    action_indices = tf.range(traj_len)[:, None] + tf.range(-window_size + 1, 1 + future_action_window_size)[None, :]

    # Goal-relabeled trajectories carry task.timestep; otherwise the "goal"
    # is the trajectory end (reference traj_transforms.py:41-46).
    if "timestep" in traj.get("task", {}):
        goal_timestep = traj["task"]["timestep"]
    else:
        goal_timestep = tf.fill([traj_len], traj_len - 1)

    history_indices = tf.maximum(history_indices, 0)
    # Actions clamp AT the goal (not traj end): chunked windows repeat the
    # goal-step action past it (reference :46).
    floored_action_indices = tf.minimum(tf.maximum(action_indices, 0), goal_timestep[:, None])

    traj["observation"] = tf.nest.map_structure(lambda x: tf.gather(x, history_indices), traj["observation"])
    traj["observation"]["timestep_pad_mask"] = timestep_pad_mask
    traj["action"] = tf.gather(traj["action"], floored_action_indices)

    # Actions strictly past the goal become NEUTRAL: relative dims zero,
    # absolute dims keep their (goal-clamped) chunked value — the
    # absolute_action_mask emitted by make_dataset_from_rlds decides which is
    # which (reference :54-70; a hardcoded neutral would force grippers open
    # and zero absolute joint targets).
    absolute_action_mask = traj.get(
        "absolute_action_mask", tf.zeros([traj_len, action_dim], dtype=tf.bool)
    )
    neutral_actions = tf.where(
        absolute_action_mask[:, None, :],
        traj["action"],
        tf.zeros_like(traj["action"]),
    )
    action_past_goal = action_indices > goal_timestep[:, None]
    traj["action"] = tf.where(action_past_goal[:, :, None], neutral_actions, traj["action"])
    return traj


def subsample(traj: Dict[str, Any], subsample_length: int) -> Dict[str, Any]:
    """Uniformly subsample long trajectories (reference traj_transforms.py:74-88)."""
    traj_len = tf.shape(traj["action"])[0]

    def do_subsample():
        indices = tf.random.shuffle(tf.range(traj_len))[:subsample_length]
        return tf.nest.map_structure(lambda x: tf.gather(x, indices), traj)

    return tf.cond(traj_len > subsample_length, do_subsample, lambda: traj)


def add_pad_mask_dict(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Per-key "is this real data or padding" masks for observation and task
    (string keys: empty string == padding; reference traj_transforms.py:91-104)."""
    traj_len = tf.shape(traj["action"])[0]
    for key in ("observation", "task"):
        if key not in traj:
            continue
        pad_masks = {}
        for subkey, tensor in traj[key].items():
            if tensor.dtype == tf.string:
                pad_masks[subkey] = tf.strings.length(tensor) != 0
            else:
                pad_masks[subkey] = tf.ones([traj_len], dtype=tf.bool)
        traj[key]["pad_mask_dict"] = pad_masks
    return traj
