"""Goal relabeling: sample a future observation as the goal.

Counterpart of reference rlds/utils/goal_relabeling.py:15-32.
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def uniform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """For each frame t, pick goal index g ~ Uniform[t+1, T] and set
    task.image_* / task.timestep from the goal frame."""
    traj_len = tf.shape(traj["action"])[0]
    rand = tf.random.uniform([traj_len])
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(rand * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)

    goal_obs = tf.nest.map_structure(lambda x: tf.gather(x, goal_idxs), traj["observation"])
    task = dict(traj.get("task", {}))
    for k, v in goal_obs.items():
        if k.startswith("image_") or k.startswith("depth_"):
            task[k] = v
    task["timestep"] = goal_idxs
    traj["task"] = task
    return traj


GOAL_RELABELING_FUNCTIONS = {"uniform": uniform}
