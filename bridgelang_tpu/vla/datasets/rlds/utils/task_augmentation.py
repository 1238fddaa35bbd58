"""Task-conditioning augmentation: randomly drop language vs goal-image.

Counterpart of reference rlds/utils/task_augmentation.py:14-57.
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf

from bridgelang_tpu.vla.datasets.rlds.utils.data_utils import to_padding


def delete_task_conditioning(traj: Dict[str, Any], keep_image_prob: float) -> Dict[str, Any]:
    """With prob `keep_image_prob` keep goal images (delete language); else
    keep language (delete goal images). Frames lacking one modality keep the
    other unconditionally."""
    if "language_instruction" not in traj.get("task", {}):
        return traj
    task = traj["task"]
    image_keys = {k for k in task if k.startswith("image_") or k.startswith("depth_")}
    if not image_keys:
        return traj

    traj_len = tf.shape(traj["action"])[0]
    should_keep_images = tf.random.uniform([traj_len]) < keep_image_prob
    should_keep_images |= ~task["pad_mask_dict"]["language_instruction"]

    for k in image_keys | {"language_instruction"}:
        should_keep = should_keep_images if k in image_keys else ~should_keep_images
        task[k] = tf.where(should_keep, task[k], tf.map_fn(to_padding, task[k]) if task[k].dtype == tf.string else to_padding(task[k]))
        task["pad_mask_dict"] = dict(task["pad_mask_dict"], **{k: task["pad_mask_dict"][k] & should_keep})
    traj["task"] = task
    return traj


TASK_AUGMENT_FUNCTIONS = {"delete_task_conditioning": delete_task_conditioning}
