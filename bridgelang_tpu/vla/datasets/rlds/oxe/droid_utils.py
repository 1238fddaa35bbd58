"""DROID helpers: rotation representations + degenerate-action filtering.

Counterpart of reference rlds/oxe/utils/droid_utils.py:1-178. Rotation
conversions are self-contained TF (no tensorflow_graphics dependency).
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def rmat_to_euler(rmat: tf.Tensor) -> tf.Tensor:
    """Rotation matrix [..., 3, 3] -> extrinsic xyz Euler angles [..., 3]."""
    sy = tf.sqrt(rmat[..., 0, 0] ** 2 + rmat[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = tf.where(singular, tf.atan2(-rmat[..., 1, 2], rmat[..., 1, 1]), tf.atan2(rmat[..., 2, 1], rmat[..., 2, 2]))
    y = tf.atan2(-rmat[..., 2, 0], sy)
    z = tf.where(singular, tf.zeros_like(x), tf.atan2(rmat[..., 1, 0], rmat[..., 0, 0]))
    return tf.stack([x, y, z], axis=-1)


def euler_to_rmat(euler: tf.Tensor) -> tf.Tensor:
    """Extrinsic xyz Euler [..., 3] -> rotation matrix [..., 3, 3]."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = tf.cos(x), tf.sin(x)
    cy, sy = tf.cos(y), tf.sin(y)
    cz, sz = tf.cos(z), tf.sin(z)
    r00 = cy * cz
    r01 = sx * sy * cz - cx * sz
    r02 = cx * sy * cz + sx * sz
    r10 = cy * sz
    r11 = sx * sy * sz + cx * cz
    r12 = cx * sy * sz - sx * cz
    r20 = -sy
    r21 = sx * cy
    r22 = cx * cy
    rows = [tf.stack([r00, r01, r02], -1), tf.stack([r10, r11, r12], -1), tf.stack([r20, r21, r22], -1)]
    return tf.stack(rows, axis=-2)


def mat_to_rot6d(rmat: tf.Tensor) -> tf.Tensor:
    """Rotation matrix -> R6 representation (first two rows, row-major)."""
    r1, r2 = rmat[..., 0, :], rmat[..., 1, :]
    return tf.concat([r1, r2], axis=-1)


def euler_to_r6(euler: tf.Tensor) -> tf.Tensor:
    return mat_to_rot6d(euler_to_rmat(euler))


def velocity_act_to_wrist_frame(vel: tf.Tensor, wrist_in_robot_frame: tf.Tensor) -> tf.Tensor:
    """Express base-frame cartesian velocity in the wrist frame (reference
    droid_utils.py:36-57): [B, 6] (3 translation + 3 euler rotation) ->
    [B, 9] (3 translation + 6 R6 rotation): dt_wrist = R^-1 dt,
    dR_wrist = R^-1 dR R flattened to R6 (first two matrix rows)."""
    r_frame = euler_to_rmat(wrist_in_robot_frame[:, 3:6])
    r_frame_inv = tf.linalg.matrix_transpose(r_frame)
    vel_t = tf.einsum("bij,bj->bi", r_frame_inv, vel[:, :3])
    dr_mat = euler_to_rmat(vel[:, 3:6])
    dr_rel = tf.matmul(tf.matmul(r_frame_inv, dr_mat), r_frame)
    return tf.concat([vel_t, mat_to_rot6d(dr_rel)], axis=-1)


def zero_action_filter(traj: Dict[str, Any]) -> tf.Tensor:
    """Drop chunks whose actions are all ~zero — DROID has long idle
    stretches. Runs AFTER q99 normalization, so the comparison target is the
    NORMALIZED zero action, not 0 (reference droid_utils.py:151-178)."""
    droid_q01 = tf.constant([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                             -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    droid_q99 = tf.constant([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                             0.6705610305070877, 0.6464948207139969, 0.8897542208433151])
    acts = traj["action"][..., :6]
    norm_zero = 2 * (tf.zeros_like(acts) - droid_q01) / (droid_q99 - droid_q01 + 1e-8) - 1
    return tf.reduce_any(tf.math.abs(acts - norm_zero) > 1e-5)
