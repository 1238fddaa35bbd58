"""Golden tests for the DROID rotation math (VERDICT r04 item 6).

`oxe/droid_utils.py` reimplements rmat<->euler/R6/wrist-frame without
tensorflow_graphics (absent from this image; reference
prismatic/vla/datasets/rlds/oxe/utils/droid_utils.py:9-57 uses
tfg.euler/rotation_matrix_3d). An axis-convention error here silently trains
every EEF_R6 dataset's rotations wrong, so the conventions are pinned three
ways: against scipy's independent Rotation implementation (extrinsic-xyz ==
tfg's rotate-about-x-then-y-then-z), against hand-computed matrices, and by
matrix round-trip through gimbal-lock neighborhoods where euler angles stop
being unique but the matrix must survive.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
from scipy.spatial.transform import Rotation  # noqa: E402

from bridgelang_tpu.vla.datasets.rlds.oxe import droid_utils as du  # noqa: E402


def _angle_grid():
    """Euler grid incl. gimbal-lock neighborhoods (y -> +-pi/2)."""
    xs = np.linspace(-np.pi, np.pi, 7)
    ys = np.concatenate([
        np.linspace(-1.4, 1.4, 7),
        [np.pi / 2 - 1e-4, -np.pi / 2 + 1e-4, np.pi / 2, -np.pi / 2],
    ])
    zs = np.linspace(-np.pi, np.pi, 5)
    grid = np.array([[x, y, z] for x in xs for y in ys for z in zs], np.float64)
    return grid


def test_euler_to_rmat_matches_scipy_extrinsic_xyz():
    """tfg.rotation_matrix_3d.from_euler rotates about x, then y, then z
    (R = Rz Ry Rx) == scipy's lowercase-extrinsic 'xyz'."""
    angles = _angle_grid()
    ours = du.euler_to_rmat(tf.constant(angles, tf.float64)).numpy()
    want = Rotation.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(ours, want, atol=1e-12)


def test_rmat_to_euler_matches_scipy_away_from_lock():
    rng = np.random.default_rng(0)
    angles = np.stack([
        rng.uniform(-np.pi, np.pi, 200),
        rng.uniform(-1.4, 1.4, 200),  # |y| < pi/2 - margin: unique euler
        rng.uniform(-np.pi, np.pi, 200),
    ], axis=-1)
    rmats = Rotation.from_euler("xyz", angles).as_matrix()
    ours = du.rmat_to_euler(tf.constant(rmats, tf.float64)).numpy()
    np.testing.assert_allclose(ours, angles, atol=1e-9)


def test_euler_rmat_roundtrip_survives_gimbal_lock():
    """At |y| = pi/2 the euler decomposition is non-unique (only x -+ z is
    determined); the MATRIX must still round-trip exactly."""
    angles = _angle_grid()
    rmats = du.euler_to_rmat(tf.constant(angles, tf.float64))
    back = du.euler_to_rmat(du.rmat_to_euler(rmats)).numpy()
    np.testing.assert_allclose(back, rmats.numpy(), atol=1e-7)


def test_euler_to_r6_hand_values():
    """R6 = first two ROWS of the rotation matrix, row-major concat
    (reference rotmat_to_rot6d, droid_utils.py:21-33)."""
    cases = [
        # identity
        ((0.0, 0.0, 0.0), [1, 0, 0, 0, 1, 0]),
        # Rz(pi/2): [[0,-1,0],[1,0,0],[0,0,1]]
        ((0.0, 0.0, np.pi / 2), [0, -1, 0, 1, 0, 0]),
        # Rx(pi/2): [[1,0,0],[0,0,-1],[0,1,0]]
        ((np.pi / 2, 0.0, 0.0), [1, 0, 0, 0, 0, -1]),
        # Ry(pi/2): [[0,0,1],[0,1,0],[-1,0,0]]
        ((0.0, np.pi / 2, 0.0), [0, 0, 1, 0, 1, 0]),
    ]
    for euler, want in cases:
        got = du.euler_to_r6(tf.constant([euler], tf.float64)).numpy()[0]
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"euler={euler}")


def test_mat_to_rot6d_takes_first_two_rows():
    rng = np.random.default_rng(1)
    rmats = Rotation.random(16, random_state=2).as_matrix()
    r6 = du.mat_to_rot6d(tf.constant(rmats, tf.float64)).numpy()
    want = np.concatenate([rmats[:, 0, :], rmats[:, 1, :]], axis=-1)
    np.testing.assert_allclose(r6, want, atol=0)
    assert r6.shape == (16, 6)


def test_velocity_act_to_wrist_frame_hand_computed():
    """Wrist yawed +90deg about z; base-frame velocity +x with no rotation:
    dt_wrist = Rz(-90) @ (1,0,0) = (0,-1,0); dR_wrist = I -> R6 identity."""
    vel = tf.constant([[1.0, 0.0, 0.0, 0.0, 0.0, 0.0]], tf.float64)
    pose = tf.constant([[0.3, -0.1, 0.5, 0.0, 0.0, np.pi / 2]], tf.float64)
    out = du.velocity_act_to_wrist_frame(vel, pose).numpy()[0]
    assert out.shape == (9,)  # 3 translation + 6 R6 (reference contract)
    np.testing.assert_allclose(out[:3], [0.0, -1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(out[3:], [1, 0, 0, 0, 1, 0], atol=1e-12)


def test_velocity_act_to_wrist_frame_matches_scipy_reference():
    """Independent scipy recomputation of the reference formula
    (droid_utils.py:46-56): dt_w = R^-1 dt, dR_w = R^-1 dR R -> R6."""
    rng = np.random.default_rng(3)
    B = 32
    vel = np.concatenate([
        rng.uniform(-1, 1, (B, 3)),
        rng.uniform(-0.5, 0.5, (B, 3)),  # small euler velocity rotations
    ], axis=-1)
    pose = np.concatenate([
        rng.uniform(-1, 1, (B, 3)),
        np.stack([rng.uniform(-np.pi, np.pi, B),
                  rng.uniform(-1.4, 1.4, B),
                  rng.uniform(-np.pi, np.pi, B)], axis=-1),
    ], axis=-1)
    got = du.velocity_act_to_wrist_frame(
        tf.constant(vel, tf.float64), tf.constant(pose, tf.float64)).numpy()

    R = Rotation.from_euler("xyz", pose[:, 3:6]).as_matrix()
    dR = Rotation.from_euler("xyz", vel[:, 3:6]).as_matrix()
    Rinv = np.transpose(R, (0, 2, 1))
    want_t = np.einsum("bij,bj->bi", Rinv, vel[:, :3])
    dR_rel = Rinv @ dR @ R
    want_r6 = np.concatenate([dR_rel[:, 0, :], dR_rel[:, 1, :]], axis=-1)
    np.testing.assert_allclose(got[:, :3], want_t, atol=1e-10)
    np.testing.assert_allclose(got[:, 3:], want_r6, atol=1e-10)
