"""RLDS pipeline tests over in-memory trajectories (no TFDS needed) — the
pipeline stages the reference can only exercise against live GCS datasets."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from bridgelang_tpu.vla.datasets.rlds.dataset import (  # noqa: E402
    apply_frame_transforms,
    apply_trajectory_transforms,
    flatten_to_frames,
    make_dataset_from_rlds,
    make_interleaved_dataset,
)
from bridgelang_tpu.vla.datasets.rlds.utils.data_utils import (  # noqa: E402
    NormalizationType,
    allocate_threads,
    binarize_gripper_actions,
    get_dataset_statistics,
    rel2abs_gripper_actions,
)


def _traj(t=10, seed=0, with_lang=True):
    rng = np.random.default_rng(seed)
    jpeg = tf.io.encode_jpeg(tf.cast(rng.integers(0, 255, (32, 32, 3)), tf.uint8)).numpy()
    return {
        "observation": {
            "image_0": np.array([jpeg] * t),
            "state": rng.normal(size=(t, 7)).astype(np.float32),
        },
        "action": rng.uniform(-0.5, 0.5, size=(t, 7)).astype(np.float32),
        "language_instruction": np.array([b"pick up the block" if with_lang else b""] * t),
    }


def _traj_dataset(n=4, t=10):
    trajs = [_traj(t=t, seed=i) for i in range(n)]

    def gen():
        yield from trajs

    spec = tf.nest.map_structure(lambda x: tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)), trajs[0])
    return tf.data.Dataset.from_generator(gen, output_signature=spec)


def _builder(split):
    return _traj_dataset()


DATASET_KWARGS = dict(
    name="test_ds",
    builder=_builder,
    image_obs_keys={"primary": "image_0", "wrist": None},
    proprio_obs_key="state",
    language_key="language_instruction",
    action_normalization_mask=[True] * 6 + [False],
    absolute_action_mask=[False] * 6 + [True],
)


def test_make_dataset_restructures_and_normalizes(tmp_path):
    ds, stats = make_dataset_from_rlds(train=True, **DATASET_KWARGS)
    assert stats["num_trajectories"] == 4 and stats["num_transitions"] == 40
    traj = next(iter(ds.as_numpy_iterator()))
    assert set(traj["observation"].keys()) == {"image_primary", "image_wrist", "proprio"}
    assert traj["observation"]["image_wrist"][0] == b""  # missing view padded
    assert traj["task"]["language_instruction"][0] == b"pick up the block"
    assert traj["dataset_name"][0] == b"test_ds"
    # q99-normalized actions live in [-1, 1] on masked dims
    assert np.abs(traj["action"][:, :6]).max() <= 1.0 + 1e-6
    assert traj["absolute_action_mask"].shape == (10, 7)


def test_statistics_cache_roundtrip(tmp_path):
    ds = _traj_dataset()
    s1 = get_dataset_statistics(ds, ["k1"], save_dir=str(tmp_path))
    s2 = get_dataset_statistics(_traj_dataset(), ["k1"], save_dir=str(tmp_path))
    assert s1 == s2  # second call served from cache
    assert (tmp_path / f"dataset_statistics_{__import__('hashlib').sha256(b'k1').hexdigest()}.json").exists()


def test_trajectory_transforms_chunking():
    ds, _ = make_dataset_from_rlds(train=True, **DATASET_KWARGS)
    out = apply_trajectory_transforms(ds, train=True, window_size=2, future_action_window_size=1)
    traj = next(iter(out.as_numpy_iterator()))
    # [T, window, ...] observations; [T, window+future, action_dim] actions
    assert traj["observation"]["image_primary"].shape[:2] == (10, 2)
    assert traj["action"].shape == (10, 3, 7)
    assert not traj["observation"]["timestep_pad_mask"][0, 0]  # first frame's history is padding
    assert traj["observation"]["timestep_pad_mask"][0, 1]


def test_skip_unlabeled_filters():
    trajs = [_traj(seed=0, with_lang=False)]

    def gen():
        yield from trajs

    spec = tf.nest.map_structure(lambda x: tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)), trajs[0])
    builder = lambda split: tf.data.Dataset.from_generator(gen, output_signature=spec)  # noqa: E731
    kwargs = dict(DATASET_KWARGS, builder=builder)
    ds, _ = make_dataset_from_rlds(train=True, **kwargs)
    out = apply_trajectory_transforms(ds, train=True, skip_unlabeled=True)
    assert len(list(out.as_numpy_iterator())) == 0


def test_frame_pipeline_decodes_and_resizes():
    ds, _ = make_dataset_from_rlds(train=True, **DATASET_KWARGS)
    ds = apply_trajectory_transforms(ds, train=True, window_size=1)
    frames = flatten_to_frames(ds)
    frames = apply_frame_transforms(frames, train=True, resize_size=(24, 24))
    frame = next(iter(frames.as_numpy_iterator()))
    assert frame["observation"]["image_primary"].shape == (1, 24, 24, 3)
    assert frame["observation"]["image_primary"].dtype == np.uint8
    # padded wrist view synthesized as zeros
    assert frame["observation"]["image_wrist"].shape == (1, 24, 24, 3)
    assert frame["observation"]["image_wrist"].sum() == 0


def test_augmentation_changes_pixels():
    ds, _ = make_dataset_from_rlds(train=True, **DATASET_KWARGS)
    ds = apply_trajectory_transforms(ds, train=True)
    frames = flatten_to_frames(ds)
    aug_kwargs = {
        "random_brightness": [0.4],
        "augment_order": ["random_brightness"],
    }
    plain = apply_frame_transforms(flatten_to_frames(apply_trajectory_transforms(
        make_dataset_from_rlds(train=True, **DATASET_KWARGS)[0], train=True)), train=True, resize_size=(24, 24))
    auged = apply_frame_transforms(frames, train=True, resize_size=(24, 24), image_augment_kwargs=aug_kwargs)
    a = next(iter(auged.as_numpy_iterator()))["observation"]["image_primary"]
    p = next(iter(plain.as_numpy_iterator()))["observation"]["image_primary"]
    assert a.shape == p.shape


def test_interleaved_mixture_balances_and_batches():
    kwargs_a = dict(DATASET_KWARGS, name="ds_a")
    kwargs_b = dict(DATASET_KWARGS, name="ds_b")
    ds = make_interleaved_dataset(
        [kwargs_a, kwargs_b],
        [1.0, 1.0],
        train=True,
        shuffle_buffer_size=50,
        traj_transform_kwargs={"window_size": 1},
        frame_transform_kwargs={"resize_size": (24, 24)},
        balance_weights=True,
    )
    it = ds.as_numpy_iterator()
    names = [next(it)["dataset_name"] for _ in range(40)]
    assert {b"ds_a", b"ds_b"} == set(names)
    assert ds.true_length > 0
    assert abs(sum(ds.sample_weights) - 1.0) < 1e-6


def test_gripper_relabel_helpers():
    acts = tf.constant([0.0, 0.02, 0.5, 0.98, 0.5, 0.01], tf.float32)
    binarized = binarize_gripper_actions(acts).numpy()
    assert binarized[0] == 0.0 and binarized[3] == 1.0
    # intermediate 0.5 at idx 2 resolves to the NEXT definitive state (open)
    assert binarized[2] == 1.0
    # and idx 4's next definitive is closed
    assert binarized[4] == 0.0

    # Relative: -0.8 = opening command, 0.9 = closing command (RT-1 convention)
    rel = tf.constant([0.0, -0.8, 0.0, 0.9, 0.0], tf.float32)
    absg = rel2abs_gripper_actions(rel).numpy()
    # pre-first-command state = inverse of first command (closed), then open, then closed
    assert absg[0] == 0.0
    assert absg[1] == 1.0 and absg[2] == 1.0
    assert absg[3] == 0.0 and absg[4] == 0.0
    # all-hold trajectory defaults to open
    hold = rel2abs_gripper_actions(tf.zeros([4], tf.float32)).numpy()
    assert (hold == 1.0).all()


def test_binarize_trailing_intermediate_keeps_last_action():
    """A trajectory ending mid-transition keeps its final value — the reverse
    scan seeds with actions[-1], not 0 (reference data_utils.py:113-125;
    round 1 relabeled these 'closed', ADVICE.md)."""
    acts = tf.constant([0.0, 0.98, 0.5, 0.6], tf.float32)
    out = binarize_gripper_actions(acts).numpy()
    assert out[0] == 0.0 and out[1] == 1.0
    np.testing.assert_allclose(out[2:], [0.6, 0.6])


def test_degenerate_dim_zeroing_keyed_on_min_max():
    """Zeroing is keyed on min == max for BOTH bounds modes: a dim with
    q01 == q99 but min != max normalizes to clipped values, it is NOT zeroed
    (reference data_utils.py:95-99; ADVICE.md)."""
    from bridgelang_tpu.vla.datasets.rlds.utils.data_utils import normalize_action_and_proprio

    # dim0: nearly-constant (q01 == q99 == 0, min/max differ) -> clipped, not zeroed
    # dim1: strictly constant (min == max) -> zeroed
    # dim2: normal
    meta = {"action": {
        "q01": np.array([0.0, 5.0, -1.0], np.float32),
        "q99": np.array([0.0, 5.0, 1.0], np.float32),
        "min": np.array([-1.0, 5.0, -2.0], np.float32),
        "max": np.array([2.0, 5.0, 2.0], np.float32),
        "mask": np.array([True, True, True]),
    }}
    traj = {"observation": {}, "action": tf.constant([[0.5, 5.0, 0.5]], tf.float32)}
    out = normalize_action_and_proprio(traj, meta, NormalizationType.BOUNDS_Q99)["action"].numpy()
    assert out[0, 0] == 1.0, "q01==q99 with min!=max must clip to +1, not zero"
    assert out[0, 1] == 0.0, "min==max dims must map to zero"
    np.testing.assert_allclose(out[0, 2], 0.5, atol=1e-5)


def test_state_obs_keys_concat_with_zero_pad():
    """Multi-key proprio assembly: concat state_obs_keys with one zero dim per
    None slot (reference dataset.py:157-167; round 1 only accepted a single
    pre-merged key)."""
    t = 6
    rng = np.random.default_rng(3)
    jpeg = tf.io.encode_jpeg(tf.cast(rng.integers(0, 255, (16, 16, 3)), tf.uint8)).numpy()
    eef = rng.normal(size=(t, 6)).astype(np.float32)
    grip = rng.uniform(0, 1, size=(t, 1)).astype(np.float32)
    traj = {
        "observation": {"image_0": np.array([jpeg] * t), "EEF_state": eef, "gripper_state": grip},
        "action": rng.uniform(-0.5, 0.5, size=(t, 7)).astype(np.float32),
        "language_instruction": np.array([b"x"] * t),
    }

    def gen():
        yield traj

    spec = tf.nest.map_structure(lambda x: tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)), traj)
    ds, stats = make_dataset_from_rlds(
        train=True,
        name="multi_key_ds",
        builder=lambda split: tf.data.Dataset.from_generator(gen, output_signature=spec),
        image_obs_keys={"primary": "image_0"},
        state_obs_keys=["EEF_state", None, "gripper_state"],
        language_key="language_instruction",
    )
    out = next(iter(ds.as_numpy_iterator()))
    proprio = out["observation"]["proprio"]
    assert proprio.shape == (t, 8)  # 6 + 1 pad + 1
    assert (proprio[:, 6] == 0.0).all()  # the None slot (pad dim is min==max -> zeroed anyway)
    assert "proprio" in stats  # statistics computed over the assembled vector
    assert len(stats["proprio"]["mean"]) == 8
    alloc = allocate_threads(16, np.array([0.5, 0.3, 0.2]))
    assert alloc.sum() == 16 and (alloc >= 1).all()
    alloc2 = allocate_threads(3, np.array([0.9, 0.05, 0.05]))
    assert alloc2.sum() == 3 and (alloc2 >= 1).all()


def test_chunk_act_obs_goal_neutral_semantics():
    """Past-goal actions: relative dims zero, ABSOLUTE dims keep the
    goal-clamped value (reference traj_transforms.py:46-70 — a hardcoded
    neutral would force grippers open); indices clamp AT the goal."""
    from bridgelang_tpu.vla.datasets.rlds.traj_transforms import chunk_act_obs

    t = 6
    actions = np.stack([np.arange(t, dtype=np.float32) + 1,          # relative dim
                        np.zeros(t, np.float32)], axis=1)            # absolute dim (gripper, closed=0)
    traj = {
        "observation": {"x": np.arange(t, dtype=np.float32)},
        "task": {"timestep": np.full(t, 3, np.int64)},               # goal at step 3
        "action": tf.constant(actions),
        "absolute_action_mask": tf.constant(np.tile([[False, True]], (t, 1))),
    }
    out = chunk_act_obs(dict(traj), window_size=1, future_action_window_size=2)
    acts = out["action"].numpy()  # [t, 3, 2]
    # frame 2's future window covers steps 2,3,4: step 4 is past goal ->
    # relative dim zeroed, absolute dim keeps the GOAL step's value (0.0,
    # i.e. gripper stays closed, never forced open)
    np.testing.assert_allclose(acts[2, :, 0], [3.0, 4.0, 0.0])
    np.testing.assert_allclose(acts[2, :, 1], [0.0, 0.0, 0.0])
    # the action AT the goal step itself is NOT neutralized (off-by-one guard)
    np.testing.assert_allclose(acts[3, 0, 0], 4.0)
    # future indices clamp at the goal, not the trajectory end
    np.testing.assert_allclose(acts[3, 1:, 0], [0.0, 0.0])  # past goal -> neutral relative


def test_zero_action_filter_matches_reference_semantics():
    """The filter sees NORMALIZED actions; an all-zero raw chunk (normalized
    != 0) must be dropped, a moving chunk kept (reference droid_utils:151-178)."""
    from bridgelang_tpu.vla.datasets.rlds.oxe.droid_utils import zero_action_filter

    q01 = np.array([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                    -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    q99 = np.array([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                    0.6705610305070877, 0.6464948207139969, 0.8897542208433151])

    def normalize(raw):
        return 2 * (raw - q01) / (q99 - q01 + 1e-8) - 1

    idle = normalize(np.zeros((4, 6)))  # raw zero -> normalized "zero action"
    chunk_idle = {"action": tf.constant(np.concatenate([idle, np.ones((4, 1))], 1), tf.float32)}
    assert not bool(zero_action_filter(chunk_idle))  # all idle -> dropped

    moving = normalize(np.full((4, 6), 0.2))
    chunk_moving = {"action": tf.constant(np.concatenate([moving, np.ones((4, 1))], 1), tf.float32)}
    assert bool(zero_action_filter(chunk_moving))


def test_droid_chunk_filter_wired_through_materialize():
    from bridgelang_tpu.vla.datasets.rlds.oxe.droid_utils import zero_action_filter
    from bridgelang_tpu.vla.datasets.rlds.oxe.materialize import make_oxe_dataset_kwargs

    kw = make_oxe_dataset_kwargs("droid", "/data")
    assert kw["chunk_filter_fn"] is zero_action_filter
    kw2 = make_oxe_dataset_kwargs("bridge_orig", "/data")
    assert "chunk_filter_fn" not in kw2
