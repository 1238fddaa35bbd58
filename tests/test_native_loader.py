"""Native episode store -> RLDS pipeline -> training batch, end to end:
the fully first-party data path (C++ record IO, no TFDS)."""

import numpy as np
import pytest

from bridgelang_tpu import native

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from bridgelang_tpu.vla.datasets.native_loader import (  # noqa: E402
    NativeEpisodeBuilder,
    native_builder_factory,
    read_episodes,
    write_episode,
)


@pytest.fixture()
def episode_dir(tmp_path):
    rng = np.random.default_rng(0)
    ds_dir = tmp_path / "my_robot_data"
    ds_dir.mkdir()
    for shard in range(2):
        with native.TFRecordWriter(str(ds_dir / f"shard{shard}.tfrecord")) as w:
            for ep in range(3):
                t = 5 + ep
                write_episode(
                    w,
                    images=rng.integers(0, 255, (t, 24, 24, 3), dtype=np.uint8),
                    actions=rng.uniform(-0.5, 0.5, (t, 7)).astype(np.float32),
                    states=rng.normal(size=(t, 8)).astype(np.float32),
                    language=f"task number {shard}-{ep}",
                )
    return ds_dir


def test_roundtrip_episodes(episode_dir):
    eps = list(read_episodes(sorted(episode_dir.glob("*.tfrecord"))))
    assert len(eps) == 6
    assert eps[0]["images"].shape == (5, 24, 24, 3)
    assert str(eps[0]["language"]) == "task number 0-0"


def test_native_builder_through_rlds_pipeline(episode_dir):
    from bridgelang_tpu.vla.datasets.rlds.dataset import (
        apply_frame_transforms,
        apply_trajectory_transforms,
        flatten_to_frames,
        make_dataset_from_rlds,
    )

    ds, stats = make_dataset_from_rlds(
        name="my_robot_data",
        builder=NativeEpisodeBuilder(episode_dir),
        train=True,
        image_obs_keys={"primary": "image"},
        proprio_obs_key="state",
        language_key="language_instruction",
        action_normalization_mask=[True] * 6 + [False],
    )
    assert stats["num_trajectories"] == 6
    frames = apply_frame_transforms(
        flatten_to_frames(apply_trajectory_transforms(ds, train=True, window_size=1)),
        train=True, resize_size=(16, 16),
    )
    frame = next(iter(frames.as_numpy_iterator()))
    assert frame["observation"]["image_primary"].shape == (1, 16, 16, 3)
    assert np.abs(frame["action"][:, :6]).max() <= 1.0 + 1e-6


def test_factory_resolves_by_name(tmp_path, episode_dir):
    factory = native_builder_factory(episode_dir.parent)
    builder = factory("my_robot_data")
    assert len(builder.paths) == 2
