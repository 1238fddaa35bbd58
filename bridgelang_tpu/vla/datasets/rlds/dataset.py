"""RLDS trajectory pipeline: restructure -> normalize -> transform -> interleave.

Counterpart of reference prismatic/vla/datasets/rlds/dataset.py:39-588 (the
Octo/dlimp-derived tf.data stack). Same pipeline stages and semantics —
per-dataset restructuring via standardize_fn, statistics-driven q99
normalization, trajectory/frame transforms, size-balanced weighted
interleaving with per-dataset thread allocation — rebuilt on plain tf.data
(no dlimp dependency) and with TFDS loading behind an injectable `builder`
so the whole pipeline is testable from in-memory trajectories.

TPU topology note: on a pod each HOST builds this pipeline over its shard
(`shard_by_process=True`), replacing the reference's one-pipeline-per-GPU-rank
model (base_strategy.py:258-266).
"""

from __future__ import annotations

import inspect
import json
from functools import partial
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np
import tensorflow as tf

from bridgelang_tpu.vla.datasets.rlds import obs_transforms, traj_transforms
from bridgelang_tpu.vla.datasets.rlds.utils import goal_relabeling, task_augmentation
from bridgelang_tpu.vla.datasets.rlds.utils.data_utils import (
    NormalizationType,
    allocate_threads,
    get_dataset_statistics,
    normalize_action_and_proprio,
    pprint_data_mixture,
    to_padding,
)


def _get_builder(name: str, data_dir: Optional[str]):
    import tensorflow_datasets as tfds  # gated: not in all images

    return tfds.builder(name, data_dir=data_dir)


def make_dataset_from_rlds(
    name: str,
    data_dir: Optional[str] = None,
    *,
    train: bool,
    standardize_fn: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
    shuffle: bool = True,
    image_obs_keys: Mapping[str, Optional[str]] = None,
    depth_obs_keys: Mapping[str, Optional[str]] = None,
    proprio_obs_key: Optional[str] = None,
    state_obs_keys: Optional[Sequence[Optional[str]]] = None,
    language_key: Optional[str] = None,
    action_proprio_normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99,
    dataset_statistics: Optional[Union[str, Dict[str, Any]]] = None,
    absolute_action_mask: Optional[Sequence[bool]] = None,
    action_normalization_mask: Optional[Sequence[bool]] = None,
    num_parallel_reads: int = tf.data.AUTOTUNE,
    num_parallel_calls: int = tf.data.AUTOTUNE,
    builder=None,
    shard_by_process: bool = True,
) -> Tuple[tf.data.Dataset, Dict[str, Any]]:
    """Load + restructure one RLDS dataset into the canonical trajectory
    format (reference dataset.py:39-200):

        {observation: {image_<new>: ..., proprio}, task: {language_instruction},
         action: float32 [T, D], dataset_name}

    `builder` injection (any object with `.as_dataset(split=...)` yielding
    episodes with a "steps" sub-dataset, or a callable returning a trajectory
    tf.data.Dataset) replaces TFDS for tests and custom stores.
    """
    image_obs_keys = image_obs_keys or {}
    depth_obs_keys = depth_obs_keys or {}

    def restructure(traj: Dict[str, Any]) -> Dict[str, Any]:
        if standardize_fn is not None:
            traj = standardize_fn(traj)
        traj_len = tf.shape(traj["action"])[0]
        old_obs = traj["observation"]
        new_obs = {}
        for new, old in image_obs_keys.items():
            if old is None:
                new_obs[f"image_{new}"] = tf.repeat("", traj_len)  # padding
            else:
                new_obs[f"image_{new}"] = old_obs[old]
        for new, old in depth_obs_keys.items():
            if old is None:
                new_obs[f"depth_{new}"] = tf.repeat("", traj_len)
            else:
                new_obs[f"depth_{new}"] = old_obs[old]
        if state_obs_keys:
            # Concatenate raw state keys into one proprio vector, zero-padding
            # each None slot with one dim (reference dataset.py:157-167).
            new_obs["proprio"] = tf.concat(
                [
                    tf.zeros((traj_len, 1), dtype=tf.float32) if key is None
                    else tf.cast(old_obs[key], tf.float32)
                    for key in state_obs_keys
                ],
                axis=1,
            )
        elif proprio_obs_key is not None:
            new_obs["proprio"] = tf.cast(old_obs[proprio_obs_key], tf.float32)

        task = {}
        if language_key is not None:
            task["language_instruction"] = traj.pop(language_key)

        out = {
            "observation": new_obs,
            "task": task,
            "action": tf.cast(traj["action"], tf.float32),
            "dataset_name": tf.repeat(name, traj_len),
        }
        if absolute_action_mask is not None:
            out["absolute_action_mask"] = tf.tile(
                tf.constant(absolute_action_mask, dtype=tf.bool)[None], [traj_len, 1]
            )
        return out

    def episodes_to_trajs(episodes: tf.data.Dataset) -> tf.data.Dataset:
        """RLDS episodes ({"steps": Dataset}) -> batched whole-trajectory dicts."""

        def to_traj(episode):
            steps = episode["steps"].batch(int(1e9)).get_single_element()
            traj = {
                "observation": steps["observation"],
                "action": steps["action"],
            }
            for k in steps:
                if k not in ("observation", "action"):
                    traj[k] = steps[k]
            return traj

        return episodes.map(to_traj, num_parallel_calls=num_parallel_calls)

    if builder is None:
        builder = _get_builder(name, data_dir)

    split = "train" if train else ("val" if _has_split(builder, "val") else "train[:5%]")
    unsharded_trajs = None  # statistics source (must span ALL hosts' data)
    n_proc, proc_idx = 1, 0
    if shard_by_process:
        import jax

        n_proc, proc_idx = jax.process_count(), jax.process_index()
    if callable(builder) and not hasattr(builder, "as_dataset"):
        dataset = builder(split)
        if n_proc > 1:
            unsharded_trajs = builder(split)
            dataset = dataset.shard(n_proc, proc_idx)
    else:
        read_config = None
        try:
            import tensorflow_datasets as tfds

            # Multi-host sharding is only a PARTITION if every host reads the
            # files in the same order — a per-host random file shuffle would
            # make shards overlap and drop episodes. Fix the shuffle seed
            # per-dataset when sharding (zlib.crc32: stable across hosts,
            # unlike salted hash()); single-host keeps free-running shuffles
            # (the 250k-frame shuffle buffer does the real mixing).
            import zlib

            seed = (zlib.crc32(name.encode("utf-8")) % (2**31 - 1)) if n_proc > 1 else None
            read_config = tfds.ReadConfig(
                shuffle_seed=seed,
                num_parallel_calls_for_interleave_files=num_parallel_reads,
                interleave_cycle_length=num_parallel_reads,
            )
        except ImportError:
            pass
        kwargs = dict(split=split, shuffle_files=shuffle and train)
        if read_config is not None:
            kwargs["read_config"] = read_config
        episodes = builder.as_dataset(**kwargs)
        if n_proc > 1:
            # Training shards per host, but statistics must NOT: every
            # host has to normalize with identical full-dataset stats and
            # the dataset_statistics.json sidecar must describe the whole
            # dataset (reference computes stats before any sharding).
            unsharded_trajs = episodes_to_trajs(episodes)
            episodes = episodes.shard(n_proc, proc_idx)
        dataset = episodes_to_trajs(episodes)

    dataset = dataset.map(restructure, num_parallel_calls=num_parallel_calls)

    # Statistics: load from path/dict, or compute with the hash cache.
    if isinstance(dataset_statistics, str):
        with tf.io.gfile.GFile(dataset_statistics, "r") as f:
            dataset_statistics = json.load(f)
    elif dataset_statistics is None:
        deps = [
            name,
            str(split),
            inspect.getsource(standardize_fn) if standardize_fn is not None else "",
            str(proprio_obs_key),
            str(state_obs_keys),
        ]
        stats_source = dataset
        if unsharded_trajs is not None:
            stats_source = unsharded_trajs.map(restructure, num_parallel_calls=num_parallel_calls)
        dataset_statistics = get_dataset_statistics(stats_source, hash_dependencies=deps)
    dataset_statistics = _tree_np(dataset_statistics)

    # Gripper (and any masked-off dims) are excluded from normalization
    # (reference oxe/materialize.py:37-42 builds this mask).
    if action_normalization_mask is not None:
        dataset_statistics["action"]["mask"] = np.asarray(action_normalization_mask, dtype=bool)

    dataset = dataset.map(
        partial(
            normalize_action_and_proprio,
            metadata=dataset_statistics,
            normalization_type=action_proprio_normalization_type,
        ),
        num_parallel_calls=num_parallel_calls,
    )
    return dataset, dataset_statistics


def _has_split(builder, split: str) -> bool:
    try:
        return split in builder.info.splits
    except Exception:
        return False


def _tree_np(stats: Any) -> Any:
    if isinstance(stats, dict):
        return {k: _tree_np(v) for k, v in stats.items()}
    if isinstance(stats, (list, tuple)):
        return np.asarray(stats)
    return stats


def apply_trajectory_transforms(
    dataset: tf.data.Dataset,
    *,
    train: bool,
    goal_relabeling_strategy: Optional[str] = None,
    goal_relabeling_kwargs: Optional[Dict[str, Any]] = None,
    window_size: int = 1,
    future_action_window_size: int = 0,
    subsample_length: Optional[int] = None,
    skip_unlabeled: bool = False,
    max_action: Optional[float] = None,
    max_proprio: Optional[float] = None,
    task_augment_strategy: Optional[str] = None,
    task_augment_kwargs: Optional[Dict[str, Any]] = None,
    num_parallel_calls: int = tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """Filters + trajectory-level transforms (reference dataset.py:203-310)."""
    if skip_unlabeled:
        dataset = dataset.filter(
            lambda t: tf.math.reduce_any(t["task"]["language_instruction"] != "")
        )
    if max_action is not None:
        dataset = dataset.filter(
            lambda t: tf.math.reduce_all(tf.math.abs(t["action"]) <= max_action)
        )
    if max_proprio is not None:
        dataset = dataset.filter(
            lambda t: ("proprio" not in t["observation"])
            or tf.math.reduce_all(tf.math.abs(t["observation"]["proprio"]) <= max_proprio)
        )

    dataset = dataset.map(traj_transforms.add_pad_mask_dict, num_parallel_calls=num_parallel_calls)

    if goal_relabeling_strategy is not None:
        fn = goal_relabeling.GOAL_RELABELING_FUNCTIONS[goal_relabeling_strategy]
        dataset = dataset.map(partial(fn, **(goal_relabeling_kwargs or {})), num_parallel_calls=num_parallel_calls)

    if train and task_augment_strategy is not None:
        fn = task_augmentation.TASK_AUGMENT_FUNCTIONS[task_augment_strategy]
        dataset = dataset.map(partial(fn, **(task_augment_kwargs or {})), num_parallel_calls=num_parallel_calls)

    dataset = dataset.map(
        partial(
            traj_transforms.chunk_act_obs,
            window_size=window_size,
            future_action_window_size=future_action_window_size,
        ),
        num_parallel_calls=num_parallel_calls,
    )

    if train and subsample_length is not None:
        dataset = dataset.map(
            partial(traj_transforms.subsample, subsample_length=subsample_length),
            num_parallel_calls=num_parallel_calls,
        )
    return dataset


def flatten_to_frames(dataset: tf.data.Dataset, num_parallel_calls: int = tf.data.AUTOTUNE) -> tf.data.Dataset:
    """Trajectories -> individual frames (dlimp's .flatten())."""
    return dataset.interleave(
        lambda traj: tf.data.Dataset.from_tensor_slices(traj),
        cycle_length=1,
        num_parallel_calls=num_parallel_calls,
    )


def apply_frame_transforms(
    dataset: tf.data.Dataset,
    *,
    train: bool,
    image_augment_kwargs: Optional[Union[Dict, Mapping]] = None,
    resize_size: Optional[Union[Tuple[int, int], Dict[str, Tuple[int, int]]]] = None,
    depth_resize_size: Optional[Union[Tuple[int, int], Dict[str, Tuple[int, int]]]] = None,
    num_parallel_calls: int = tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """Per-frame decode/resize/augment over the chunked observation window
    (reference dataset.py:313-424). Frames carry observation[window, ...]."""

    def decode_fn(frame):
        obs = frame["observation"]
        frame["observation"] = _map_window(
            partial(obs_transforms.decode_and_resize, resize_size=resize_size, depth_resize_size=depth_resize_size),
            obs,
        )
        if "task" in frame and any(k.startswith("image_") for k in frame["task"]):
            task_imgs = {k: v for k, v in frame["task"].items() if k.startswith("image_") or k.startswith("depth_")}
            task_imgs = obs_transforms.decode_and_resize(task_imgs, resize_size=resize_size, depth_resize_size=depth_resize_size)
            frame["task"] = dict(frame["task"], **task_imgs)
        return frame

    dataset = dataset.map(decode_fn, num_parallel_calls=num_parallel_calls)

    if train and image_augment_kwargs:

        def aug_fn(frame):
            seed = tf.random.uniform([], maxval=2**31 - 1, dtype=tf.int32)
            frame["observation"] = _map_window(
                partial(obs_transforms.augment, seed=seed, augment_kwargs=image_augment_kwargs),
                frame["observation"],
            )
            return frame

        dataset = dataset.map(aug_fn, num_parallel_calls=num_parallel_calls)
    return dataset


def _map_window(fn, obs: Dict[str, Any]) -> Dict[str, Any]:
    """Apply a per-image fn across the [window, ...] leading dim by unstacking
    (window sizes are tiny — 1 for VLA — so unrolling beats tf.map_fn)."""
    window = None
    for k, v in obs.items():
        if k.startswith("image_") or k.startswith("depth_"):
            window = v.shape[0]
            break
    if window is None:
        return obs
    steps = []
    for i in range(int(window)):
        step = {k: v[i] for k, v in obs.items() if k.startswith("image_") or k.startswith("depth_")}
        steps.append(fn(step))
    out = dict(obs)
    for k in steps[0]:
        out[k] = tf.stack([s[k] for s in steps], axis=0)
    return out


def make_single_dataset(
    dataset_kwargs: Dict[str, Any],
    *,
    train: bool,
    traj_transform_kwargs: Optional[Dict[str, Any]] = None,
    frame_transform_kwargs: Optional[Dict[str, Any]] = None,
) -> tf.data.Dataset:
    """One dataset, trajectory-level output (reference dataset.py:427-454).
    chunk_filter_fn is frame-level and does not apply here (as in the
    reference, where only the interleaved pipeline consumes it)."""
    dataset_kwargs = {k: v for k, v in dataset_kwargs.items() if k != "chunk_filter_fn"}
    dataset, statistics = make_dataset_from_rlds(train=train, **dataset_kwargs)
    dataset = apply_trajectory_transforms(dataset, train=train, **(traj_transform_kwargs or {}))
    dataset.dataset_statistics = statistics
    return dataset


def make_interleaved_dataset(
    dataset_kwargs_list: List[Dict[str, Any]],
    sample_weights: Optional[Sequence[float]] = None,
    *,
    train: bool,
    shuffle_buffer_size: int,
    traj_transform_kwargs: Optional[Dict[str, Any]] = None,
    frame_transform_kwargs: Optional[Dict[str, Any]] = None,
    balance_weights: bool = False,
    traj_transform_threads: Optional[int] = None,
    traj_read_threads: Optional[int] = None,
    batch_size: Optional[int] = None,
) -> tf.data.Dataset:
    """Weighted mixture of datasets (reference dataset.py:457-588):
    per-dataset traj pipelines -> flatten -> repeat -> weighted sampling ->
    shuffle buffer -> frame transforms -> optional batching."""
    sample_weights = list(sample_weights) if sample_weights else [1.0] * len(dataset_kwargs_list)
    assert len(sample_weights) == len(dataset_kwargs_list)

    # Pass 1: statistics + per-dataset frame counts.
    all_statistics = {}
    lengths = []
    for kwargs in dataset_kwargs_list:
        _, stats = make_dataset_from_rlds(
            train=train, **{k: v for k, v in kwargs.items() if k != "chunk_filter_fn"})
        all_statistics[kwargs["name"]] = stats
        lengths.append(int(stats["num_transitions"]))

    if balance_weights:
        sample_weights = list(np.asarray(sample_weights) * np.asarray(lengths))
    total = sum(sample_weights)
    sample_weights = [w / total for w in sample_weights]

    # Effective length = frames contributed before the largest dataset repeats
    # (reference dataset.py:523-525).
    dataset_len = int(min(length / weight for length, weight in zip(lengths, sample_weights) if weight > 0))

    threads_per_dataset = allocate_threads(traj_transform_threads, np.asarray(sample_weights))
    reads_per_dataset = allocate_threads(traj_read_threads, np.asarray(sample_weights))

    datasets = []
    for kwargs, transform_threads, read_threads in zip(dataset_kwargs_list, threads_per_dataset, reads_per_dataset):
        chunk_filter_fn = kwargs.get("chunk_filter_fn")
        ds, _ = make_dataset_from_rlds(
            train=train,
            num_parallel_reads=int(read_threads),
            num_parallel_calls=int(transform_threads),
            dataset_statistics=all_statistics[kwargs["name"]],
            **{k: v for k, v in kwargs.items()
               if k not in ("num_parallel_reads", "num_parallel_calls", "chunk_filter_fn")},
        )
        ds = apply_trajectory_transforms(
            ds.repeat(), train=train, num_parallel_calls=int(transform_threads), **(traj_transform_kwargs or {})
        )
        ds = flatten_to_frames(ds)
        if chunk_filter_fn is not None:
            # per-dataset frame filter (reference dataset.py:354-366 —
            # droid's zero-action chunk filter runs post-normalization)
            ds = ds.filter(chunk_filter_fn)
        datasets.append(ds)

    dataset = tf.data.Dataset.sample_from_datasets(datasets, sample_weights)
    dataset = dataset.shuffle(shuffle_buffer_size)
    dataset = apply_frame_transforms(dataset, train=train, **(frame_transform_kwargs or {}))
    if batch_size is not None:
        dataset = dataset.batch(batch_size, drop_remainder=True)
    dataset = dataset.with_options(_performance_options())
    dataset = dataset.prefetch(tf.data.AUTOTUNE)
    dataset.dataset_statistics = all_statistics
    dataset.sample_weights = sample_weights
    dataset.true_length = dataset_len
    print(pprint_data_mixture(dataset_kwargs_list, sample_weights))
    return dataset


def _performance_options() -> tf.data.Options:
    opts = tf.data.Options()
    opts.autotune.enabled = True
    opts.experimental_optimization.map_fusion = True
    opts.experimental_optimization.map_and_filter_fusion = True
    opts.deterministic = False
    return opts
