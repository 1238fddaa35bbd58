"""Native episode store: npz-in-TFRecord trajectories via the C++ reader.

A first-party storage path that needs neither TFDS nor tf.data file readers:
episodes are compressed npz blobs framed as TFRecords (written by the native
C++ writer with CRC32C integrity — bridgelang_tpu.native), and load through
the C++ reader into the standard RLDS trajectory pipeline via the `builder`
injection point of `make_dataset_from_rlds`.

This is the output format of experiments/robot/libero/regenerate_libero_dataset.py
and the recommended store for custom datasets in sealed environments.
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


def write_episode(writer, *, images: np.ndarray, actions: np.ndarray, states: Optional[np.ndarray] = None,
                  language: str = "", wrist_images: Optional[np.ndarray] = None) -> None:
    """Serialize one episode (arrays over time) into a native TFRecord."""
    buf = io.BytesIO()
    payload = {
        "images": np.ascontiguousarray(images),
        "actions": np.ascontiguousarray(actions.astype(np.float32)),
        "language": np.array(language),
    }
    if states is not None:
        payload["states"] = np.ascontiguousarray(states.astype(np.float32))
    if wrist_images is not None:
        payload["wrist_images"] = np.ascontiguousarray(wrist_images)
    np.savez_compressed(buf, **payload)
    writer.write(buf.getvalue())


def read_episodes(paths: Sequence[Path]) -> Iterator[Dict[str, Any]]:
    """Stream raw episode dicts from native TFRecord files."""
    from bridgelang_tpu import native

    for path in paths:
        for record in native.read_tfrecords(str(path)):
            with np.load(io.BytesIO(record), allow_pickle=False) as z:
                yield {k: z[k] for k in z.files}


class NativeEpisodeBuilder:
    """`builder` for make_dataset_from_rlds: yields RLDS-style trajectories
    (observation/action/language_instruction) from a directory of native
    TFRecord episode files."""

    def __init__(self, data_dir, image_key: str = "image", wrist_key: str = "wrist_image"):
        self.paths = sorted(Path(data_dir).glob("*.tfrecord"))
        if not self.paths:
            raise FileNotFoundError(f"no *.tfrecord under {data_dir}")
        self.image_key = image_key
        self.wrist_key = wrist_key

    def __call__(self, split: str):
        import re

        import tensorflow as tf

        # Honor the split: "train" = everything, "train[:N%]" = the first N%
        # of episodes (the loader's no-val fallback) — silently streaming the
        # full training set for a val split would make every val metric a
        # train metric.
        take_frac = None
        if split != "train":
            m = re.fullmatch(r"train\[:(\d+)%\]", split)
            if not m:
                raise ValueError(
                    f"NativeEpisodeBuilder supports 'train' and 'train[:N%]' splits, got {split!r}"
                )
            take_frac = int(m.group(1)) / 100.0

        first = next(read_episodes(self.paths))

        def to_traj(ep: Dict[str, Any]) -> Dict[str, Any]:
            t = len(ep["actions"])
            obs: Dict[str, Any] = {self.image_key: ep["images"]}
            if "wrist_images" in ep:
                obs[self.wrist_key] = ep["wrist_images"]
            if "states" in ep:
                obs["state"] = ep["states"]
            return {
                "observation": obs,
                "action": ep["actions"],
                "language_instruction": np.repeat(str(ep["language"]).encode(), t),
            }

        sig = tf.nest.map_structure(
            lambda x: tf.TensorSpec([None, *np.asarray(x).shape[1:]], tf.as_dtype(np.asarray(x).dtype)),
            to_traj(first),
        )

        def gen():
            if take_frac is None:
                for ep in read_episodes(self.paths):
                    yield to_traj(ep)
                return
            n_total = sum(1 for _ in read_episodes(self.paths))
            n_take = max(1, int(n_total * take_frac))
            for i, ep in enumerate(read_episodes(self.paths)):
                if i >= n_take:
                    break
                yield to_traj(ep)

        return tf.data.Dataset.from_generator(gen, output_signature=sig)


def native_builder_factory(root_dir) -> Any:
    """`builder_factory` for RLDSDataset: dataset name -> NativeEpisodeBuilder
    over `<root_dir>/<name>/` (mirrors the TFDS directory convention)."""

    def factory(name: str) -> NativeEpisodeBuilder:
        return NativeEpisodeBuilder(Path(root_dir) / name)

    return factory
