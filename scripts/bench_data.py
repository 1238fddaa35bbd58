"""Host data-pipeline throughput benchmark: frames/s out of the RLDS stack.

The reference's primary workload trains at global batch 2048 across 64 GPUs
with one tf.data pipeline per rank (reference: prismatic/conf/vla.py:134-136,
base_strategy.py:258-266); on a TPU pod this framework runs one pipeline per
HOST (rlds/dataset.py per-process sharding), so a host must sustain
(global_batch x steps/s) / n_hosts frames/s. This script measures the full
pipeline — synthetic 256px JPEG episodes -> restructure -> normalize ->
chunk -> weighted interleave -> shuffle -> JPEG decode + resize(224) +
augment -> batch — on the local CPUs, plus the first-party C++ TFRecord
episode store's raw read rate.

  python scripts/bench_data.py [--batch_size 32] [--augment true] [--seconds 20]
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class DataBenchConfig:
    batch_size: int = 32
    image_px: int = 256           # synthetic camera resolution (bridge: 256)
    resize_px: int = 224
    traj_len: int = 50
    n_datasets: int = 3
    trajs_per_dataset: int = 24
    augment: bool = True
    seconds: float = 20.0
    shuffle_buffer_size: int = 2000


def _synthetic_builder(n_traj: int, traj_len: int, px: int, seed: int):
    import tensorflow as tf

    rng = np.random.default_rng(seed)
    jpegs = [
        tf.io.encode_jpeg(tf.cast(rng.integers(0, 255, (px, px, 3)), tf.uint8)).numpy()
        for _ in range(8)  # a few distinct frames so decode can't be cached
    ]

    def one(i):
        r = np.random.default_rng(seed * 1000 + i)
        return {
            "observation": {
                "image_0": np.array([jpegs[j % len(jpegs)] for j in range(traj_len)]),
                "state": r.normal(size=(traj_len, 7)).astype(np.float32),
            },
            "action": r.uniform(-0.5, 0.5, size=(traj_len, 7)).astype(np.float32),
            "language_instruction": np.array([b"pick up the block"] * traj_len),
        }

    trajs = [one(i) for i in range(n_traj)]
    spec = tf.nest.map_structure(lambda x: tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)), trajs[0])

    def builder(split):
        def gen():
            yield from trajs

        return tf.data.Dataset.from_generator(gen, output_signature=spec)

    return builder


def main(cfg: DataBenchConfig) -> dict:
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    from bridgelang_tpu.vla.datasets.rlds.dataset import make_interleaved_dataset

    kwargs_list = [
        dict(
            name=f"synthetic_{i}",
            builder=_synthetic_builder(cfg.trajs_per_dataset, cfg.traj_len, cfg.image_px, seed=i),
            image_obs_keys={"primary": "image_0"},
            proprio_obs_key="state",
            language_key="language_instruction",
            action_normalization_mask=[True] * 6 + [False],
            absolute_action_mask=[False] * 6 + [True],
        )
        for i in range(cfg.n_datasets)
    ]
    frame_kwargs = dict(resize_size={"primary": (cfg.resize_px, cfg.resize_px)})
    if cfg.augment:
        frame_kwargs["image_augment_kwargs"] = dict(
            random_resized_crop=dict(scale=[0.9, 0.9], ratio=[1.0, 1.0]),
            random_brightness=[0.2],
            random_contrast=[0.8, 1.2],
            random_saturation=[0.8, 1.2],
            random_hue=[0.05],
            augment_order=[
                "random_resized_crop", "random_brightness", "random_contrast",
                "random_saturation", "random_hue",
            ],
        )
    ds = make_interleaved_dataset(
        kwargs_list,
        train=True,
        shuffle_buffer_size=cfg.shuffle_buffer_size,
        frame_transform_kwargs=frame_kwargs,
        batch_size=cfg.batch_size,
    )
    it = ds.as_numpy_iterator()
    # warm up: fill the shuffle buffer + prime threads
    for _ in range(5):
        next(it)
    n_frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < cfg.seconds:
        batch = next(it)
        n_frames += cfg.batch_size
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    import os

    n_cpu = os.cpu_count() or 1
    print(f"[data-bench] interleaved pipeline (decode+resize{'+augment' if cfg.augment else ''}): "
          f"{fps:,.0f} frames/s on this host ({n_cpu} CPU core(s); "
          f"{n_frames} frames / {dt:.1f}s, batch {cfg.batch_size})")
    # Pod math: the flagship pretrains at global batch 2048; a pod of H hosts
    # must sustain 2048/H x steps/s frames/s per host — tf.data scales the map
    # stages across cores, so per-core rate x host cores is the budget.
    print(f"[data-bench] per-core rate ~{fps / n_cpu:,.0f} frames/s; a 100-core TPU host "
          f"extrapolates to ~{fps / n_cpu * 100:,.0f} frames/s")

    # Native TFRecord episode store raw read rate.
    native = {}
    try:
        import tempfile

        from bridgelang_tpu.native import TFRecordWriter, read_tfrecords

        with tempfile.TemporaryDirectory() as d:
            path = str(Path(d) / "episodes.tfrecord")
            payload = np.random.default_rng(0).integers(0, 255, 40_000, dtype=np.uint8).tobytes()
            with TFRecordWriter(path) as w:
                for _ in range(500):
                    w.write(payload)
            t0 = time.perf_counter()
            n, nbytes = 0, 0
            for _ in range(4):
                for rec in read_tfrecords(path):
                    n += 1
                    nbytes += len(rec)
            dt = time.perf_counter() - t0
            native = {"records_per_sec": round(n / dt), "gbytes_per_sec": round(nbytes / dt / 1e9, 2)}
            print(f"[data-bench] native TFRecord reader: {n/dt:,.0f} records/s, "
                  f"{nbytes/dt/1e9:.2f} GB/s (CRC32C-verified)")
    except Exception as e:  # pragma: no cover — native lib optional
        print(f"[data-bench] native TFRecord bench skipped: {type(e).__name__}: {e}")

    # Machine-readable summary LAST (bench.py's `data` section parses this
    # line to emit the rlds_preprocess_frames_per_sec metric).
    result = {
        "frames_per_sec": round(fps, 1),
        "per_core_frames_per_sec": round(fps / n_cpu, 1),
        "n_cpu": n_cpu,
        "batch_size": cfg.batch_size,
        "augment": cfg.augment,
        "native_tfrecord": native,
    }
    print(json.dumps({"data_bench": result}), flush=True)
    return result


if __name__ == "__main__":
    main(parse_cli(DataBenchConfig))
