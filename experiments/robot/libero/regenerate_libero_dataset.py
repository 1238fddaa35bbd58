"""Regenerate LIBERO datasets: replay HDF5 demos, drop no-ops + failures,
re-render at 256px, and write RLDS-style TFRecords via the native writer.

Counterpart of reference experiments/robot/libero/regenerate_libero_dataset.py
(:1-249; `is_noop` at :46). Requires `libero` + `h5py` on a sim host.

  python experiments/robot/libero/regenerate_libero_dataset.py \
      --libero_task_suite libero_spatial --libero_raw_data_dir ./raw --out_dir ./regen
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent.parent))

from bridgelang_tpu.conf import parse_cli

NOOP_ACTION = np.array([0, 0, 0, 0, 0, 0, -1], dtype=np.float32)


def is_noop(action: np.ndarray, prev_action: np.ndarray = None, threshold: float = 1e-4) -> bool:
    """No movement + unchanged gripper (reference :46): drop such frames —
    they teach the policy to freeze."""
    no_movement = np.linalg.norm(action[:-1]) < threshold
    if prev_action is None:
        return bool(no_movement)
    return bool(no_movement and action[-1] == prev_action[-1])


@dataclass
class RegenConfig:
    libero_task_suite: str = "libero_spatial"
    libero_raw_data_dir: str = "raw"
    out_dir: str = "regenerated"
    resolution: int = 256


def main(cfg: RegenConfig) -> None:
    try:
        import h5py
        from libero.libero import benchmark
        from libero.libero.envs import OffScreenRenderEnv
    except ImportError as e:
        raise SystemExit("Requires `libero` + `h5py` (sim host).") from e

    from bridgelang_tpu import native

    suite = benchmark.get_benchmark_dict()[cfg.libero_task_suite]()
    out_root = Path(cfg.out_dir) / f"{cfg.libero_task_suite}_no_noops"
    out_root.mkdir(parents=True, exist_ok=True)

    n_kept, n_dropped = 0, 0
    for task_id in range(suite.n_tasks):
        task = suite.get_task(task_id)
        h5_path = Path(cfg.libero_raw_data_dir) / f"{task.name}_demo.hdf5"
        if not h5_path.exists():
            print(f"[skip] missing {h5_path}")
            continue
        env = OffScreenRenderEnv(
            bddl_file_name=str(suite.get_task_bddl_file_path(task_id)),
            camera_heights=cfg.resolution, camera_widths=cfg.resolution,
        )
        writer = native.TFRecordWriter(str(out_root / f"task{task_id:02d}.tfrecord"))
        with h5py.File(h5_path, "r") as f:
            for demo_key in f["data"]:
                demo = f["data"][demo_key]
                actions = np.asarray(demo["actions"])
                states = np.asarray(demo["states"])
                env.reset()
                env.set_init_state(states[0])
                steps, prev, success = [], None, False
                for t in range(len(actions)):
                    obs, reward, done, info = env.step(actions[t].tolist())
                    if is_noop(actions[t], prev):
                        n_dropped += 1
                        prev = actions[t]
                        continue
                    prev = actions[t]
                    steps.append({
                        "image": obs["agentview_image"][::-1, ::-1],
                        "wrist_image": obs["robot0_eye_in_hand_image"][::-1, ::-1],
                        "state": np.concatenate([obs["robot0_eef_pos"], obs["robot0_eef_quat"],
                                                 obs["robot0_gripper_qpos"]]),
                        "action": actions[t],
                    })
                    success = success or bool(done)
                if not success:  # failed replays excluded (reference behavior)
                    n_dropped += len(steps)
                    continue
                record = _serialize_episode(steps, task.language)
                writer.write(record)
                n_kept += len(steps)
        writer.close()
        env.close()
    print(f"kept {n_kept} frames, dropped {n_dropped}")
    (out_root / "meta.json").write_text(json.dumps({"suite": cfg.libero_task_suite, "frames": n_kept}))


def _serialize_episode(steps, language: str) -> bytes:
    """Compact npz-in-bytes episode record (self-describing; native reader +
    np.load round-trip)."""
    import io

    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        images=np.stack([s["image"] for s in steps]),
        wrist_images=np.stack([s["wrist_image"] for s in steps]),
        states=np.stack([s["state"] for s in steps]).astype(np.float32),
        actions=np.stack([s["action"] for s in steps]).astype(np.float32),
        language=np.array(language),
    )
    return buf.getvalue()


if __name__ == "__main__":
    main(parse_cli(RegenConfig))
