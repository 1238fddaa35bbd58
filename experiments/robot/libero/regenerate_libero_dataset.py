"""Regenerate LIBERO datasets: replay HDF5 demos, drop no-ops + failures,
re-render at 256px, and write RLDS-style TFRecords via the native writer.

Counterpart of reference experiments/robot/libero/regenerate_libero_dataset.py
(:46-68 `is_noop`; :112-214 replay loop). Requires `libero` + `h5py` on a sim
host. The replay contract matches the reference exactly:

  * 10 settle steps with the dummy action after set_init_state;
  * observation at time t is recorded BEFORE executing action t (obs/action
    pairs are aligned, not off by one);
  * no-op actions are skipped entirely (not executed) — a no-op is near-zero
    movement whose gripper matches the last KEPT action's gripper;
  * only successful replays are written; a metainfo JSON records per-episode
    success and initial state.

Output is this framework's native TFRecord episode store instead of HDF5
(a redesign — bridgelang_tpu.vla.datasets consumes these directly).

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

NOOP_ACTION = [0.0] * 6 + [-1.0]
NUM_SETTLE_STEPS = 10


def is_noop(action: np.ndarray, prev_action: np.ndarray = None, threshold: float = 1e-4) -> bool:
    """No movement AND unchanged gripper vs the last KEPT action
    (reference :46-68): pure stillness frames teach the policy to freeze, but
    a still robot operating its gripper is NOT a no-op."""
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

    metainfo: dict = {}
    n_kept, n_noops, n_replays, n_success = 0, 0, 0, 0
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
                obs = None
                for _ in range(NUM_SETTLE_STEPS):  # let objects drop (reference :126-128)
                    obs, reward, done, info = env.step(NOOP_ACTION)

                steps, done = [], False
                for t in range(len(actions)):
                    # prev = last KEPT action (reference :139): dropped frames
                    # must not reset the gripper-change detector.
                    prev = steps[-1]["action"] if steps else None
                    if is_noop(actions[t], prev):
                        n_noops += 1
                        continue  # no-ops are never executed (reference :140-143)
                    # Record the CURRENT observation with action t, THEN step.
                    steps.append({
                        "image": obs["agentview_image"][::-1, ::-1],
                        "wrist_image": obs["robot0_eye_in_hand_image"][::-1, ::-1],
                        "state": np.concatenate([
                            obs["robot0_eef_pos"], obs["robot0_eef_quat"], obs["robot0_gripper_qpos"],
                        ]),
                        "joint_state": np.asarray(obs["robot0_joint_pos"]),
                        "action": actions[t],
                    })
                    obs, reward, done, info = env.step(actions[t].tolist())

                n_replays += 1
                task_key = task.language.replace(" ", "_")
                metainfo.setdefault(task_key, {})[str(demo_key)] = {
                    "success": bool(done),
                    "initial_state": np.asarray(states[0]).tolist(),
                }
                if not done:  # failed replays excluded (reference :179)
                    continue
                writer.write(_serialize_episode(steps, task.language))
                n_kept += len(steps)
                n_success += 1
        writer.close()
        env.close()

    (out_root / "meta.json").write_text(json.dumps({
        "suite": cfg.libero_task_suite, "frames": n_kept,
        "replays": n_replays, "successes": n_success, "noops_dropped": n_noops,
    }))
    (out_root / f"{cfg.libero_task_suite}_metainfo.json").write_text(json.dumps(metainfo, indent=2))
    print(f"kept {n_kept} frames over {n_success}/{n_replays} successful replays "
          f"({n_noops} no-op frames dropped)")


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
        joint_states=np.stack([s["joint_state"] for s in steps]).astype(np.float32),
        actions=np.stack([s["action"] for s in steps]).astype(np.float32),
        language=np.array(language),
    )
    return buf.getvalue()


if __name__ == "__main__":
    main(parse_cli(RegenConfig))
