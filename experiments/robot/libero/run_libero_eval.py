"""LIBERO closed-loop evaluation: 4 suites x 10 tasks x 50 trials.

Counterpart of reference experiments/robot/libero/run_libero_eval.py:54-286.
Requires the `libero` simulator package (not in the TPU image — run on a sim
host against a remote TPU server via --remote_host, or install libero).

  python experiments/robot/libero/run_libero_eval.py \
      --pretrained_checkpoint /ckpts/openvla-7b-libero --task_suite_name libero_spatial
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent.parent.parent))

from bridgelang_tpu.conf import parse_cli
from experiments.robot.robot_utils import (
    get_action,
    get_model,
    invert_gripper_action,
    normalize_gripper_action,
    set_seed_everywhere,
)

NUM_SETTLE_STEPS = 10  # let objects drop before acting (reference :186-193)
TASK_MAX_STEPS = {
    "libero_spatial": 220, "libero_object": 280, "libero_goal": 300,
    "libero_10": 520, "libero_90": 400,
}


@dataclass
class LiberoEvalConfig:
    model_family: str = "openvla"
    pretrained_checkpoint: str = ""
    tokenizer_path: Optional[str] = None
    remote_host: Optional[str] = None
    remote_port: int = 8000
    task_suite_name: str = "libero_spatial"
    num_trials_per_task: int = 50
    unnorm_key: Optional[str] = None
    center_crop: bool = True  # models trained with image aug need this
    speculative: bool = False  # draft = previous action tokens (greedy-equivalent, ~40% faster)
    action_chunk: int = 1  # >1: open-loop chunk execution (parallel-objective fine-tunes)
    seed: int = 7
    resolution: int = 256
    video_out_dir: Optional[str] = None
    # Observability (reference run_libero_eval.py:243-282): local txt log +
    # optional Weights & Biases (gated import — not in the TPU image).
    local_log_dir: str = "./experiments/logs"
    run_id_note: Optional[str] = None
    use_wandb: bool = False
    wandb_project: str = "bridgelang-tpu-eval"
    wandb_entity: Optional[str] = None


def get_libero_image(obs, resolution: int):
    """Agent-view camera, flipped upright (LIBERO renders upside down)."""
    img = obs["agentview_image"]
    return img[::-1, ::-1]


def main(cfg: LiberoEvalConfig) -> None:
    try:
        from libero.libero import benchmark
        from libero.libero.envs import OffScreenRenderEnv
    except ImportError as e:
        raise SystemExit(
            "LIBERO simulator not installed. Install `libero` on a sim host, or use "
            "--remote_host to query a TPU serving endpoint from that machine."
        ) from e

    set_seed_everywhere(cfg.seed)
    if cfg.unnorm_key is None:
        cfg.unnorm_key = f"{cfg.task_suite_name}_no_noops"
    model = get_model(cfg)

    suite = benchmark.get_benchmark_dict()[cfg.task_suite_name]()
    max_steps = TASK_MAX_STEPS[cfg.task_suite_name]

    # Local + wandb logging (reference :243-282)
    run_id = f"EVAL-{cfg.task_suite_name}-{cfg.model_family}-{time.strftime('%Y_%m_%d-%H_%M_%S')}"
    if cfg.run_id_note:
        run_id += f"--{cfg.run_id_note}"
    os.makedirs(cfg.local_log_dir, exist_ok=True)
    local_log_filepath = os.path.join(cfg.local_log_dir, run_id + ".txt")
    log_file = open(local_log_filepath, "w")
    print(f"Logging to local log file: {local_log_filepath}")
    wandb_run = None
    if cfg.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=cfg.wandb_project, entity=cfg.wandb_entity, name=run_id)
        except ImportError:
            print("wandb not installed; continuing with local logging only")

    def log(msg: str) -> None:
        print(msg)
        log_file.write(msg + "\n")
        log_file.flush()

    total_successes, total_episodes = 0, 0
    for task_id in range(suite.n_tasks):
        task = suite.get_task(task_id)
        env = OffScreenRenderEnv(
            bddl_file_name=str(Path(suite.get_task_bddl_file_path(task_id))),
            camera_heights=cfg.resolution, camera_widths=cfg.resolution,
        )
        task_successes = 0
        init_states = suite.get_task_init_states(task_id)
        for episode in range(cfg.num_trials_per_task):
            env.reset()
            if hasattr(model, "reset_episode"):
                model.reset_episode()  # flush pending chunk actions / drafts
            obs = env.set_init_state(init_states[episode % len(init_states)])
            frames = []
            for _ in range(NUM_SETTLE_STEPS):
                obs, *_ = env.step([0.0] * 6 + [-1.0])
            done = False
            for _ in range(max_steps):
                try:
                    img = get_libero_image(obs, cfg.resolution)
                    frames.append(img)
                    action = get_action(cfg, model, {"full_image": img}, task.language)
                    # [0,1] gripper -> [-1,1], then invert for LIBERO (-1 = open)
                    action = invert_gripper_action(normalize_gripper_action(action, binarize=True))
                    obs, reward, done, info = env.step(action.tolist())
                    if done:
                        break
                except Exception as e:  # per-step containment (reference :235-238)
                    print(f"[episode error] {e}")
                    break
            task_successes += int(done)
            total_successes += int(done)
            total_episodes += 1
            log(f"Success: {bool(done)} | episodes so far: {total_episodes} | "
                f"successes: {total_successes} ({100.0 * total_successes / total_episodes:.1f}%)")
            if cfg.video_out_dir and frames:
                _save_video(frames, Path(cfg.video_out_dir) / f"task{task_id}_ep{episode}_{'ok' if done else 'fail'}.mp4")
        env.close()
        task_rate = task_successes / max(cfg.num_trials_per_task, 1)
        log(f"[task {task_id}] {task.language!r}: {task_successes}/{cfg.num_trials_per_task} = {task_rate:.3f}")
        if wandb_run is not None:
            wandb_run.log({
                f"success_rate/{task.language}": task_rate,
                f"num_episodes/{task.language}": cfg.num_trials_per_task,
            })
    total_rate = total_successes / max(total_episodes, 1)
    log(f"TOTAL success rate: {total_successes}/{total_episodes} = {total_rate:.3f}")
    log_file.close()
    if wandb_run is not None:
        wandb_run.log({"success_rate/total": total_rate, "num_episodes/total": total_episodes})
        wandb_run.save(local_log_filepath)
        wandb_run.finish()


def _save_video(frames, path: Path) -> None:
    from experiments.robot.robot_utils import save_video

    save_video(frames, path, fps=30)


if __name__ == "__main__":
    main(parse_cli(LiberoEvalConfig))
