"""BridgeData V2 real-robot (WidowX) evaluation loop at 5 Hz.

Counterpart of reference experiments/robot/bridge/run_bridgev2_eval.py:37-183
+ widowx_env.py. Requires the `widowx_envs`/edgeml robot stack on the robot
workstation; the policy can run remotely on TPU via --remote_host.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent.parent.parent))

from bridgelang_tpu.conf import parse_cli
from experiments.robot.robot_utils import get_action, get_model, set_seed_everywhere

CONTROL_HZ = 5  # reference :72


@dataclass
class BridgeEvalConfig:
    model_family: str = "openvla"
    pretrained_checkpoint: str = ""
    tokenizer_path: Optional[str] = None
    remote_host: Optional[str] = None
    remote_port: int = 8000
    host_ip: str = "localhost"  # WidowX action server
    unnorm_key: str = "bridge_orig"
    max_episodes: int = 50
    max_steps: int = 60
    seed: int = 7
    blocking: bool = False
    resize_hw: int = 256


def main(cfg: BridgeEvalConfig) -> None:
    try:
        from widowx_envs.widowx_env_service import WidowXClient, WidowXConfigs
    except ImportError as e:
        raise SystemExit(
            "WidowX robot stack not installed; run on the robot workstation "
            "(policy can stay remote via --remote_host)."
        ) from e

    set_seed_everywhere(cfg.seed)
    model = get_model(cfg)

    env_params = WidowXConfigs.DefaultEnvParams.copy()
    env_params["state_state"] = [0.3, 0.0, 0.15, 0, 0, 0, 1]
    client = WidowXClient(host=cfg.host_ip)
    client.init(env_params)

    for episode in range(cfg.max_episodes):
        instruction = input("\nTask instruction (empty to quit): ").strip()
        if not instruction:
            break
        client.reset()
        rollout = []
        for step in range(cfg.max_steps):
            t_start = time.time()
            obs = client.get_observation()
            if obs is None:
                continue
            img = obs["image"].reshape(3, cfg.resize_hw, cfg.resize_hw).transpose(1, 2, 0) * 255
            img = img.astype("uint8")
            action = get_action(cfg, model, {"full_image": img}, instruction)
            rollout.append({"obs": img, "action": action})
            client.step_action(action, blocking=cfg.blocking)
            elapsed = time.time() - t_start
            time.sleep(max(0.0, 1.0 / CONTROL_HZ - elapsed))
        print(f"episode {episode}: {len(rollout)} steps")


if __name__ == "__main__":
    main(parse_cli(BridgeEvalConfig))
