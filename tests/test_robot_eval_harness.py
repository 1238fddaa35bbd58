"""Robot-eval harness tests: the pure (sim/robot-free) pieces of the LIBERO
and BridgeV2 drivers — observation conversion, pose math, episode recording,
config parsing. The simulators/robot stacks are not installable here; the
loops are exercised via a scripted fake WidowX client."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

from experiments.robot.bridge import bridgev2_utils, widowx_env  # noqa: E402


def test_convert_obs_pads_proprio_to_rlds_layout():
    s = 16
    raw = {
        "image": np.linspace(0, 1, 3 * s * s, dtype=np.float32).reshape(3 * s * s),
        "state": np.arange(7, dtype=np.float64),  # xyz+rpy+gripper
        "full_image": np.zeros((480, 640, 3), np.uint8),
    }
    obs = widowx_env.convert_obs(raw, s)
    assert obs["image_primary"].shape == (s, s, 3) and obs["image_primary"].dtype == np.uint8
    # proprio = state[:6] + zero pad + gripper (reference widowx_env.py:46-47)
    np.testing.assert_array_equal(obs["proprio"], [0, 1, 2, 3, 4, 5, 0, 6])
    assert obs["full_image"].shape == (480, 640, 3)


def test_null_obs_shapes():
    obs = widowx_env.null_obs(64)
    assert obs["image_primary"].shape == (64, 64, 3)
    assert obs["proprio"].shape == (8,)


def test_state_to_eep_is_rigid_transform():
    pose = widowx_env.state_to_eep([0.3, -0.09, 0.26], 0.4)
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(pose[:3, -1], [0.3, -0.09, 0.26])
    r = pose[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)
    # zangle=0 reduces to the default tool rotation
    pose0 = widowx_env.state_to_eep([0, 0, 0], 0.0)
    np.testing.assert_allclose(pose0[:3, :3], widowx_env._DEFAULT_ROTATION, atol=1e-9)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    m = widowx_env._quat_to_matrix(q)
    q2 = widowx_env._matrix_to_quat(m)
    # quaternions are sign-ambiguous
    assert np.allclose(q, q2, atol=1e-9) or np.allclose(q, -q2, atol=1e-9)


class _FakeClient:
    """Scripted WidowXClient: returns one obs, then drops the connection."""

    def __init__(self, im_size=16):
        self.im_size = im_size
        self.actions = []
        self._dropped = False

    def step_action(self, action, blocking=False):
        self.actions.append(np.asarray(action))

    def get_observation(self):
        if self._dropped:
            return None
        return {
            "image": np.zeros(3 * self.im_size * self.im_size, np.float32),
            "state": np.zeros(7, np.float64),
        }

    def drop(self):
        self._dropped = True

    def reset(self):
        pass

    def move(self, transform, duration=0.8, blocking=True):
        self.moved_to = transform


def test_widowxgym_step_and_truncation():
    client = _FakeClient()
    env = widowx_env.WidowXGym(client, cfg=None, im_size=16, blocking=False)
    obs, r, done, truncated, info = env.step(np.zeros(7))
    assert not truncated and obs["image_primary"].shape == (16, 16, 3)
    assert len(client.actions) == 1
    client.drop()
    obs, r, done, truncated, info = env.step(np.zeros(7))
    assert truncated  # lost connection truncates instead of crashing
    np.testing.assert_array_equal(obs["proprio"], np.zeros(8))


def test_save_rollout_video_and_data(tmp_path):
    frames = [np.zeros((32, 32, 3), np.uint8) for _ in range(4)]
    p = bridgev2_utils.save_rollout_video(frames, 0, out_dir=str(tmp_path))
    assert p is not None and Path(p).exists() and Path(p).stat().st_size > 0
    assert bridgev2_utils.save_rollout_video([], 1, out_dir=str(tmp_path)) is None

    dp = bridgev2_utils.save_rollout_data(frames, frames, [np.zeros(8)] * 4, [np.zeros(7)] * 4,
                                          0, out_dir=str(tmp_path))
    data = np.load(dp)
    assert data["actions"].shape == (4, 7) and data["states"].shape == (4, 8)


@pytest.mark.parametrize("script,cfg_name", [
    ("experiments/robot/bridge/run_bridgev2_eval.py", "BridgeEvalConfig"),
    ("experiments/robot/libero/run_libero_eval.py", "LiberoEvalConfig"),
])
def test_eval_configs_parse(script, cfg_name):
    from bridgelang_tpu.conf import parse_cli

    mod_name = f"blx_eval_{Path(script).stem}"
    spec = importlib.util.spec_from_file_location(mod_name, ROOT / script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    cfg = parse_cli(getattr(mod, cfg_name), ["--seed", "3"])
    assert cfg.seed == 3


def test_libero_regen_is_noop_semantics():
    """A still robot that operates its gripper is NOT a no-op, and the
    comparison baseline is the last KEPT action (reference
    regenerate_libero_dataset.py:46-68,139)."""
    spec = importlib.util.spec_from_file_location(
        "blx_regen", ROOT / "experiments/robot/libero/regenerate_libero_dataset.py")
    regen = importlib.util.module_from_spec(spec)
    sys.modules["blx_regen"] = regen
    spec.loader.exec_module(regen)

    still_open = np.array([0, 0, 0, 0, 0, 0, 1.0])
    still_close = np.array([0, 0, 0, 0, 0, 0, -1.0])
    move = np.array([0.1, 0, 0, 0, 0, 0, 1.0])

    assert regen.is_noop(still_open, None)                 # first frame, no movement
    assert regen.is_noop(still_open, still_open)           # still + same gripper
    assert not regen.is_noop(still_close, still_open)      # gripper change = real action
    assert not regen.is_noop(move, still_open)              # movement = real action


def test_libero_regen_episode_serialization_roundtrip():
    spec = importlib.util.spec_from_file_location(
        "blx_regen2", ROOT / "experiments/robot/libero/regenerate_libero_dataset.py")
    regen = importlib.util.module_from_spec(spec)
    sys.modules["blx_regen2"] = regen
    spec.loader.exec_module(regen)

    steps = [{
        "image": np.zeros((8, 8, 3), np.uint8),
        "wrist_image": np.zeros((8, 8, 3), np.uint8),
        "state": np.arange(9, dtype=np.float64),
        "joint_state": np.arange(7, dtype=np.float64),
        "action": np.arange(7, dtype=np.float64),
    }] * 3
    blob = regen._serialize_episode(steps, "put the bowl on the stove")
    import io

    data = np.load(io.BytesIO(blob))
    assert data["images"].shape == (3, 8, 8, 3)
    assert data["joint_states"].shape == (3, 7)
    assert str(data["language"]) == "put the bowl on the stove"


def test_libero_eval_main_end_to_end(tmp_path, monkeypatch):
    """Drive run_libero_eval.main() START TO FINISH in remote-policy mode: a
    fake `libero` package (benchmark dict + OffScreenRenderEnv) + the tiny
    in-process REST server. Covers the episode loop, settle steps, center
    crop, gripper normalize/invert, per-step error containment, and success
    accounting (reference contract run_libero_eval.py:186-238)."""
    import dataclasses
    import types

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    # --- tiny in-process REST policy server ---
    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg_m = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg_m, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig
    httpd = VLAServer(model, params, default_unnorm_key="bridge_orig").serve_background(port=0)
    port = httpd.server_address[1]

    # --- fake `libero` package ---
    recorded = {"actions": [], "episodes": 0}
    NUM_SETTLE = 10

    class FakeEnv:
        def __init__(self, bddl_file_name, camera_heights, camera_widths):
            self.h, self.w = camera_heights, camera_widths
            self.steps = 0
            self.fail_mode = False

        def _obs(self):
            img = np.full((self.h, self.w, 3), 7, np.uint8)
            img[0, 0] = [1, 2, 3]  # corner marker: get_libero_image must flip
            return {"agentview_image": img}

        def reset(self):
            self.steps = 0
            return self._obs()

        def set_init_state(self, state):
            recorded["episodes"] += 1
            self.fail_mode = bool(state[0])  # init state #2 scripts a failure
            return self._obs()

        def step(self, action):
            self.steps += 1
            a = np.asarray(action, np.float64)
            if self.steps > NUM_SETTLE:  # a policy action, not a settle step
                recorded["actions"].append(a)
                if self.fail_mode:
                    raise RuntimeError("scripted env crash")  # containment path
            done = (not self.fail_mode) and self.steps >= NUM_SETTLE + 3
            return self._obs(), 0.0, done, {}

        def close(self):
            pass

    class FakeTask:
        language = "put the bowl on the plate"

    class FakeSuite:
        n_tasks = 1

        def get_task(self, i):
            return FakeTask()

        def get_task_bddl_file_path(self, i):
            return str(tmp_path / "task.bddl")

        def get_task_init_states(self, i):
            return [np.array([0.0]), np.array([1.0])]

    benchmark = types.ModuleType("libero.libero.benchmark")
    benchmark.get_benchmark_dict = lambda: {"libero_spatial": FakeSuite}
    envs = types.ModuleType("libero.libero.envs")
    envs.OffScreenRenderEnv = FakeEnv
    libero_inner = types.ModuleType("libero.libero")
    libero_inner.benchmark = benchmark
    libero_inner.envs = envs
    libero_outer = types.ModuleType("libero")
    libero_outer.libero = libero_inner
    for name, mod in [("libero", libero_outer), ("libero.libero", libero_inner),
                      ("libero.libero.benchmark", benchmark), ("libero.libero.envs", envs)]:
        monkeypatch.setitem(sys.modules, name, mod)

    spec = importlib.util.spec_from_file_location(
        "blx_libero_e2e", ROOT / "experiments/robot/libero/run_libero_eval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["blx_libero_e2e"] = mod
    spec.loader.exec_module(mod)

    cfg = mod.LiberoEvalConfig(
        remote_host="127.0.0.1", remote_port=port, task_suite_name="libero_spatial",
        num_trials_per_task=2, unnorm_key="bridge_orig", center_crop=True,
        resolution=32, local_log_dir=str(tmp_path / "logs"), use_wandb=False,
    )
    try:
        mod.main(cfg)
    finally:
        httpd.shutdown()

    # Episode 1 succeeds, episode 2's env crash is contained -> 1/2.
    logs = list((tmp_path / "logs").glob("EVAL-*.txt"))
    assert len(logs) == 1
    text = logs[0].read_text()
    assert "TOTAL success rate: 1/2 = 0.500" in text
    assert recorded["episodes"] == 2
    # Policy actions reached the env with the LIBERO gripper convention:
    # server's [0,1] gripper -> normalized+binarized [-1,1] -> INVERTED.
    acts = np.stack(recorded["actions"])
    assert acts.shape[1] == 7
    assert set(np.unique(acts[:, -1])) <= {-1.0, 1.0}
    # The env-side gripper must be the POLICY's raw [0,1] gripper, normalized
    # to [-1,1], binarized, then inverted (LIBERO: -1 = open). Recompute the
    # expectation from a direct server query on the same frame.
    from bridgelang_tpu.serving.server import client_act

    httpd2 = VLAServer(model, params, default_unnorm_key="bridge_orig").serve_background(port=0)
    try:
        img = np.full((32, 32, 3), 7, np.uint8)
        img[0, 0] = [1, 2, 3]
        raw = client_act("127.0.0.1", httpd2.server_address[1], img[::-1, ::-1], "put the bowl on the plate")
    finally:
        httpd2.shutdown()
    expected = -np.sign(2.0 * raw[-1] - 1.0)
    assert (acts[:, -1] == expected).all()


def test_chunk_queue_open_loop_execution(monkeypatch):
    """action_chunk>1: one chunk fetch feeds H control ticks, a task change
    flushes the queue, and RemoteVLA passes horizon over the wire."""
    import numpy as np

    from experiments.robot.openvla_utils import RemoteVLA, _ChunkQueue

    calls = []

    def fetch(h):
        calls.append(h)
        return np.arange(h * 7, dtype=np.float32).reshape(h, 7) + len(calls) * 100

    q = _ChunkQueue(3)
    a0 = q.next(("taskA", "k"), fetch)
    a1 = q.next(("taskA", "k"), fetch)
    a2 = q.next(("taskA", "k"), fetch)
    assert calls == [3]  # one fetch for three ticks
    np.testing.assert_array_equal(a1 - a0, 7.0)
    q.next(("taskA", "k"), fetch)
    assert calls == [3, 3]  # drained -> refetch
    q.next(("taskB", "k"), fetch)
    assert calls == [3, 3, 3]  # task change flushes mid-chunk

    seen = {}

    def fake_client_act(host, port, image, instruction, unnorm_key=None, **kw):
        seen.update(kw)
        return np.zeros((kw["horizon"], 7), np.float32)

    import bridgelang_tpu.serving.server as server_mod

    monkeypatch.setattr(server_mod, "client_act", fake_client_act)
    vla = RemoteVLA("h", 1, action_chunk=4)
    out = vla.predict(np.zeros((8, 8, 3), np.uint8), "push", "bridge_orig")
    assert seen["horizon"] == 4 and out.shape == (7,)
