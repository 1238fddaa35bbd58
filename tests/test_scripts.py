"""Entry-point smoke tests: every script imports, parses its CLI, and the
serving stack round-trips a request in-process."""

import importlib.util
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent


def _load(name):
    mod_name = f"blx_script_{name}"
    spec = importlib.util.spec_from_file_location(mod_name, ROOT / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod  # dataclasses resolves annotations via sys.modules
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("script,cfg_cls,overrides", [
    ("train", "TrainConfig", ["--vla.type", "debug", "--seed", "3"]),
    ("finetune", "FinetuneConfig", ["--use_lora", "false", "--lora_rank", "16"]),
    ("deploy", "DeployConfig", ["--port", "8123"]),
    ("pretrain", "PretrainConfig", ["--stage", "align"]),
    ("generate", "GenerateConfig", ["--max_new_tokens", "16"]),
    ("verify", "VerifyConfig", ["--calls", "5"]),
    ("demo", "DemoConfig", ["--instruction", "wave"]),
    ("preprocess", "PreprocessConfig", ["--dataset_id", "llava-v15"]),
])
def test_script_config_parses(script, cfg_cls, overrides):
    from bridgelang_tpu.conf import parse_cli

    mod = _load(script)
    cfg = parse_cli(getattr(mod, cfg_cls), overrides)
    assert cfg is not None


def test_serving_roundtrip_tiny_model():
    """Boot the REST server on a tiny random model and act through the client
    — the full deploy.py wire path without the 7B weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    server = VLAServer(model, params, default_unnorm_key="bridge_orig")
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        img = np.random.default_rng(0).integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        action = client_act("127.0.0.1", port, img, "push the button")
        assert action.shape == (7,)
        assert np.isfinite(action).all()
        # nested-list payload path too (reference json_numpy style)
        action2 = client_act("127.0.0.1", port, img, "push the button", use_b64=False)
        np.testing.assert_allclose(action, action2, atol=1e-6)
        # ops observability: GET /stats reflects the served requests
        import http.client
        import json as _json

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/stats")
        stats = _json.loads(conn.getresponse().read())
        assert stats["requests"] == 2 and stats["errors"] == 0
        assert stats["latency_ms"]["window"] == 2 and stats["latency_ms"]["p50"] > 0
    finally:
        httpd.shutdown()


def test_convert_weights_config_parses():
    from bridgelang_tpu.conf import parse_cli

    mod = _load("convert_weights")
    cfg = parse_cli(mod.ConvertConfig, ["--direction", "to_hf", "--run_dir", "runs/x"])
    assert cfg.run_dir == "runs/x"


def test_train_loop_buffers_metrics_and_logs_scheduled_lr(tmp_path):
    """The hot loop must not sync device->host every step, and the logged lr
    must be the SCHEDULED value at each step, not the constant peak
    (VERDICT round 1, Weak #5)."""
    import json
    import types

    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.training.metrics import VLAMetrics, build_trackers
    from bridgelang_tpu.training.trainer import OptimConfig, make_lr_schedule

    train = _load("train")

    total_steps = 7
    ocfg = OptimConfig(learning_rate=1e-3, lr_scheduler_type="linear-warmup+cosine-decay",
                       warmup_ratio=0.5, total_steps=total_steps * 2)
    cfg = types.SimpleNamespace(profile_dir=None, log_interval=3)
    vla = types.SimpleNamespace(save_interval=10_000)

    def step_fn(state, batch):
        b = batch["input_ids"].shape[0]
        m = {
            "loss": jnp.float32(1.5), "action_accuracy": jnp.float32(0.5),
            "l1_loss": jnp.float32(0.1), "grad_norm": jnp.float32(2.0),
            "per_example_accuracy": jnp.zeros((b,)), "per_example_l1": jnp.zeros((b,)),
        }
        return state + 1, m

    def dataset():
        while True:
            yield {"input_ids": np.zeros((2, 4), np.int32), "dataset_names": ["a", "b"]}

    class NoCkpt:
        def save(self, *a, **k):
            raise AssertionError("save_interval not reached")

    metrics = VLAMetrics(build_trackers(["jsonl"], "t", tmp_path, {}), "t", is_rank_zero=True)
    end = train._train_loop(cfg, vla, ocfg, dataset(), step_fn, 0, metrics, NoCkpt(),
                            mesh=None, sharding=None, step=0, total_steps=total_steps, t_last=0.0)
    assert end == total_steps
    metrics.finalize()

    # Every step's metrics were committed (buffered flushes drop nothing,
    # including the tail past the last log_interval boundary)...
    assert len(metrics.windows["loss"]) == total_steps
    # ...and the lr window holds the SCHEDULED per-step values, not the peak.
    sched = make_lr_schedule(ocfg)
    expected = [float(sched(s)) for s in range(1, total_steps + 1)]
    assert list(metrics.windows["lr"]) == expected
    assert len(set(expected)) > 1  # warmup makes the schedule actually vary
    # trackers got pushed smoothed windows at the log_interval boundaries
    lines = [json.loads(ln) for ln in (tmp_path / "t.jsonl").read_text().splitlines()]
    assert {ln["step"] for ln in lines if "train/lr" in ln} == {3, 6}


def test_serving_micro_batching_matches_unbatched():
    """max_batch>1: concurrent requests are grouped into one batched pass and
    each client gets the SAME action the unbatched server would return."""
    import concurrent.futures
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8) for _ in range(5)]
    instructions = [f"push button {i}" for i in range(5)]

    # ground truth from the direct (unbatched) path
    expected = [model.predict_action(params, im, ins, unnorm_key="bridge_orig")
                for im, ins in zip(imgs, instructions)]

    server = VLAServer(model, params, default_unnorm_key="bridge_orig",
                       max_batch=4, batch_window_ms=50.0)
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=5) as ex:
            futs = [ex.submit(client_act, "127.0.0.1", port, im, ins)
                    for im, ins in zip(imgs, instructions)]
            results = [f.result(timeout=300) for f in futs]
        for got, want in zip(results, expected):
            np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
        # error containment still per-request under batching
        import http.client, json as _json

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/act", _json.dumps({"image": imgs[0].tolist()}),
                     {"Content-Type": "application/json"})
        assert conn.getresponse().status == 500
    finally:
        httpd.shutdown()


def test_serving_speculative_wire_path():
    """A request carrying draft_tokens returns (action, tokens); the action
    equals the plain greedy serving result, and feeding tokens back works."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    server = VLAServer(model, params, default_unnorm_key="bridge_orig")
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        img = np.random.default_rng(3).integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        plain = client_act("127.0.0.1", port, img, "stack the cups")
        a1, t1 = client_act("127.0.0.1", port, img, "stack the cups",
                            draft_tokens=np.zeros(7, np.int64), return_tokens=True)
        assert t1 is not None and t1.shape == (7,)
        np.testing.assert_allclose(a1, plain, atol=1e-5)
        # feed the returned tokens back (the control-loop pattern)
        a2, t2 = client_act("127.0.0.1", port, img, "stack the cups",
                            draft_tokens=t1, return_tokens=True)
        np.testing.assert_allclose(a2, plain, atol=1e-5)
        np.testing.assert_array_equal(t1, t2)
    finally:
        httpd.shutdown()


def test_bench_data_pipeline_smoke():
    """scripts/bench_data.py runs end-to-end on a tiny synthetic config and
    reports a positive frames/s (the host input-pipeline throughput bench)."""
    pytest.importorskip("tensorflow")
    mod = _load("bench_data")
    cfg = mod.DataBenchConfig(batch_size=4, image_px=32, traj_len=6, n_datasets=1,
                              trajs_per_dataset=4, augment=False, seconds=0.5,
                              shuffle_buffer_size=50)
    mod.main(cfg)  # prints the measurements; raises on pipeline breakage


def test_inspect_checkpoint_both_formats(tmp_path):
    """scripts/inspect_checkpoint.py summarizes HF-safetensors and Orbax
    layouts without touching a device."""
    pytest.importorskip("safetensors")
    import json

    import numpy as np_
    from safetensors.numpy import save_file

    mod = _load("inspect_checkpoint")

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    save_file({"language_model.w": np_.zeros((4, 8), np_.float32),
               "projector.b": np_.zeros((3,), np_.float32)}, str(hf_dir / "model.safetensors"))
    (hf_dir / "config.json").write_text(json.dumps({"model_type": "openvla"}))
    mod.main(mod.InspectConfig(path=str(hf_dir)))

    import jax
    import jax.numpy as jnp

    from bridgelang_tpu.training.checkpointing import CheckpointManager

    run_dir = tmp_path / "run"
    ckpt = CheckpointManager(run_dir)

    class S:
        pass

    import flax.struct as struct

    class St(struct.PyTreeNode):
        step: jnp.ndarray
        params: dict

    state = St(step=jnp.zeros((), jnp.int32), params={"w": jnp.ones((2, 3))})
    ckpt.save(state, step=5, epoch=0, loss=1.0)
    mod.main(mod.InspectConfig(path=str(run_dir)))


@pytest.mark.slow
def test_golden_record_replay_roundtrip(tmp_path):
    """scripts/verify.py golden kit, frames form: record from a tiny model,
    replay against the same weights -> every record bit-exact."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    verify = _load("verify")

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    golden = tmp_path / "g.npz"
    verify.record_golden(model, params, golden, calls=3, unnorm_key="bridge_orig")
    n_pass, n_total, failures = verify.replay_golden(model, params, golden)
    assert (n_pass, n_total) == (3, 3), failures
    # The bundle pins the serving numerics it was recorded under, so a
    # replay on a differently-quantized load explains itself.
    assert str(np.load(golden)["numerics"]) == "bf16"


@pytest.mark.slow
def test_golden_replay_warns_on_numerics_mismatch(tmp_path, capsys):
    """A golden bundle recorded under one quantization mode replayed under
    another prints the mode mismatch (the token diff alone is unexplainable)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    verify = _load("verify")

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    golden = tmp_path / "g.npz"
    verify.record_golden(model, params, golden, calls=2, unnorm_key="bridge_orig")
    # Same weights under a different declared activation mode: on this bf16
    # (non-quantized) model w8a8 is inert, so tokens still match — the test
    # isolates the warning itself.
    model.cfg = dataclasses.replace(model.cfg, llm=dataclasses.replace(model.cfg.llm, w8a8=True))
    n_pass, n_total, _ = verify.replay_golden(model, params, golden)
    out = capsys.readouterr().out
    assert "recorded under numerics 'bf16'" in out and "'bf16+w8a8'" in out
    assert (n_pass, n_total) == (2, 2)


def test_server_speculative_default_mode(tmp_path):
    """Batch-1 serving now drafts server-side from the previous tokens per
    (instruction, unnorm_key): responses carry tokens, repeated ticks stay
    greedy-equivalent (margin gate), and speculative_default=False restores
    the plain greedy wire shape."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        model.cache_dtype = jnp.float32  # exact greedy-equivalence for the test
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    img = np.random.default_rng(1).integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    greedy_srv = VLAServer(model, params, default_unnorm_key="bridge_orig", speculative_default=False)
    h0 = greedy_srv.serve_background(port=0)
    spec_srv = VLAServer(model, params, default_unnorm_key="bridge_orig")
    h1 = spec_srv.serve_background(port=0)
    try:
        greedy, g_tokens = client_act("127.0.0.1", h0.server_address[1], img, "push", return_tokens=True)
        assert g_tokens is None  # plain greedy wire shape preserved
        a1, t1 = client_act("127.0.0.1", h1.server_address[1], img, "push", return_tokens=True)
        assert t1 is not None and t1.shape == (7,)  # cold draft tick
        a2, t2 = client_act("127.0.0.1", h1.server_address[1], img, "push", return_tokens=True)
        np.testing.assert_allclose(a1, greedy, atol=1e-6)  # equivalence, cold
        np.testing.assert_allclose(a2, greedy, atol=1e-6)  # equivalence, warm
        np.testing.assert_array_equal(t1, t2)
        assert ("push", "bridge_orig") in spec_srv._draft_cache
    finally:
        h0.shutdown()
        h1.shutdown()


def test_draft_from_history():
    """Hybrid draft: static dims replay prev1, moving dims extrapolate the
    clamped step, output stays inside the action-token id range."""
    from bridgelang_tpu.serving.server import draft_from_history

    V = 32000
    prev1 = np.array([V - 100, V - 50, V - 10, V - 200, V - 2, V - 256, V - 30], np.int32)
    np.testing.assert_array_equal(draft_from_history(None, prev1, V), prev1)  # cold tick

    raw_step = np.array([0, 1, -3, 20, 0, -1, 5], np.int64)
    prev2 = (prev1 - raw_step).astype(np.int32)
    out = draft_from_history(prev2, prev1, V)
    applied = np.array([0, 0, -3, 8, 0, 0, 5])  # clamp +-8, then zero sub-2-bin steps
    np.testing.assert_array_equal(out, np.clip(prev1 + applied, V - 256, V - 1))
    assert out.dtype == np.int32


def test_server_speculative_default_auto_disables_for_int8_kv():
    import dataclasses

    import jax.numpy as jnp

    from bridgelang_tpu.serving.server import VLAServer

    class _M:
        cache_dtype = jnp.int8

    srv = VLAServer(_M(), None, default_unnorm_key="k")
    assert srv.speculative_default is False

    class _P:
        cache_dtype = jnp.float32
        parallel_decode = True  # parallel-objective model: sequential speculative would be wrong

    srv = VLAServer(_P(), None, default_unnorm_key="k")
    assert srv.speculative_default is False


def test_server_speculative_margin_passthrough():
    """speculative_margin reaches BOTH speculative call sites (server-draft
    default and the client-draft bypass) — deploy.py --speculative_margin and
    the closed-loop ceiling bench (gate 0) rely on the pass-through."""
    from bridgelang_tpu.serving.server import VLAServer

    calls = []

    class _LLM:
        vocab_size = 32000

    class _Cfg:
        llm = _LLM()

    class _M:
        cache_dtype = None
        cfg = _Cfg()
        n_action_bins = 256

        def get_action_dim(self, key):
            return 7

        def predict_action_speculative(self, params, image, instruction, draft_tokens,
                                       unnorm_key=None, margin_threshold=0.25):
            calls.append(margin_threshold)
            return np.zeros(7, np.float32), np.full(7, 31999, np.int32)

    srv = VLAServer(_M(), None, default_unnorm_key="k", speculative_margin=0.125)
    img = np.zeros((4, 4, 3), np.uint8).tolist()
    srv.predict({"image": img, "instruction": "go"})  # server-draft site
    srv.predict({"image": img, "instruction": "go",
                 "draft_tokens": [31999] * 7})        # client-draft bypass site
    assert calls == [0.125, 0.125]


def test_verify_speculative_stream(tmp_path):
    """scripts/verify.py speculative_stream: per-tick accept counts from the
    on-device gate over a frame stream with server-style drafting. On a
    REPEATED frame at margin 0 the draft is perfect after tick 1 -> accepts
    saturate at action_dim; at the production gate counts stay in range."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    verify = _load("verify")

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        model.cache_dtype = jnp.float32
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    frame = np.random.default_rng(3).integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    frames = [frame] * 5
    accepts, lat = verify.speculative_stream(model, params, frames, "push", "bridge_orig",
                                             margin_threshold=0.0)
    assert accepts.shape == (4,) and lat.shape == (4,)
    # identical frames + prev-token draft (hybrid == prev when static) -> all 7
    np.testing.assert_array_equal(accepts[1:], 7)
    acc_prod, _ = verify.speculative_stream(model, params, frames, "push", "bridge_orig",
                                            margin_threshold=0.25)
    assert ((acc_prod >= 1) & (acc_prod <= 7)).all()


def test_script_import_initializes_no_jax_backend():
    """Importing an entry-point script must not initialize a jax backend:
    initialize_overwatch runs at module import, and an eager rank query
    there hangs server startup for the whole duration of a TPU relay outage
    and defeats --force_cpu (overwatch.py::_backend_ready rationale)."""
    import subprocess

    scripts = ["deploy", "train", "finetune", "pretrain", "verify", "generate",
               "demo", "profile_serving", "inspect_checkpoint", "preprocess",
               "bench_quant_matmul"]
    loads = "; ".join(
        f"spec = importlib.util.spec_from_file_location('mod_{s}', {str(ROOT / 'scripts' / (s + '.py'))!r}); "
        f"m = importlib.util.module_from_spec(spec); sys.modules['mod_{s}'] = m; spec.loader.exec_module(m)"
        for s in scripts)
    code = (
        "import importlib.util, sys; sys.argv = ['x.py']; "
        + loads + "; "
        "from jax._src import xla_bridge; "
        "assert not xla_bridge._backends, f'backend initialized at import: {list(xla_bridge._backends)}'; "
        "print('no-backend-ok')"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       timeout=180, cwd=str(ROOT))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no-backend-ok" in r.stdout


def test_server_request_guards_and_buckets():
    """Serving guard rails: horizon is rejected on a non-parallel model and
    bounded on a parallel one; a client draft on a parallel-objective model is
    ignored (served through the parallel program, not sequential speculative);
    batch_buckets includes a non-power-of-two max_batch so every executable
    the worker can hit is warmed."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.models.vlm import VLMConfig
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import MAX_HORIZON, VLAServer, batch_buckets, client_act
    from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, StubTokenizer

    assert batch_buckets(1) == [1]
    assert batch_buckets(8) == [1, 2, 4, 8]
    assert batch_buckets(6) == [1, 2, 4, 6]

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    img = np.random.default_rng(0).integers(0, 255, size=(32, 32, 3), dtype=np.uint8)

    # Greedy (non-parallel) server: horizon must be refused, not served as
    # garbage — generate_parallel positions are untrained here.
    server = VLAServer(model, params, default_unnorm_key="bridge_orig")
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        with pytest.raises(RuntimeError, match="requires a parallel-objective model"):
            client_act("127.0.0.1", port, img, "push", horizon=2)
    finally:
        httpd.shutdown()

    # Parallel-objective server: bounded horizon works, absurd horizon is
    # refused (each value is a fresh program trace), and a client draft is
    # IGNORED — served via the parallel program (no tokens in the response),
    # never via sequential speculative decode the fine-tune did not train.
    model.parallel_decode = True
    server = VLAServer(model, params, default_unnorm_key="bridge_orig")
    assert not server.speculative_default
    httpd = server.serve_background(port=0)
    port = httpd.server_address[1]
    try:
        chunk = client_act("127.0.0.1", port, img, "push", horizon=2)
        assert chunk.shape == (2, 7)
        # Match the range-check text, not the generic "server error" prefix:
        # any 500 carries that prefix, so the generic match would also pass
        # on an unrelated failure (e.g. a type error before the range check).
        with pytest.raises(RuntimeError, match=r"must be in \[1,"):
            client_act("127.0.0.1", port, img, "push", horizon=MAX_HORIZON + 1)
        # horizon=0 is falsy: it must still reach the range check and be
        # refused, not silently served as a single (7,) action where the
        # caller expects an [H, 7] chunk.
        with pytest.raises(RuntimeError, match=r"must be in \[1,"):
            client_act("127.0.0.1", port, img, "push", horizon=0)
        action, tokens = client_act("127.0.0.1", port, img, "push",
                                    draft_tokens=np.zeros(7, np.int32), return_tokens=True)
        assert action.shape == (7,) and tokens is None
    finally:
        httpd.shutdown()
        model.parallel_decode = False
