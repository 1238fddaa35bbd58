"""Batch transform / collator / end-to-end tiny training smoke test."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import bridgelang_tpu.models.vlm as vlm_mod
from bridgelang_tpu.models.vision.vit import ViT
from bridgelang_tpu.models.vlm import IGNORE_INDEX, LLAMA_EMPTY_TOKEN, PrismaticVLM, VLMConfig
from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer
from bridgelang_tpu.vla.datasets.datasets import (
    DummyDataset,
    EOS_TOKEN_ID,
    PaddedCollatorForActionPrediction,
    RLDSBatchTransform,
)
from tests.helpers import TINY_LLM, TINY_VIT, StubTokenizer


def _transform():
    tok = StubTokenizer()
    return RLDSBatchTransform(ActionTokenizer(tok), tok)


def _frame():
    rng = np.random.default_rng(0)
    return {
        "dataset_name": b"bridge_orig",
        "action": rng.uniform(-1, 1, size=(1, 7)).astype(np.float32),
        "observation": {"image_primary": rng.integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)},
        "task": {"language_instruction": b"Pick Up The Cup"},
    }


def test_batch_transform_token_layout():
    bt = _transform()
    ex = bt(_frame())
    ids, labels = ex["input_ids"], ex["labels"]
    assert ids[-1] == EOS_TOKEN_ID
    # 7 action tokens immediately before EOS, drawn from the vocab tail
    action_ids = ids[-8:-1]
    assert (action_ids > StubTokenizer.vocab_size - 257).all()
    # '▁' empty token precedes the action tokens (training/inference parity)
    assert ids[-9] == LLAMA_EMPTY_TOKEN
    # loss mask: only action tokens + EOS are supervised
    assert (labels[:-8] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(labels[-8:], ids[-8:])
    assert ex["frames"].shape == (32, 32, 3)
    assert ex["dataset_name"] == "bridge_orig"


def test_collator_pads_to_fixed_bucket():
    bt = _transform()
    coll = PaddedCollatorForActionPrediction(max_length=48, pad_token_id=512)
    batch = coll([bt(_frame()) for _ in range(4)])
    assert batch["input_ids"].shape == (4, 48)
    assert batch["attention_mask"].shape == (4, 48)
    assert batch["frames"].shape == (4, 32, 32, 3)
    n_real = batch["attention_mask"][0].sum()
    assert (batch["input_ids"][0, n_real:] == 512).all()
    assert (batch["labels"][0, n_real:] == IGNORE_INDEX).all()


@pytest.mark.slow
def test_dummy_dataset_end_to_end_training_improves():
    """The reference has NO end-to-end train test at all (SURVEY.md §4); this
    is the tiny-config smoke: DummyDataset -> collator -> jitted SPMD step."""
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.training.trainer import OptimConfig, init_train_state, make_optimizer, make_vla_train_step

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = PrismaticVLM(cfg, dtype=jnp.float32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    bt = _transform()
    coll = PaddedCollatorForActionPrediction(max_length=48, pad_token_id=TINY_LLM.pad_token_id)
    ds = DummyDataset(bt, n=8, image_hw=(32, 32))
    batch = coll(list(ds))

    optimizer = make_optimizer(OptimConfig(learning_rate=3e-3), params)
    step = jax.jit(make_vla_train_step(model, optimizer, compute_dtype=jnp.float32,
                                       image_transform=model.image_transform))
    state = init_train_state(params, optimizer)

    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "dataset_names"}
    state, m0 = step(state, jb)
    for _ in range(10):
        state, m = step(state, jb)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    assert float(m["action_accuracy"]) >= float(m0["action_accuracy"]) - 0.05


def test_episodic_dataset_yields_whole_trajectories():
    import tensorflow as tf

    from bridgelang_tpu.vla.datasets.datasets import EpisodicRLDSDataset

    def traj(seed):
        rng = np.random.default_rng(seed)
        t = 6
        jpeg = tf.io.encode_jpeg(tf.cast(rng.integers(0, 255, (32, 32, 3)), tf.uint8)).numpy()
        return {
            "observation": {"image": np.array([jpeg] * t),
                            "state": rng.normal(size=(t, 8)).astype(np.float32)},
            "action": rng.uniform(-0.4, 0.4, size=(t, 7)).astype(np.float32),
            "language_instruction": np.array([b"sort the blocks"] * t),
        }

    trajs = [traj(i) for i in range(2)]
    spec = tf.nest.map_structure(lambda x: tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)), trajs[0])
    builder = lambda split: tf.data.Dataset.from_generator(lambda: iter(trajs), output_signature=spec)  # noqa: E731

    # libero-style config uses image/wrist keys; monkeypatch a simple config via kwargs
    import bridgelang_tpu.vla.datasets.rlds.oxe.materialize as mat

    kwargs = mat.make_oxe_dataset_kwargs("libero_spatial_no_noops", "unused")
    kwargs["builder"] = builder
    # episodic wrapper takes dataset_name + builder
    ds = EpisodicRLDSDataset.__new__(EpisodicRLDSDataset)
    from bridgelang_tpu.vla.datasets.rlds.dataset import apply_trajectory_transforms, make_dataset_from_rlds

    raw, stats = make_dataset_from_rlds(train=True, **{k: v for k, v in kwargs.items() if k != "data_dir"})
    ds.dataset = apply_trajectory_transforms(raw, train=True, window_size=1)
    ds.batch_transform = _transform()
    episodes = list(ds)
    assert len(episodes) == 2
    # bridge-style relabel in the libero transform keeps all 6 steps (no drop)
    assert len(episodes[0]) == 6
    assert episodes[0][0]["input_ids"][-1] == EOS_TOKEN_ID


# --- OXE registry parity ---------------------------------------------------


def test_oxe_named_mixtures_cover_reference():
    """All 18 reference mixtures (reference oxe/mixtures.py:11-210) must be
    registered; every mixture dataset must have a config + transform."""
    from bridgelang_tpu.vla.datasets.rlds.oxe.configs import OXE_DATASET_CONFIGS
    from bridgelang_tpu.vla.datasets.rlds.oxe.mixtures import OXE_NAMED_MIXTURES
    from bridgelang_tpu.vla.datasets.rlds.oxe.transforms import OXE_STANDARDIZATION_TRANSFORMS

    reference_mixtures = {
        "bridge", "rtx", "rtx_franka", "oxe_magic_soup", "oxe_magic_soup_plus",
        "oxe_magic_soup_plus_minus", "bridge_rt_1",
        "tdroid_carrot_in_bowl", "tdroid_pour_corn_in_pot", "tdroid_flip_pot_upright",
        "tdroid_move_object_onto_plate", "tdroid_knock_object_over",
        "tdroid_cover_object_with_towel", "droid_wipe",
        "libero_spatial_no_noops", "libero_object_no_noops", "libero_goal_no_noops",
        "libero_10_no_noops",
    }
    assert reference_mixtures <= set(OXE_NAMED_MIXTURES)
    for mix, spec in OXE_NAMED_MIXTURES.items():
        for name, weight in spec:
            assert name in OXE_DATASET_CONFIGS, (mix, name)
            assert name in OXE_STANDARDIZATION_TRANSFORMS, (mix, name)
            assert weight > 0


def test_rtx_franka_duplicates_first_wins():
    """rtx_franka repeats shared RT-X entries on purpose; materialize keeps
    the FIRST occurrence's weight (reference materialize.py:102-109)."""
    from bridgelang_tpu.vla.datasets.rlds.oxe.materialize import (
        get_oxe_dataset_kwargs_and_weights,
        resolve_mixture,
    )

    spec = resolve_mixture("rtx_franka")
    kwargs_list, weights = get_oxe_dataset_kwargs_and_weights("/data", spec)
    names = [k["name"] for k in kwargs_list]
    assert len(names) == len(set(names))
    assert weights[names.index("taco_play")] == 2.0  # first occurrence's weight


def test_make_oxe_kwargs_emits_state_obs_keys():
    from bridgelang_tpu.vla.datasets.rlds.oxe.materialize import make_oxe_dataset_kwargs

    kw = make_oxe_dataset_kwargs("bridge_orig", "/data", load_proprio=True)
    assert kw["state_obs_keys"] == ["EEF_state", None, "gripper_state"]
    assert "proprio_obs_key" not in kw
    kw2 = make_oxe_dataset_kwargs("bridge_orig", "/data", load_proprio=False)
    assert "state_obs_keys" not in kw2


def test_label_window_predict_stop_token_false():
    """predict_stop_token=False must supervise ALL action tokens and mask EOS
    (reference datasets.py:62-65) — not shift the window onto EOS."""
    tok = StubTokenizer()
    xf = RLDSBatchTransform(ActionTokenizer(tok), tok, predict_stop_token=False)
    out = xf(_frame())
    labels, ids = out["labels"], out["input_ids"]
    assert labels[-1] == IGNORE_INDEX                       # EOS masked
    np.testing.assert_array_equal(labels[-8:-1], ids[-8:-1])  # all 7 action tokens supervised
    assert (labels[:-8] == IGNORE_INDEX).all()

    xf2 = RLDSBatchTransform(ActionTokenizer(tok), tok, predict_stop_token=True)
    out2 = xf2(_frame())
    np.testing.assert_array_equal(out2["labels"][-8:], out2["input_ids"][-8:])  # + EOS


def test_collator_drops_overlong_instead_of_truncating():
    tok = StubTokenizer()
    xf = RLDSBatchTransform(ActionTokenizer(tok), tok)
    short = xf(_frame())
    long_ids = np.arange(100, dtype=np.int32)
    overlong = {"frames": short["frames"], "input_ids": long_ids,
                "labels": long_ids.copy(), "dataset_name": "x"}
    coll = PaddedCollatorForActionPrediction(max_length=64, pad_token_id=0)
    batch = coll([short, overlong])
    assert batch["input_ids"].shape == (2, 64)  # static shape preserved
    # the overlong slot was refilled from the kept example, never truncated
    np.testing.assert_array_equal(batch["input_ids"][0], batch["input_ids"][1])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        coll([overlong])


def test_batch_transform_action_chunk():
    """action_chunk=3 tokenizes the current + 2 future actions as one flat
    21-token span (OFT-style chunking; needs future_action_window_size=2 in
    the RLDS pipeline, wired by get_vla_dataset_and_collator)."""
    tok = StubTokenizer()
    bt = RLDSBatchTransform(ActionTokenizer(tok), tok, action_chunk=3)
    rng = np.random.default_rng(1)
    frame = {
        "dataset_name": b"bridge_orig",
        "action": rng.uniform(-1, 1, size=(3, 7)).astype(np.float32),  # window+future
        "observation": {"image_primary": rng.integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)},
        "task": {"language_instruction": b"Pick Up The Cup"},
    }
    ex = bt(frame)
    ids, labels = ex["input_ids"], ex["labels"]
    assert ids[-1] == EOS_TOKEN_ID
    action_ids = ids[-22:-1]  # 3 * 7 flat
    assert (action_ids > StubTokenizer.vocab_size - 257).all()
    assert ids[-23] == LLAMA_EMPTY_TOKEN
    # row-major flattening: first 7 ids are the CURRENT action's
    expect_first = ActionTokenizer(tok).encode_to_ids(frame["action"][0])
    np.testing.assert_array_equal(action_ids[:7], expect_first)
    assert (labels[:-22] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(labels[-22:], ids[-22:])


def test_predict_action_chunk_shape_and_stats_tiling():
    """predict_action_chunk: one parallel forward -> [horizon, action_dim]
    unnormalized with per-dim stats tiled across the horizon."""
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from tests.helpers import TINY_NORM_STATS

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32,
                        prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    img = np.random.default_rng(2).integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    chunk = model.predict_action_chunk(params, img, "push", horizon=3, unnorm_key="bridge_orig")
    assert chunk.shape == (3, 7)
    assert np.isfinite(chunk).all()
    stats = TINY_NORM_STATS["bridge_orig"]["action"]
    lo, hi = np.asarray(stats["q01"]), np.asarray(stats["q99"])
    mask = np.asarray(stats["mask"])
    for h in range(3):
        row = chunk[h]
        assert (row[mask] >= lo[mask] - 1e-6).all() and (row[mask] <= hi[mask] + 1e-6).all()


def test_rest_chunked_action_request():
    """POST /act with horizon=H returns an [H, action_dim] chunk through the
    parallel program (server 'horizon' wire field + client_act passthrough)."""
    from bridgelang_tpu.models.vla import OpenVLA
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.serving.server import VLAServer, client_act
    from tests.helpers import TINY_NORM_STATS

    orig = vlm_mod.build_vision_backbone
    vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
        ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
    try:
        cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32,
                        prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        params = model.init_params(jax.random.key(0))
    finally:
        vlm_mod.build_vision_backbone = orig

    srv = VLAServer(model, params, default_unnorm_key="bridge_orig")
    httpd = srv.serve_background(port=0)
    try:
        img = np.random.default_rng(4).integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        # Without the parallel-objective fine-tune the server must REFUSE
        # horizon requests (generate_parallel would emit untrained positions).
        try:
            client_act("127.0.0.1", httpd.server_address[1], img, "push", horizon=3)
            raise AssertionError("horizon on a non-parallel model must be refused")
        except RuntimeError as e:
            assert "parallel-objective" in str(e)
        # Marked parallel-objective (what deploy.py --parallel_decode sets),
        # the chunk flows through the wire: [H, action_dim].
        model.parallel_decode = True
        chunk = client_act("127.0.0.1", httpd.server_address[1], img, "push", horizon=3)
        assert chunk.shape == (3, 7)
        assert np.isfinite(chunk).all()
    finally:
        httpd.shutdown()
