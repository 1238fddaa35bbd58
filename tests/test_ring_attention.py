"""Ring attention (context parallelism) vs single-device reference, on the
8-virtual-device mesh — a beyond-reference capability (SURVEY.md §2.10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bridgelang_tpu.ops.flash_attention import attention_reference
from bridgelang_tpu.ops.ring_attention import ring_attention_sharded


def _mask(t, causal=True):
    m = jnp.ones((t, t), bool) if not causal else (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])
    return jnp.broadcast_to(m[None, None], (1, 1, t, t))


@pytest.fixture(scope="module")
def sp_mesh():
    devices = np.array(jax.devices()).reshape(8)
    with Mesh(devices, ("sp",)) as mesh:
        yield mesh


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(sp_mesh, causal):
    b, t, h, d = 1, 128, 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    out = ring_attention_sharded(q, k, v, sp_mesh, causal=causal)
    ref = attention_reference(q, k, v, _mask(t, causal))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_gqa(sp_mesh):
    b, t, h, hkv, d = 2, 64, 8, 2, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    out = ring_attention_sharded(q, k, v, sp_mesh, causal=True)
    ref = attention_reference(q, k, v, _mask(t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_is_actually_sharded(sp_mesh):
    b, t, h, d = 1, 64, 2, 16
    q = jnp.ones((b, t, h, d), jnp.float32)
    out = ring_attention_sharded(q, q, q, sp_mesh)
    assert out.sharding.spec == P(None, "sp", None, None) or len(out.sharding.device_set) == 8


@pytest.mark.slow
def test_ring_attention_trainer_integration():
    """Ring attention is reachable from the config surface, not just the op:
    VLMConfig(attention_impl="ring") routes decoder attention through the
    context-parallel shard_map path (models/llm/llama.full_attention) inside
    the FULL jitted VLA train step on a replica=2,fsdp=4 mesh, and the loss /
    gradients / updated params must match the dense-attention baseline."""
    import dataclasses

    import bridgelang_tpu.models.vlm as vlm_mod
    from bridgelang_tpu.models.vision.vit import ViT
    from bridgelang_tpu.models.vlm import IGNORE_INDEX, PrismaticVLM, VLMConfig
    from bridgelang_tpu.parallel.mesh import make_mesh
    from bridgelang_tpu.parallel.sharding import batch_sharding, param_shardings
    from bridgelang_tpu.training.trainer import (
        OptimConfig, init_train_state, make_optimizer, make_vla_train_step)
    from tests.helpers import TINY_LLM, TINY_VIT

    def build(attention_impl):
        orig = vlm_mod.build_vision_backbone
        vlm_mod.build_vision_backbone = lambda bid, dtype=jnp.float32: (
            ViT(TINY_VIT, dtype=dtype), TINY_VIT.width, TINY_VIT.num_patches)
        try:
            cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM, attention_impl=attention_impl)
            model = PrismaticVLM(cfg, dtype=jnp.float32)
            params = model.init_params(jax.random.key(0))
        finally:
            vlm_mod.build_vision_backbone = orig
        assert model.attention_impl == (attention_impl or "xla")
        return model, params

    # fused length = 16 prompt tokens + 16 patches = 32, divides fsdp=4.
    rng = np.random.default_rng(0)
    b, t = 8, 16
    ids = np.full((b, t), TINY_LLM.pad_token_id, np.int32)
    m = np.zeros((b, t), np.int32)
    labels = np.full((b, t), IGNORE_INDEX, np.int32)
    for i in range(b):
        L = 10 + (i % 3)  # right padding varies per example
        ids[i, 0] = 1
        ids[i, 1:L] = rng.integers(3, 400, L - 1)
        ids[i, L - 4:L] = rng.integers(TINY_LLM.vocab_size - 256, TINY_LLM.vocab_size, 4)
        m[i, :L] = 1
        labels[i, L - 4:L] = ids[i, L - 4:L]
    batch = {
        "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(m),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32),
    }

    mesh = make_mesh("replica=2,fsdp=4,tensor=1")

    def one_step(attention_impl):
        model, params = build(attention_impl)
        optimizer = make_optimizer(OptimConfig(learning_rate=1e-3), params)
        step_fn = make_vla_train_step(model, optimizer, compute_dtype=jnp.float32)
        state = init_train_state(jax.device_put(params, param_shardings(mesh, params)), optimizer)
        db = jax.device_put(batch, batch_sharding(mesh))
        with jax.sharding.set_mesh(mesh):
            state, metrics = jax.jit(step_fn)(state, db)
        return state, metrics

    s_ring, m_ring = one_step("ring")
    s_ref, m_ref = one_step(None)
    np.testing.assert_allclose(float(m_ring["loss"]), float(m_ref["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_ring["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_ring.params["llm"]["layers"]["wq"]),
        np.asarray(s_ref.params["llm"]["layers"]["wq"]), atol=1e-6)


def test_ring_impl_falls_back_without_mesh():
    """Off-mesh (no ambient mesh) the "ring" impl must behave exactly like
    dense attention — single-device tests and generation keep working."""
    from bridgelang_tpu.models.llm.llama import full_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 16, 4, 8)), jnp.float32)
    causal = np.tril(np.ones((16, 16), bool))[None, None]
    out = full_attention(q, q, q, jnp.asarray(causal), impl="ring")
    ref = full_attention(q, q, q, jnp.asarray(causal), impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
