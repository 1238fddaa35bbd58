"""SPMD partitioning of the Pallas flash-attention kernel.

pallas_call lowers to an XLA custom call the partitioner cannot shard on its
own; ops/flash_attention.py registers custom_partitioning rules (batch + head
axes propagate, time/feature replicate, GQA groups must not split). These
tests run the kernel on an 8-virtual-CPU-device mesh with sharded operands and
check forward + gradients against the unfused reference — the coverage the
reference's CUDA flash-attn gets implicitly from torch FSDP wrapping
(reference: prismatic/training/strategies/fsdp.py:160-168).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bridgelang_tpu.ops.flash_attention import attention_reference, flash_attention
from bridgelang_tpu.parallel.mesh import make_mesh


def _mk_inputs(b=4, t=256, h=4, hkv=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    lengths = jnp.asarray(rng.integers(t // 2, t + 1, size=(b,)), jnp.int32)
    # [B, 1, T, S] causal+length mask for the reference
    q_idx = jnp.arange(t)[:, None]
    k_idx = jnp.arange(t)[None, :]
    mask = ((k_idx <= q_idx)[None, None] & (k_idx[None, None] < lengths[:, None, None, None]))
    return q, k, v, lengths, mask


def _shard(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@pytest.mark.parametrize("hkv", [4, 2])
def test_sharded_forward_matches_reference(hkv):
    """Batch over (replica, fsdp), heads over tensor — the trainer's layout."""
    mesh = make_mesh("replica=2,fsdp=2,tensor=2")
    q, k, v, lengths, mask = _mk_inputs(hkv=hkv)

    with mesh:
        qs = _shard(mesh, q, P(("replica", "fsdp"), None, "tensor", None))
        ks = _shard(mesh, k, P(("replica", "fsdp"), None, "tensor", None))
        vs = _shard(mesh, v, P(("replica", "fsdp"), None, "tensor", None))
        ls = _shard(mesh, lengths, P(("replica", "fsdp")))
        out = jax.jit(lambda *a: flash_attention(*a, causal=True))(qs, ks, vs, None, ls)
    ref = attention_reference(q, k, v, mask)
    valid = (jnp.arange(q.shape[1])[None, :, None, None] < lengths[:, None, None, None])
    np.testing.assert_allclose(
        np.asarray(out * valid), np.asarray(ref * valid), atol=2e-5, rtol=1e-4
    )


def test_sharded_grads_match_unsharded():
    mesh = make_mesh("replica=2,fsdp=2,tensor=2")
    q, k, v, lengths, _ = _mk_inputs()
    valid = (jnp.arange(q.shape[1])[None, :, None, None] < lengths[:, None, None, None])

    def loss(q, k, v, lengths):
        out = flash_attention(q, k, v, None, lengths, causal=True)
        return jnp.sum((out * valid) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, lengths)
    with mesh:
        spec = P(("replica", "fsdp"), None, "tensor", None)
        qs, ks, vs = (_shard(mesh, x, spec) for x in (q, k, v))
        ls = _shard(mesh, lengths, P(("replica", "fsdp")))
        g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs, ls)
    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_head_axis_that_splits_gqa_groups_falls_back():
    """tensor axis (2) does not divide hkv=1 -> partition() must replicate
    heads rather than split a KV group; results stay correct."""
    mesh = make_mesh("replica=2,fsdp=2,tensor=2")
    q, k, v, lengths, mask = _mk_inputs(h=4, hkv=1)
    with mesh:
        qs = _shard(mesh, q, P(("replica", "fsdp"), None, "tensor", None))
        out = jax.jit(lambda *a: flash_attention(*a, causal=True))(qs, k, v, None, lengths)
    ref = attention_reference(q, k, v, mask)
    valid = (jnp.arange(q.shape[1])[None, :, None, None] < lengths[:, None, None, None])
    np.testing.assert_allclose(
        np.asarray(out * valid), np.asarray(ref * valid), atol=2e-5, rtol=1e-4
    )


def test_sharded_vlm_forward_with_pallas_impl(eight_device_mesh):
    """End-to-end: a tiny VLM forward on the mesh with the pallas attention
    path forced (the TPU-pod configuration), batch sharded over data axes."""
    import dataclasses

    from bridgelang_tpu.models.llm.llama import LLMConfig
    from bridgelang_tpu.models.vision.vit import ViTConfig
    from bridgelang_tpu.models.vlm import PrismaticVLM, VLMConfig
    from bridgelang_tpu.parallel.sharding import batch_sharding, param_shardings

    mesh = eight_device_mesh
    tiny_vit = ViTConfig(image_size=16, patch_size=8, width=32, depth=3, num_heads=4, mlp_dim=64)
    tiny_llm = LLMConfig(vocab_size=128, padded_vocab_size=192, dim=64, n_layers=2, n_heads=4,
                         n_kv_heads=4, intermediate_size=96, max_seq_len=128, pad_token_id=128)
    cfg = dataclasses.replace(VLMConfig(), llm=tiny_llm, vision_override=tiny_vit)
    model = PrismaticVLM(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))

    rng = np.random.default_rng(0)
    b, t = 8, 16
    ids = np.full((b, t), tiny_llm.pad_token_id, np.int32)
    m = np.zeros((b, t), np.int32)
    ids[:, 0] = 1
    ids[:, 1:10] = rng.integers(3, 120, size=(b, 9))
    m[:, :10] = 1
    labels = np.where(m == 1, ids, -100)
    px = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)

    def fwd(params, ids, m, px, labels):
        logits, fl = model.forward_train(params, ids, m, px, labels, remat=False)
        return logits, fl

    logits_ref, _ = fwd(params, jnp.asarray(ids), jnp.asarray(m), jnp.asarray(px), jnp.asarray(labels))

    model.attention_impl = "pallas"
    sharded_params = jax.device_put(params, param_shardings(mesh, params))
    batch = jax.device_put(
        (jnp.asarray(ids), jnp.asarray(m), jnp.asarray(px), jnp.asarray(labels)),
        batch_sharding(mesh),
    )
    with mesh:
        logits_sh, _ = jax.jit(fwd)(sharded_params, *batch)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref), atol=2e-4, rtol=1e-3)
