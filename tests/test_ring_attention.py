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
