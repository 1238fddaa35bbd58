"""SPMD partitioning of the fused packed-int4 matmul.

Like flash attention (tests/test_flash_attention_spmd.py), the pallas_call
lowers to an XLA custom call the partitioner cannot shard on its own;
ops/int4_matmul.py registers custom_partitioning rules: x's leading
batch/time dims propagate, and the weight operands always replicate — the
out-paired byte layout couples output columns c and N/2+c inside one byte,
so no contiguous shard of the packed tensor maps to a contiguous result
shard (a sharded QLoRA base is all-gathered before the shard-local call,
standard FSDP semantics). The reference's 4-bit path is single-GPU
bitsandbytes with no sharding story at all (reference:
vla-scripts/finetune.py:142-148).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bridgelang_tpu.ops.int4_matmul import int4_kernel_eligible, matmul_int4
from bridgelang_tpu.ops.quant import _quantize4_2d
from bridgelang_tpu.parallel.mesh import make_mesh

K, N = 512, 256


def _mk(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(K, N)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
    assert int4_kernel_eligible(K, N, s4.shape[0])
    x = jnp.asarray(rng.normal(size=(8, 4, K)), dtype=jnp.float32)
    return x, q4, s4


def _run(mesh, x_spec, w_spec, s_spec):
    x, q4, s4 = _mk()
    ref = np.asarray(matmul_int4(x, q4, s4), np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, x_spec))
    qs = jax.device_put(q4, NamedSharding(mesh, w_spec))
    ss = jax.device_put(s4, NamedSharding(mesh, s_spec))
    out = jax.jit(matmul_int4)(xs, qs, ss)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-5, atol=1e-5)
    return out


def test_batch_sharded_x_stays_local():
    """Replica-axis batch serving: x sharded on its leading dim, weights
    replicated — the out keeps x's batch sharding (no all-gather of x)."""
    mesh = make_mesh("replica=8,fsdp=1,tensor=1")
    out = _run(mesh, P("replica", None, None), P(), P())
    assert out.sharding.spec[0] == "replica"


def test_out_sharded_weights_are_gathered():
    """Out-dim sharding of packed bytes cannot propagate (each byte holds
    output columns c AND N/2+c): the wrapper declares the weights replicated,
    GSPMD all-gathers them, and the result is exact and replicated."""
    mesh = make_mesh("replica=4,fsdp=1,tensor=2")
    _run(mesh, P(), P(None, "tensor"), P(None, "tensor"))  # exactness is the contract


def test_k_sharded_base_is_gathered():
    """An fsdp-sharded frozen QLoRA base ([K, N//2] sharded on input rows) is
    all-gathered before the shard-local kernel — numerically exact."""
    mesh = make_mesh("replica=2,fsdp=4,tensor=1")
    _run(mesh, P(("replica", "fsdp"), None, None), P("fsdp", None), P(None, None))


def test_grad_through_sharded_int4():
    """QLoRA-on-a-mesh: d/dx of the custom VJP under sharded operands matches
    the single-device gradient."""
    x, q4, s4 = _mk(1)
    co = jnp.ones((8, 4, N), jnp.float32)

    def loss(xx, qq, ss):
        return jnp.sum(matmul_int4(xx, qq, ss) * co)

    g_ref = np.asarray(jax.grad(loss)(x, q4, s4), np.float32)
    mesh = make_mesh("replica=2,fsdp=4,tensor=1")
    xs = jax.device_put(x, NamedSharding(mesh, P(("replica", "fsdp"), None, None)))
    qs = jax.device_put(q4, NamedSharding(mesh, P("fsdp", None)))
    ss = jax.device_put(s4, NamedSharding(mesh, P()))
    g = jax.jit(jax.grad(loss))(xs, qs, ss)
    np.testing.assert_allclose(np.asarray(g, np.float32), g_ref, rtol=1e-5, atol=1e-5)


def test_a8_batch_sharded_x_stays_local():
    """The w4a8 variant carries the same partitioning rules: a replica-
    sharded batch stays shard-local (the internal per-token quant is
    elementwise and GSPMD-native; the kernel wrapper propagates b/t)."""
    from bridgelang_tpu.ops.int4_matmul import matmul_int4_a8

    x, q4, s4 = _mk()
    ref = np.asarray(matmul_int4_a8(x, q4, s4), np.float32)
    mesh = make_mesh("replica=8,fsdp=1,tensor=1")
    xs = jax.device_put(x, NamedSharding(mesh, P("replica", None, None)))
    qs = jax.device_put(q4, NamedSharding(mesh, P()))
    ss = jax.device_put(s4, NamedSharding(mesh, P()))
    out = jax.jit(matmul_int4_a8)(xs, qs, ss)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-5, atol=1e-5)
    assert out.sharding.spec[0] == "replica"
