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


# --- tensor-parallel int4 (round 4): per-shard packing --------------------------
#
# pack_int4(n_shards=D) applies the out-pairing WITHIN each of D contiguous
# column blocks, so a 1/D column shard of the packed tensor is itself a
# standard v2 matrix over its own output columns — the property that makes
# column-parallel int4 possible at all (round 3 recorded the rejection for
# the global pairing). Row-parallel (wo/w_down) weights keep global pairing
# and shard the contraction dim with shard-local partials + psum.


def test_shard_blocked_pack_roundtrip_and_dequant():
    from bridgelang_tpu.ops.quant import dequant_int4, pack_int4, unpack_int4

    rng = np.random.default_rng(5)
    codes = rng.integers(-8, 8, size=(256, 64)).astype(np.int8)
    for d in (2, 4):
        packed = pack_int4(jnp.asarray(codes), n_shards=d)
        np.testing.assert_array_equal(np.asarray(unpack_int4(packed, n_shards=d)), codes)
        # each contiguous packed block is a standard v2 pack of its columns
        w2 = packed.shape[-1] // d
        ns = codes.shape[-1] // d
        for s in range(d):
            block = np.asarray(packed[:, s * w2:(s + 1) * w2])
            ref = np.asarray(pack_int4(jnp.asarray(codes[:, s * ns:(s + 1) * ns])))
            np.testing.assert_array_equal(block, ref)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    q1, s1 = _quantize4_2d(jnp.asarray(w), group=128)
    from bridgelang_tpu.ops.quant import _quantize4_2d as q2d
    # same scales regardless of shard blocking; dequant round-trips identically
    deq1 = np.asarray(dequant_int4(q1, s1, jnp.float32))
    for d in (2, 4):
        codes_d = np.asarray(unpack_int4(q1))  # recover codes, repack blocked
        qd = pack_int4(jnp.asarray(codes_d), n_shards=d)
        deqd = np.asarray(dequant_int4(qd, s1, jnp.float32, n_shards=d))
        np.testing.assert_array_equal(deqd, deq1)


def test_shard_blocked_matmul_offmesh_matches_dequant():
    """n_shards>1 without a mesh: the blocked execution (one kernel call per
    block) must match the dequant reference exactly like the global layout."""
    from bridgelang_tpu.ops.quant import dequant_int4, pack_int4, unpack_int4

    rng = np.random.default_rng(6)
    K2, N2 = 512, 1024
    w = rng.normal(size=(K2, N2)).astype(np.float32)
    q_global, s = _quantize4_2d(jnp.asarray(w), group=128)
    codes = np.asarray(unpack_int4(q_global))
    q_blocked = pack_int4(jnp.asarray(codes), n_shards=4)
    ref_w = np.asarray(dequant_int4(q_global, s, jnp.float32))
    x = jnp.asarray(rng.normal(size=(2, 3, K2)), dtype=jnp.bfloat16)
    out = np.asarray(matmul_int4(x, q_blocked, s, 4, False), np.float32)
    ref = np.asarray(x, np.float32).reshape(6, K2) @ ref_w
    np.testing.assert_allclose(out.reshape(6, N2), ref, rtol=3e-2, atol=3e-2 * np.abs(ref).max())


def test_column_parallel_shard_blocked_int4():
    """tensor=4 mesh: packed+scales sharded on their last dim; each device's
    block is plain v2, the result is column-sharded, and the values match the
    off-mesh blocked execution exactly."""
    from bridgelang_tpu.ops.quant import pack_int4, unpack_int4
    from bridgelang_tpu.ops.int4_matmul import matmul_int4_a8

    rng = np.random.default_rng(7)
    K2, N2, D = 512, 1024, 4
    w = rng.normal(size=(K2, N2)).astype(np.float32)
    q_global, s = _quantize4_2d(jnp.asarray(w), group=128)
    q_blocked = pack_int4(jnp.asarray(np.asarray(unpack_int4(q_global))), n_shards=D)
    x = jnp.asarray(rng.normal(size=(2, 4, K2)), dtype=jnp.float32)

    for fn in (matmul_int4, matmul_int4_a8):
        ref = np.asarray(fn(x, q_blocked, s, D, False), np.float32)
        mesh = make_mesh(f"replica=2,fsdp=1,tensor={D}")
        xs = jax.device_put(x, NamedSharding(mesh, P("replica", None, None)))
        qs = jax.device_put(q_blocked, NamedSharding(mesh, P(None, "tensor")))
        ss = jax.device_put(s, NamedSharding(mesh, P(None, "tensor")))
        out = jax.jit(lambda a, b, c, _fn=fn: _fn(a, b, c, D, False))(xs, qs, ss)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-5, atol=1e-5)
        assert out.sharding.spec[-1] == "tensor", out.sharding.spec
        assert out.sharding.spec[0] == "replica"


def test_row_parallel_int4_psum():
    """wo/w_down-style: x's last dim and packed's rows shard together on the
    tensor axis (scale groups contained per shard), shard-local partials meet
    in one psum — result matches the single-device product and replicates on
    the tensor axis."""
    from bridgelang_tpu.ops.int4_matmul import matmul_int4_a8

    rng = np.random.default_rng(8)
    K2, N2, D = 512, 256, 4  # K2/D = 128 = one scale group per shard
    w = rng.normal(size=(K2, N2)).astype(np.float32)
    q4, s4 = _quantize4_2d(jnp.asarray(w), group=128)
    x = jnp.asarray(rng.normal(size=(2, 4, K2)), dtype=jnp.float32)

    for fn in (matmul_int4, matmul_int4_a8):
        ref = np.asarray(fn(x, q4, s4), np.float32)
        mesh = make_mesh(f"replica=2,fsdp=1,tensor={D}")
        xs = jax.device_put(x, NamedSharding(mesh, P("replica", None, "tensor")))
        qs = jax.device_put(q4, NamedSharding(mesh, P("tensor", None)))
        ss = jax.device_put(s4, NamedSharding(mesh, P("tensor", None)))
        out = jax.jit(lambda a, b, c, _fn=fn: _fn(a, b, c, D, True))(xs, qs, ss)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=2e-5, atol=2e-5)
        assert out.sharding.spec[-1] is None or out.sharding.spec[-1] != "tensor"


def test_int4_row_shardable_alignment():
    from bridgelang_tpu.ops.int4_matmul import int4_row_shardable

    # 7B wo: K=4096, 32 groups -> shardable at 2/4/8
    assert int4_row_shardable(4096, 32, 8)
    # 13B w_down: K=13824, 108 groups -> 4 divides (27/shard), 8 does not
    assert int4_row_shardable(13824, 108, 4)
    assert not int4_row_shardable(13824, 108, 8)
    # group boundary must align with the shard split
    assert not int4_row_shardable(13824, 108, 5)


def test_row_parallel_unshardable_geometry_degrades():
    """row_parallel=True with a geometry whose scale groups don't split over
    the declared shard count (e.g. tensor=8 but only 4 groups) must fall back
    to the replicated-weight program instead of building an invalid Shardy
    rule — serving_param_shardings replicates such leaves, so the kernel's
    dispatch has to match (caught by the driver dryrun at tiny dims)."""
    x, q4, s4 = _mk(9)
    ref = np.asarray(matmul_int4(x, q4, s4), np.float32)
    # K=512, 4 groups of 128: 8 shards -> 64 rows/shard, 64 % 128 != 0
    out = jax.jit(lambda a, b, c: matmul_int4(a, b, c, 8, True))(x, q4, s4)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=2e-5, atol=2e-5)


def test_int4_tp_fallback_audit_flags_flagship_geometries():
    """deploy.py's TP audit (int4_tp_fallback_matmuls) must flag exactly the
    shard-local matmuls that lose the fused kernel: a column-parallel shard
    needs local_n % 256 == 0, so 7B's MLP (11008 = 256*43, 43 odd) breaks at
    ANY tensor >= 2 while 13B's (13824 = 256*54) survives tensor=2 only —
    without the audit those deploys silently serve the XLA dequant fallback,
    measured 10x slower (ops/int4_matmul.py module docstring)."""
    from bridgelang_tpu.models.llm.llama import LLMConfig
    from bridgelang_tpu.ops.int4_matmul import int4_tp_fallback_matmuls

    cfg7 = LLMConfig(dim=4096, n_heads=32, n_kv_heads=32, intermediate_size=11008)
    cfg13 = LLMConfig(dim=5120, n_heads=40, n_kv_heads=40, intermediate_size=13824)
    assert sorted(int4_tp_fallback_matmuls(cfg7, 128, 2)) == ["w_gate", "w_up"]
    assert int4_tp_fallback_matmuls(cfg13, 128, 2) == []          # fully fused
    assert sorted(int4_tp_fallback_matmuls(cfg13, 128, 4)) == ["w_gate", "w_up"]
    # group=256 packs don't change column alignment, only row groups
    assert int4_tp_fallback_matmuls(cfg13, 256, 2) == []


def test_shard_blocked_dequant_roundtrip_needs_matching_shards():
    """pack_layout_tag exists because the bytes don't self-describe: a
    shard-blocked pack dequantized with the default n_shards=1 returns
    PERMUTED columns with no error — the llm-level helpers must thread the
    shard count for column-parallel leaves (and only those)."""
    from bridgelang_tpu.ops.quant import (
        _quantize4_2d, dequant_int4, dequantize_llm_int4, pack_layout_tag,
        INT4_PACK_LAYOUT,
    )

    assert pack_layout_tag(1) == INT4_PACK_LAYOUT
    assert pack_layout_tag(2) != pack_layout_tag(4) != INT4_PACK_LAYOUT

    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 512)).astype(np.float32)
    q_g, s_g = _quantize4_2d(jnp.asarray(w), group=128)            # global pairing
    q_b, s_b = _quantize4_2d(jnp.asarray(w), group=128, n_shards=2)  # shard-blocked
    want = np.asarray(dequant_int4(q_g, s_g, jnp.float32))
    good = np.asarray(dequant_int4(q_b, s_b, jnp.float32, n_shards=2))
    np.testing.assert_array_equal(good, want)
    bad = np.asarray(dequant_int4(q_b, s_b, jnp.float32))  # wrong shards: permuted
    assert np.abs(bad - want).max() > 0.1

    llm = {"layers": {"wq": q_b[None], "wq_scale4": s_b[None],
                      "w_down": q_g[None], "w_down_scale4": s_g[None]},
           "embed": jnp.zeros((4, 8), jnp.float32),
           "lm_head": jnp.zeros((8, 4), jnp.float32),
           "final_norm": jnp.ones((8,), jnp.float32)}
    deq = dequantize_llm_int4(llm, jnp.float32, int4_shards=2)
    np.testing.assert_array_equal(np.asarray(deq["layers"]["wq"][0]), want)
    # w_down is ROW-parallel: its pack stays globally paired at any shard count
    np.testing.assert_array_equal(np.asarray(deq["layers"]["w_down"][0]), want)


def test_merge_lora_into_shard_blocked_base():
    """Merging adapters into a tensor-parallel int4 artifact must dequantize
    AND requantize with the base's pack shard count — the merged pack has to
    stay deployable under the same mesh (same layout tag)."""
    from bridgelang_tpu.ops.quant import _quantize4_2d, dequant_int4
    from bridgelang_tpu.training.lora import merge_lora

    rng = np.random.default_rng(5)
    w = rng.normal(size=(256, 512)).astype(np.float32)
    a = rng.normal(size=(1, 256, 4)).astype(np.float32) * 0.05
    b = rng.normal(size=(1, 4, 512)).astype(np.float32) * 0.05
    q_b, s_b = _quantize4_2d(jnp.asarray(w), group=128, n_shards=2)
    llm = {"layers": {"wq": q_b[None], "wq_scale4": s_b[None],
                      "wq_lora_a": jnp.asarray(a), "wq_lora_b": jnp.asarray(b)}}
    merged = merge_lora(llm, int4_shards=2)
    got = np.asarray(dequant_int4(merged["layers"]["wq"][0],
                                  merged["layers"]["wq_scale4"][0],
                                  jnp.float32, n_shards=2))
    base = np.asarray(dequant_int4(q_b, s_b, jnp.float32, n_shards=2))
    want = base + a[0] @ b[0]
    # requantization noise only: well under one int4 step of the merged rows
    assert np.abs(got - want).max() < np.abs(want).max() * 0.02
