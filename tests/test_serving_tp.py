"""Multi-chip tensor-parallel serving.

parallel/sharding.py::SERVING_RULES shard the decoder megatron-style over the
`tensor` mesh axis (column-parallel wq/wk/wv/w_gate/w_up, row-parallel
wo/w_down, vocab-split lm_head) and batched requests over `replica`;
OpenVLA.use_mesh routes host inputs. These tests run the FULL jitted
predict_action path (preprocess -> dual-ViT -> prefill -> scan decode ->
unnormalize) on the 8-virtual-device mesh and require the sharded program to
reproduce the single-device actions. The reference's inference stack is
single-GPU, batch-1 only (reference: modeling_prismatic.py:460-463).
"""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bridgelang_tpu.models.vla import OpenVLA
from bridgelang_tpu.models.vlm import VLMConfig
from bridgelang_tpu.parallel.mesh import make_mesh
from bridgelang_tpu.parallel.sharding import shard_params_for_serving
from tests.helpers import TINY_LLM, TINY_NORM_STATS, TINY_VIT, TINY_VIT_B, StubTokenizer, random_image


def _tiny_model():
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig

    cfg = dataclasses.replace(VLMConfig(), llm=TINY_LLM, vision_override=(TINY_VIT, TINY_VIT_B))
    model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
    model.image_transform = ImageTransformConfig(
        "resize-naive", (ImageTowerSpec(size=32), ImageTowerSpec(size=32))
    )
    return model


def _images(n):
    return [random_image(32, 32, seed=i) for i in range(n)]


def _instructions(n):
    return [f"pick up object {i}" for i in range(n)]


def test_tp_serving_matches_single_device():
    model = _tiny_model()
    params = model.init_params(jax.random.key(0))
    ref = model.predict_action_batch(params, _images(4), _instructions(4))

    mesh = make_mesh("replica=2,fsdp=1,tensor=4")
    sharded = shard_params_for_serving(mesh, params)
    model_tp = _tiny_model()
    model_tp.use_mesh(mesh)
    out = model_tp.predict_action_batch(sharded, _images(4), _instructions(4))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_tp_serving_int8_matches_single_device():
    """The production serving mode: int8 weight-only decoder, TP-sharded
    (int8 codes and their sibling *_scale leaves shard together)."""
    from bridgelang_tpu.ops.quant import quantize_llm_int8

    model = _tiny_model()
    params = model.init_params(jax.random.key(0))
    params = dict(params, llm=quantize_llm_int8(params["llm"]))
    ref = model.predict_action_batch(params, _images(2), _instructions(2))

    mesh = make_mesh("replica=1,fsdp=1,tensor=8")
    sharded = shard_params_for_serving(mesh, params)
    model_tp = _tiny_model()
    model_tp.use_mesh(mesh)
    out = model_tp.predict_action_batch(sharded, _images(2), _instructions(2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_tp_serving_pallas_prefill_matches_single_device():
    """The real TPU-pod serving configuration: pallas flash prefill (keys
    longer than queries — the KV-cache case) under tensor-parallel sharding;
    exercises the kernel's custom_partitioning rules inside generate_greedy."""
    model = _tiny_model()
    params = model.init_params(jax.random.key(2))
    ref = model.predict_action_batch(params, _images(2), _instructions(2))

    mesh = make_mesh("replica=1,fsdp=1,tensor=2", devices=jax.devices()[:2])
    sharded = shard_params_for_serving(mesh, params)
    model_tp = _tiny_model()
    model_tp.attention_impl = "pallas"
    # Defeat the short-sequence einsum override — this test exists precisely
    # to run the pallas kernel's custom_partitioning rules inside generation
    # (at the tiny model's f_len=48, _prefill_impl would pick einsum and the
    # kernel would never execute).
    model_tp._prefill_impl = lambda b, t: "pallas"
    model_tp.use_mesh(mesh)
    out = model_tp.predict_action_batch(sharded, _images(2), _instructions(2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_tp_speculative_matches_single_device():
    model = _tiny_model()
    params = model.init_params(jax.random.key(1))
    img = random_image(32, 32, seed=3)
    a_ref, t_ref = model.predict_action_speculative(params, img, "push the lever", np.zeros(7, np.int32))

    mesh = make_mesh("replica=1,fsdp=1,tensor=4", devices=jax.devices()[:4])
    sharded = shard_params_for_serving(mesh, params)
    model_tp = _tiny_model()
    model_tp.use_mesh(mesh)
    a_tp, t_tp = model_tp.predict_action_speculative(sharded, img, "push the lever", np.zeros(7, np.int32))
    np.testing.assert_array_equal(t_tp, t_ref)
    np.testing.assert_allclose(a_tp, a_ref, atol=1e-5, rtol=1e-5)


def test_serving_rules_cover_int8_scales():
    """Every int8 matrix leaf and its scale shard on the SAME output dim —
    a mismatched pair would desynchronize codes and scales across chips."""
    from bridgelang_tpu.parallel.sharding import SERVING_RULES, spec_for_path

    for name in ("wq", "wk", "wv", "w_gate", "w_up"):
        m = spec_for_path(f"llm/layers/{name}", 3, SERVING_RULES)
        s = spec_for_path(f"llm/layers/{name}_scale", 3, SERVING_RULES)
        assert m[-1] == "tensor" and s[-1] == "tensor", (name, m, s)
    for name in ("wo", "w_down"):
        m = spec_for_path(f"llm/layers/{name}", 3, SERVING_RULES)
        s = spec_for_path(f"llm/layers/{name}_scale", 3, SERVING_RULES)
        assert m[1] == "tensor" and m[-1] is None and all(x is None for x in s), (name, m, s)
    head = spec_for_path("llm/lm_head", 2, SERVING_RULES)
    head_s = spec_for_path("llm/lm_head_scale", 2, SERVING_RULES)
    assert head[-1] == "tensor" and head_s[-1] == "tensor"
    assert all(x is None for x in spec_for_path("llm/embed", 2, SERVING_RULES))


@pytest.mark.slow
def test_tp_serving_13b_geometry_matches_single_device():
    """13B is the multi-chip serving customer: int8 params load on one 16 GB
    chip but execution OOMs (README measured), so it serves with
    --mesh_spec tensor=N. Verify TP=2 output parity at the REAL 13B geometry
    — dim 5120, 40 MHA heads, intermediate 13824, padded vocab 32064
    (models/llm/llama.py "llama2-13b-pure") — depth-trimmed to 2 of 40 layers
    so the virtual-CPU mesh can hold it, in the production int8 serving mode."""
    from bridgelang_tpu.models.llm.llama import LLM_CONFIGS
    from bridgelang_tpu.ops.image_ops import ImageTowerSpec, ImageTransformConfig
    from bridgelang_tpu.ops.quant import quantize_llm_int8

    llm13 = dataclasses.replace(LLM_CONFIGS["llama2-13b-pure"], n_layers=2, max_seq_len=256)
    assert (llm13.dim, llm13.n_heads, llm13.intermediate_size) == (5120, 40, 13824)

    def build():
        cfg = dataclasses.replace(VLMConfig(), llm=llm13, vision_override=TINY_VIT)
        model = OpenVLA(cfg, TINY_NORM_STATS, tokenizer=StubTokenizer(), dtype=jnp.float32, prompt_bucket=32)
        model.image_transform = ImageTransformConfig("resize-naive", (ImageTowerSpec(size=32),))
        return model

    model = build()
    params = model.init_params(jax.random.key(4))
    params = dict(params, llm=quantize_llm_int8(params["llm"]))
    ref = model.predict_action_batch(params, _images(2), _instructions(2))

    mesh = make_mesh("replica=1,fsdp=1,tensor=2", devices=jax.devices()[:2])
    sharded = shard_params_for_serving(mesh, params)
    model_tp = build()
    model_tp.use_mesh(mesh)
    out = model_tp.predict_action_batch(sharded, _images(2), _instructions(2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_int4_serving_on_mesh_matches_single_device():
    """Packed-int4 (the 13B capacity mode) under a mesh: SERVING_RULES
    replicate the packed leaves + their *_scale4 siblings (the out-paired
    byte layout cannot be tensor-sharded — sharding.py rationale), and
    matmul_int4's custom_partitioning keeps replica-sharded batches
    shard-local. Output must match the single-device int4 model exactly."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4

    model = _tiny_model()
    params = model.init_params(jax.random.key(7))
    params = dict(params, llm=quantize_llm_int4(params["llm"], group=32))
    ref = model.predict_action_batch(params, _images(4), _instructions(4))

    mesh = make_mesh("replica=4,fsdp=1,tensor=2")
    sharded = shard_params_for_serving(mesh, params)
    # the int4 leaves must have been forced to replicate despite the tensor axis
    for name in ("wq", "wq_scale4", "w_down", "w_down_scale4"):
        spec = sharded["llm"]["layers"][name].sharding.spec
        assert all(s is None for s in spec), (name, spec)
    model_m = _tiny_model()
    model_m.use_mesh(mesh)
    out = model_m.predict_action_batch(sharded, _images(4), _instructions(4))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_int4_tensor_parallel_shard_blocked_matches_single_device():
    """Round-4 int4 TP: quantize-on-load with shard-blocked packing
    (pack_int4 n_shards = tensor size), SERVING_RULES shard the
    column-parallel packed leaves + *_scale4 siblings on the tensor axis and
    the row-shardable ones on their contraction dim; the matmul's
    custom_partitioning supplies shard-local kernels + psum. The TP actions
    must match the single-device GLOBAL-packing model exactly (same codes,
    same scales -> identical dequantized weights)."""
    from bridgelang_tpu.ops.quant import quantize_llm_int4

    D = 2
    model = _tiny_model()
    params = model.init_params(jax.random.key(7))
    ref_params = dict(params, llm=quantize_llm_int4(params["llm"], group=32))
    ref = model.predict_action_batch(ref_params, _images(4), _instructions(4))

    sharded_pack = dict(params, llm=quantize_llm_int4(params["llm"], group=32, n_shards=D))
    mesh = make_mesh(f"replica=4,fsdp=1,tensor={D}")
    sharded = shard_params_for_serving(mesh, sharded_pack, int4_shards=D)
    # column-parallel leaves shard on the packed output dim...
    for name in ("wq", "wq_scale4", "w_up", "w_up_scale4"):
        assert sharded["llm"]["layers"][name].sharding.spec[-1] == "tensor", name
    # ...row-parallel ones on the contraction dim (group=32 divides K/D here)
    for name in ("wo", "wo_scale4", "w_down", "w_down_scale4"):
        assert sharded["llm"]["layers"][name].sharding.spec[-2] == "tensor", name

    model_tp = _tiny_model()
    model_tp.cfg = dataclasses.replace(
        model_tp.cfg, llm=dataclasses.replace(model_tp.cfg.llm, int4_shards=D))
    model_tp.use_mesh(mesh)
    out = model_tp.predict_action_batch(sharded, _images(4), _instructions(4))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
