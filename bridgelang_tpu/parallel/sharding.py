"""Parameter/activation sharding rules (GSPMD partition specs by param path).

Replaces the reference's FSDP wrapping policies + MixedPrecision machinery
(reference: fsdp.py:135-183, base_vision.py:183-187, base_llm.py FSDP policy)
with declarative rules: each parameter path maps to a PartitionSpec over the
("replica", "fsdp", "tensor") mesh. XLA GSPMD inserts the all-gathers /
reduce-scatters the reference gets from torch FSDP — and additionally gives
tensor parallelism, which the reference lacks (SURVEY.md §2.10).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-regex, PartitionSpec). First match wins. Paths look like
#   "llm/layers/wq", "vision/featurizer/blocks/qkv/kernel", "projector/fc1/kernel"
PARAM_RULES: List[Tuple[str, P]] = [
    # --- LLM stacked decoder layers [L, ...] ---
    (r"llm/layers/w[qkv]$", P(None, "fsdp", "tensor")),          # [L, D, H*hd]
    (r"llm/layers/wo$", P(None, "tensor", "fsdp")),              # [L, H*hd, D]
    (r"llm/layers/w_(gate|up)$", P(None, "fsdp", "tensor")),     # [L, D, I]
    (r"llm/layers/w_down$", P(None, "tensor", "fsdp")),          # [L, I, D]
    (r"llm/layers/b[qkv]$", P(None, "tensor")),
    (r"llm/layers/b_up$", P(None, "tensor")),
    (r"llm/layers/(bo|b_down)$", P(None, None)),
    (r"llm/layers/.*norm.*$", P(None, None)),                    # [L, D]
    # --- LLM embeddings / head ---
    # Vocab-parallel embedding: rows over BOTH model axes, D replicated. A
    # 2-D-sharded table (vocab x D) forces the gather's backward scatter-add
    # to reshard the [B, T, D] cotangent from batch- to D-sharding — an
    # all-to-all XLA's SPMD partitioner cannot express (it warns "Involuntary
    # full rematerialization" and replicates instead). Row-only sharding keeps
    # the backward a masked local scatter + reduce-scatter over the rows.
    (r"llm/embed$", P(("fsdp", "tensor"), None)),                # [V, D]
    (r"llm/lm_head$", P("fsdp", "tensor")),                      # [D, V]
    (r"llm/lm_head_bias$", P("tensor")),
    (r"llm/final_norm.*$", P(None)),
    # --- projector (small; shard big dims on fsdp only) ---
    (r"projector/.*/kernel$", P("fsdp", None)),
    (r"projector/.*/bias$", P(None)),
    # --- vision towers (scanned blocks have leading layer dim) ---
    (r"vision/.*blocks/.*/kernel$", P(None, "fsdp", None)),      # [L, in, out]
    (r"vision/.*patch_embed/kernel$", P(None, None, None, "fsdp")),
    (r"vision/.*(pos_embed|cls_token|reg_tokens)$", P(None, None, None)),
    # fallback: replicate
    (r".*", P()),
]

# LoRA adapters: [.., in, r] / [.., r, out] — replicate (tiny).
LORA_RULE = (r".*lora_(a|b)$", P())

# --- serving (inference) rules: megatron-style tensor parallelism ------------
#
# Latency-bound decode streams the whole decoder from HBM once per token; on
# an N-chip mesh with these rules each chip streams 1/N of the weights and the
# per-layer partial results meet in one all-reduce after wo / w_down (XLA
# inserts them). Column-parallel: wq/wk/wv (heads split across chips — the
# pallas/einsum attention then runs on local heads), w_gate/w_up. Row-parallel:
# wo, w_down. lm_head splits the vocab (argmax reduces across shards).
# Embeddings, norms, the vision towers, and the projector are small and stay
# replicated — no collective on their path. int8 sibling `*_scale` leaves
# shard with their matrix's OUTPUT dim (per-out-channel scales); row-parallel
# scales apply after the contraction and must replicate.
# The `replica` axis carries batched serving: batch dims shard over it.
SERVING_RULES: List[Tuple[str, P]] = [
    (r"llm/layers/w[qkv]_scale$", P(None, None, "tensor")),      # [L, 1, out]
    (r"llm/layers/w_(gate|up)_scale$", P(None, None, "tensor")),
    (r"llm/layers/(wo|w_down)_scale$", P(None, None, None)),     # per-out (=D) after psum
    (r"llm/layers/w[qkv]$", P(None, None, "tensor")),            # [L, D, H*hd]
    (r"llm/layers/wo$", P(None, "tensor", None)),                # [L, H*hd, D]
    (r"llm/layers/w_(gate|up)$", P(None, None, "tensor")),       # [L, D, I]
    (r"llm/layers/w_down$", P(None, "tensor", None)),            # [L, I, D]
    (r"llm/layers/b[qkv]$", P(None, "tensor")),
    (r"llm/layers/b_up$", P(None, "tensor")),
    (r"llm/lm_head_scale$", P(None, "tensor")),                  # [1, V]
    (r"llm/lm_head$", P(None, "tensor")),                        # [D, V]
    (r"llm/lm_head_bias$", P("tensor")),
    (r".*", P()),  # embed(+scale), norms, biases, vision, projector: replicate
]


def serving_param_shardings(mesh: Mesh, params: Any, int4_shards: int = 1) -> Any:
    sh = param_shardings(mesh, params, rules=SERVING_RULES)
    # Packed-int4 leaves (capacity mode, ops/quant.py::pack_int4).
    #
    # int4_shards == 1 (the round-3 state, still the single-chip default):
    # global out-pairing couples output columns c and N/2+c inside one byte,
    # so no contiguous column shard of the packed tensor maps to a
    # contiguous result shard — weights REPLICATE under a mesh (13B int4 is
    # ~8.7 GB, fits per-chip); multi-chip int4 parallelism comes from the
    # replica (batch) axis.
    #
    # int4_shards == mesh tensor size (round-4 TP mode): the checkpoint was
    # quantized with SHARD-BLOCKED packing (pack_int4 n_shards), so the
    # column-parallel leaves shard on their packed output dim (each chip's
    # contiguous block is a standard v2 matrix over its own columns) and
    # the row-parallel ones (wo/w_down: global pairing, contraction-dim
    # rows) shard on K with per-shard scale groups where alignment allows —
    # megatron int4, each chip streaming ~1/N of the packed bytes. The
    # matmul's custom_partitioning supplies the shard-local kernels + psum
    # (ops/int4_matmul.py).
    from bridgelang_tpu.ops.int4_matmul import int4_row_shardable
    from bridgelang_tpu.ops.quant import INT4_COLUMN_PARALLEL

    llm_layers = params.get("llm", {}).get("layers", {}) if isinstance(params, dict) else {}
    scale4 = [k for k in llm_layers if k.endswith("_scale4")]
    if scale4:
        tensor_size = int(mesh.shape.get("tensor", 1))
        repl = NamedSharding(mesh, P())
        col = NamedSharding(mesh, P(None, None, "tensor"))   # [L, K, N/2] / [L, G, N]
        rowp = NamedSharding(mesh, P(None, "tensor", None))  # [L, K, N/2] / [L, G, N]
        layers_sh = dict(sh["llm"]["layers"])
        for k in scale4:
            base = k[: -len("_scale4")]
            if int4_shards > 1 and int4_shards == tensor_size and base in INT4_COLUMN_PARALLEL:
                layers_sh[base] = col
                layers_sh[k] = col
            elif (int4_shards > 1 and int4_shards == tensor_size
                  and int4_row_shardable(llm_layers[base].shape[-2],
                                         llm_layers[k].shape[-2], tensor_size)):
                layers_sh[base] = rowp
                layers_sh[k] = rowp
            else:
                layers_sh[base] = repl
                layers_sh[k] = repl
        sh = {**sh, "llm": {**sh["llm"], "layers": layers_sh}}
    return sh


def shard_params_for_serving(mesh: Mesh, params: Any, int4_shards: int = 1) -> Any:
    """Device-put a (possibly int8/int4-quantized) serving param pytree with
    tensor-parallel shardings. Pair with OpenVLA.use_mesh(mesh). For int4,
    `int4_shards` must equal the pack-time n_shards (deploy.py passes it)."""
    return jax.device_put(params, serving_param_shardings(mesh, params, int4_shards=int4_shards))


# --- activation constraints ---------------------------------------------------
#
# GSPMD propagates shardings from parameters into activations; at the
# vision -> projector -> LLM seams that propagation is ambiguous (batch-sharded
# patch activations meet tensor/fsdp-sharded projector kernels) and XLA can
# resolve the forward and backward passes to DIFFERENT specs — observed as an
# "Involuntary full rematerialization" (an all-gather of the projector GELU
# intermediate every step) in the round-2 multichip dryrun. Pinning the seam
# activations to batch sharding removes the ambiguity. The constraint reads the
# ambient mesh set with `jax.sharding.set_mesh(mesh)` (see scripts/train.py,
# __graft_entry__.dryrun_multichip) and is a NO-OP when none is active, so
# single-device paths and tests trace identically to before.

ACTIVATION_BATCH_AXES = ("replica", "fsdp")


def constrain(x, *entries):
    """`with_sharding_constraint(x, P(*entries))` against the ambient mesh.

    No-op when no mesh context is active; axis names absent from the active
    mesh are dropped from the spec (a serving mesh may only have `tensor`)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    names = set(mesh.axis_names)

    def keep(e):
        if isinstance(e, (tuple, list)):
            kept = tuple(a for a in e if a in names)
            return kept if kept else None
        return e if e in names else None

    spec = [keep(e) for e in entries]
    spec += [None] * max(0, x.ndim - len(spec))
    return jax.lax.with_sharding_constraint(x, P(*spec[: x.ndim]))


def constrain_batch(x):
    """Pin an activation's LEADING (batch) dim to the data axes."""
    return constrain(x, ACTIVATION_BATCH_AXES)


def with_ambient_mesh(mesh: Mesh, fn):
    """Run `fn` (typically a jitted train step) under `jax.sharding.set_mesh`
    so the seam `constrain` calls bind when it traces."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.sharding.set_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path: str, ndim: int, rules: Optional[List[Tuple[str, P]]] = None) -> P:
    for pattern, spec in (rules or PARAM_RULES):
        if re.search(pattern, path):
            # Trim/extend spec to the param's rank.
            entries = list(spec) + [None] * max(0, ndim - len(spec))
            return P(*entries[:ndim])
    return P()


def param_shardings(mesh: Mesh, params: Any, rules: Optional[List[Tuple[str, P]]] = None) -> Any:
    """Pytree of NamedSharding matching `params`."""

    def one(path, leaf):
        return NamedSharding(mesh, spec_for_path(path_str(path), leaf.ndim, rules))

    return jax.tree_util.tree_map_with_path(one, params)


def param_pspecs(params: Any, rules: Optional[List[Tuple[str, P]]] = None) -> Any:
    def one(path, leaf):
        return spec_for_path(path_str(path), leaf.ndim, rules)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batch: sharded over both data axes (replica × fsdp)."""
    return NamedSharding(mesh, P(("replica", "fsdp")))


def batch_pspec() -> P:
    return P(("replica", "fsdp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a host batch with leading-dim sharding over the data axes."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_array_from_process_local(mesh: Mesh, local_batch: Dict[str, Any]) -> Dict[str, Any]:
    """Multi-host path: each host contributes its local shard
    (replaces the reference's per-rank DataLoader semantics,
    base_strategy.py:258-266, with per-host tf.data shards)."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(x, mesh, batch_pspec()),
        local_batch,
    )
