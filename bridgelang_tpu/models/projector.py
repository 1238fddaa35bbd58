"""Vision->LLM projectors (linear / gelu-mlp / fused-gelu-mlp).

Counterpart of reference prismatic/util/nn_utils.py:12-55 and the
`arch_specifier` switch at prismatic/models/vlms/prismatic.py:59-68.
Pure-pytree params (kernels stored [in, out]); GELU is exact (torch default).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def projector_kind(arch_specifier: str) -> str:
    if arch_specifier.endswith("linear"):
        return "linear"
    if arch_specifier.endswith("fused-gelu-mlp"):
        return "fused-gelu-mlp"
    if arch_specifier.endswith("gelu-mlp"):
        return "gelu-mlp"
    raise ValueError(f"Projector for arch specifier {arch_specifier!r} is not supported")


def init_projector_params(
    key: jax.Array, arch_specifier: str, vision_dim: int, llm_dim: int, dtype: jnp.dtype = jnp.float32
) -> Params:
    kind = projector_kind(arch_specifier)
    keys = jax.random.split(key, 3)

    def dense(k, din, dout):
        scale = din ** -0.5
        return {
            "kernel": (jax.random.normal(k, (din, dout)) * scale).astype(dtype),
            "bias": jnp.zeros((dout,), dtype=dtype),
        }

    if kind == "linear":
        return {"fc1": dense(keys[0], vision_dim, llm_dim)}
    if kind == "gelu-mlp":
        return {
            "fc1": dense(keys[0], vision_dim, llm_dim),
            "fc2": dense(keys[1], llm_dim, llm_dim),
        }
    # fused-gelu-mlp: vision_dim -> 4*vision_dim -> llm_dim -> llm_dim
    return {
        "fc1": dense(keys[0], vision_dim, 4 * vision_dim),
        "fc2": dense(keys[1], 4 * vision_dim, llm_dim),
        "fc3": dense(keys[2], llm_dim, llm_dim),
    }


def apply_projector(params: Params, patches: jnp.ndarray) -> jnp.ndarray:
    """[B, P, vision_dim] -> [B, P, llm_dim].

    Every intermediate is pinned to batch sharding (no-op off-mesh): the
    projector sits between batch-sharded vision activations and fsdp-sharded
    kernels, where GSPMD's forward and backward sharding choices can disagree
    and force an involuntary all-gather of the GELU intermediates (see
    parallel.sharding.constrain_batch)."""
    from bridgelang_tpu.parallel.sharding import constrain_batch

    def lin(p, x):
        return constrain_batch(x @ p["kernel"] + p["bias"])

    gelu = lambda x: constrain_batch(jax.nn.gelu(x, approximate=False))  # noqa: E731
    # Structure identifies the kind (params stay a pure array pytree):
    if "fc3" not in params:
        if "fc2" not in params:
            return lin(params["fc1"], patches)
        return lin(params["fc2"], gelu(lin(params["fc1"], patches)))
    h = gelu(lin(params["fc1"], patches))
    h = gelu(lin(params["fc2"], h))
    return lin(params["fc3"], h)
