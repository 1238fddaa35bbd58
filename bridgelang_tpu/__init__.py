"""BridgeLang-TPU: a TPU-native Vision-Language-Action (VLA) framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
OpenVLA/Prismatic stack (reference: CliffKai/BridgeLang): VLM pretraining, VLA
pretraining on Open X-Embodiment RLDS mixtures, LoRA + full fine-tuning,
`predict_action` inference with on-device action de-tokenization, REST serving,
and robot-benchmark evaluation — built for TPU meshes (SPMD via
`jax.sharding`), not translated from the reference's CUDA/FSDP design.

Public API mirrors the reference's top-level surface
(`prismatic/__init__.py`): `load`, `load_vla`, `available_models`.
"""

from bridgelang_tpu.version import __version__  # noqa: F401

__all__ = ["__version__"]


def __getattr__(name):  # lazy: avoid importing jax for trivial metadata access
    if name in ("load", "load_vla", "available_models", "available_model_names"):
        from bridgelang_tpu.models import load as _load_mod

        return getattr(_load_mod, name)
    raise AttributeError(f"module 'bridgelang_tpu' has no attribute {name!r}")
