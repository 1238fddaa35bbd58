"""OpenVLA-specific eval helpers: model loading + action queries.

Counterpart of reference experiments/robot/openvla_utils.py:31-170. Two
backends: in-process (load_vla + jitted predict_action) or a remote REST
server (bridgelang_tpu.serving) — the sim machine then needs no TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


class _ChunkQueue:
    """Open-loop chunk execution (the OFT eval protocol): fetch an
    [H, action_dim] chunk once, pop one action per control tick, refetch when
    drained or when the task/unnorm_key changes. Requires a model fine-tuned
    with `finetune.py --parallel_decode --action_chunk H`."""

    def __init__(self, horizon: int):
        self.horizon = int(horizon)
        self._pending: list = []
        self._key = None

    def next(self, key, fetch) -> np.ndarray:
        if key != self._key:
            self._pending, self._key = [], key
        if not self._pending:
            chunk = np.asarray(fetch(self.horizon))
            self._pending = [chunk[i] for i in range(chunk.shape[0])]
        return self._pending.pop(0)

    def reset(self) -> None:
        """Flush pending actions. MUST be called at episode start — leftover
        chunk actions were planned from the PREVIOUS episode's last frame."""
        self._pending = []


class InProcessVLA:
    """Both backends can run SPECULATIVELY (cfg.speculative): the previous
    tick's action tokens become the next tick's draft, cutting steady-state
    decode latency ~40% on smooth trajectories with greedy-equivalent
    outputs (margin-gated; see models.vlm.generate_speculative). With
    cfg.action_chunk > 1 they instead execute chunks open-loop (one parallel
    forward per H ticks; see _ChunkQueue)."""

    def __init__(self, checkpoint: str, tokenizer_path: Optional[str] = None, quantize_int8: bool = True,
                 speculative: bool = False, action_chunk: int = 1):
        from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
        from bridgelang_tpu.models.load import load_vla

        self.model, self.params = load_vla(checkpoint, quantize_int8=quantize_int8)
        self.model.tokenizer = get_tokenizer(tokenizer_path)
        self.speculative = speculative
        self._last_tokens: Optional[np.ndarray] = None
        self._chunks = _ChunkQueue(action_chunk) if action_chunk > 1 else None

    def reset_episode(self) -> None:
        """Flush per-episode state (pending chunk actions, draft history)."""
        if self._chunks is not None:
            self._chunks.reset()
        self._last_tokens = None

    def predict(self, image: np.ndarray, instruction: str, unnorm_key: Optional[str]) -> np.ndarray:
        if self._chunks is not None:
            return self._chunks.next(
                (instruction, unnorm_key),
                lambda h: self.model.predict_action_chunk(
                    self.params, image, instruction, horizon=h, unnorm_key=unnorm_key),
            )
        if self.speculative:
            draft = self._last_tokens
            if draft is None:
                draft = np.zeros(self.model.get_action_dim(unnorm_key), np.int32)
            action, tokens = self.model.predict_action_speculative(
                self.params, image, instruction, draft_tokens=draft, unnorm_key=unnorm_key
            )
            self._last_tokens = tokens
            return action
        return self.model.predict_action(self.params, image, instruction, unnorm_key=unnorm_key)


class RemoteVLA:
    def __init__(self, host: str, port: int, speculative: bool = False, action_dim: int = 7,
                 action_chunk: int = 1):
        self.host, self.port = host, port
        self.speculative = speculative
        self.action_dim = action_dim
        self._last_tokens: Optional[np.ndarray] = None
        self._chunks = _ChunkQueue(action_chunk) if action_chunk > 1 else None

    def reset_episode(self) -> None:
        if self._chunks is not None:
            self._chunks.reset()
        self._last_tokens = None

    def predict(self, image: np.ndarray, instruction: str, unnorm_key: Optional[str]) -> np.ndarray:
        from bridgelang_tpu.serving.server import client_act

        if self._chunks is not None:
            return self._chunks.next(
                (instruction, unnorm_key),
                lambda h: client_act(self.host, self.port, image, instruction, unnorm_key, horizon=h),
            )
        if self.speculative:
            draft = self._last_tokens if self._last_tokens is not None else np.zeros(self.action_dim, np.int32)
            action, tokens = client_act(self.host, self.port, image, instruction, unnorm_key,
                                        draft_tokens=draft, return_tokens=True)
            if tokens is not None:
                self._last_tokens = tokens
            return action
        return client_act(self.host, self.port, image, instruction, unnorm_key)


def get_vla(cfg) -> Any:
    speculative = bool(getattr(cfg, "speculative", False))
    action_chunk = int(getattr(cfg, "action_chunk", 1))
    if getattr(cfg, "remote_host", None):
        return RemoteVLA(cfg.remote_host, cfg.remote_port, speculative=speculative,
                         action_chunk=action_chunk)
    return InProcessVLA(cfg.pretrained_checkpoint, getattr(cfg, "tokenizer_path", None),
                        speculative=speculative, action_chunk=action_chunk)


def crop_and_resize(image01: np.ndarray, crop_scale: float = 0.9) -> np.ndarray:
    """Center-crop sqrt(scale) per side + resize back — must match the
    train-time random-crop statistics (reference openvla_utils.py:81-124 warns
    LIBERO-trained models degrade without it)."""
    import jax.numpy as jnp

    from bridgelang_tpu.ops.image_ops import crop_and_resize_eval

    return np.asarray(crop_and_resize_eval(jnp.asarray(image01, dtype=jnp.float32), crop_scale))


def get_vla_action(vla, obs: Dict[str, Any], task_label: str, unnorm_key: Optional[str] = None,
                   center_crop: bool = False) -> np.ndarray:
    image = np.asarray(obs["full_image"])
    if center_crop:
        image01 = image.astype(np.float32) / 255.0
        image = (crop_and_resize(image01) * 255.0).round().astype(np.uint8)
    return vla.predict(image, task_label, unnorm_key)
