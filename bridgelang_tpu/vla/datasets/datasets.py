"""VLA dataset wrappers: RLDS frame -> training example, dataset iterators.

Counterpart of reference prismatic/vla/datasets/datasets.py:30-232
(RLDSBatchTransform / RLDSDataset / EpisodicRLDSDataset / DummyDataset).
TPU-first deltas:

* The batch transform emits raw uint8 frames + token ids; image normalization
  happens ON DEVICE inside the jitted train step (fused XLA preprocessing)
  instead of per-frame torch transforms on the host.
* Action tokens are appended NUMERICALLY (prompt ids + [29871] + action ids +
  EOS) — equivalent to the reference's string round-trip through the Llama
  tokenizer (which merges '▁' into token 29871 before the action tokens,
  the very token predict_action re-appends at inference; vlas/openvla.py:58-66).
* No torch DataLoader: tf.data's C++ runtime already provides parallel,
  prefetched iteration per host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from bridgelang_tpu.models.llm.prompting import get_prompt_builder
from bridgelang_tpu.models.vlm import IGNORE_INDEX, LLAMA_EMPTY_TOKEN
from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer

EOS_TOKEN_ID = 2  # Llama </s>


@dataclasses.dataclass
class RLDSBatchTransform:
    action_tokenizer: ActionTokenizer
    base_tokenizer: Any  # callable(str) -> ids (HF tokenizer or stand-in)
    llm_family: str = "llama2-pure"
    predict_stop_token: bool = True
    image_key: str = "image_primary"
    # OFT-style action chunking: tokenize the current action PLUS the next
    # chunk-1 future actions (requires the dataset's
    # future_action_window_size >= chunk-1) as one flat action_dim*chunk
    # span. Train with --parallel_decode and serve predict_action_chunk.
    action_chunk: int = 1

    def __call__(self, rlds_batch: Dict[str, Any]) -> Dict[str, Any]:
        """One RLDS frame -> {frames, input_ids, labels, dataset_name}
        (reference datasets.py:30-67)."""
        dataset_name = _to_str(rlds_batch["dataset_name"])
        action = np.asarray(rlds_batch["action"])  # [window+future, dim]
        action = action[: self.action_chunk] if self.action_chunk > 1 else action[0]
        img = np.asarray(rlds_batch["observation"][self.image_key][0])
        lang = _to_str(rlds_batch["task"]["language_instruction"])

        builder = get_prompt_builder(self.llm_family)
        builder.add_turn("human", f"What action should the robot take to {lang.lower()}?")
        prompt_text = builder.get_prompt()

        prompt_ids = _encode(self.base_tokenizer, prompt_text)
        if prompt_ids[-1] != LLAMA_EMPTY_TOKEN:
            prompt_ids = np.concatenate([prompt_ids, [LLAMA_EMPTY_TOKEN]])
        action_ids = self.action_tokenizer.encode_to_ids(action).reshape(-1)
        input_ids = np.concatenate([prompt_ids, action_ids, [EOS_TOKEN_ID]]).astype(np.int32)

        # Loss only on the action tokens (+ optional EOS); everything before is
        # context (reference datasets.py:62-65: mask all but the final
        # action_dim+1 tokens, then mask EOS when predict_stop_token=False —
        # the supervised window must stay anchored on the ACTION tokens).
        labels = np.full_like(input_ids, IGNORE_INDEX)
        labels[-(len(action_ids) + 1):] = input_ids[-(len(action_ids) + 1):]
        if not self.predict_stop_token:
            labels[-1] = IGNORE_INDEX

        return {
            "frames": img,
            "input_ids": input_ids,
            "labels": labels,
            "dataset_name": dataset_name,
        }


def _to_str(x: Any) -> str:
    if isinstance(x, bytes):
        return x.decode("utf-8")
    if isinstance(x, np.ndarray):
        return _to_str(x.item() if x.ndim == 0 else x.flat[0])
    return str(x)


def _encode(tokenizer: Any, text: str) -> np.ndarray:
    if hasattr(tokenizer, "encode"):
        ids = tokenizer.encode(text)
    else:
        out = tokenizer(text)
        ids = out.input_ids if hasattr(out, "input_ids") else out["input_ids"]
    ids = np.asarray(ids)
    return ids[0] if ids.ndim > 1 else ids


@dataclasses.dataclass
class PaddedCollatorForActionPrediction:
    """Fixed-shape batch assembly (reference util/data_utils.py:94-142):
    right-pad token ids/labels to a static bucket (XLA never recompiles),
    stack uint8 frames, carry dataset names for per-dataset metrics."""

    max_length: int = 64
    pad_token_id: int = 32000
    padding_side: str = "right"  # contract: fused BOS logic requires right pad

    def __post_init__(self):
        assert self.padding_side == "right", "PrismaticVLM requires right padding"
        self._n_dropped = 0

    def __call__(self, examples: List[Dict[str, Any]]) -> Dict[str, Any]:
        # NEVER truncate: chopping the tail removes action tokens and their
        # labels (the reference pads to llm_max_length=2048 and so never
        # truncates either). Long-tail overlong instructions are DROPPED with
        # a warning and the slot refilled from a kept example, so supervision
        # is always complete and shapes stay static.
        kept = [ex for ex in examples if len(ex["input_ids"]) <= self.max_length]
        n_over = len(examples) - len(kept)
        if n_over:
            self._n_dropped += n_over
            if self._n_dropped <= 10 or self._n_dropped % 1000 == 0:
                import logging

                logging.getLogger(__name__).warning(
                    "Dropped %d example(s) longer than max_length=%d (total dropped: %d) "
                    "— raise the collator max_length if this is common",
                    n_over, self.max_length, self._n_dropped,
                )
        if not kept:
            longest = max(len(ex["input_ids"]) for ex in examples)
            raise ValueError(
                f"every example in the batch exceeds max_length={self.max_length} "
                f"(longest: {longest}); raise the collator max_length"
            )
        examples = kept + [kept[i % len(kept)] for i in range(n_over)]

        b = len(examples)
        ids = np.full((b, self.max_length), self.pad_token_id, np.int32)
        labels = np.full((b, self.max_length), IGNORE_INDEX, np.int32)
        mask = np.zeros((b, self.max_length), np.int32)
        for i, ex in enumerate(examples):
            seq = ex["input_ids"]
            ids[i, : len(seq)] = seq
            labels[i, : len(seq)] = ex["labels"]
            mask[i, : len(seq)] = 1
        frames = np.stack([ex["frames"] for ex in examples])
        return {
            "input_ids": ids,
            "labels": labels,
            "attention_mask": mask,
            "frames": frames,
            "dataset_names": [ex["dataset_name"] for ex in examples],
        }


class RLDSDataset:
    """Iterable over interleaved RLDS frames -> collated fixed-shape batches
    (reference datasets.py:70-178, IterableDataset + rlds_config)."""

    def __init__(
        self,
        data_root_dir: str,
        data_mix: str,
        batch_transform: RLDSBatchTransform,
        collator: PaddedCollatorForActionPrediction,
        batch_size: int,
        *,
        shuffle_buffer_size: int = 256_000,
        train: bool = True,
        image_aug: bool = False,
        resize_resolution: Tuple[int, int] = (224, 224),
        load_camera_views: Tuple[str, ...] = ("primary",),
        builder_factory: Optional[Callable[[str], Any]] = None,
        traj_transform_threads: Optional[int] = None,
        traj_read_threads: Optional[int] = None,
        future_action_window_size: int = 0,
    ):
        from bridgelang_tpu.vla.datasets.rlds.dataset import make_interleaved_dataset
        from bridgelang_tpu.vla.datasets.rlds.oxe.materialize import (
            get_oxe_dataset_kwargs_and_weights,
            resolve_mixture,
        )

        self.batch_transform = batch_transform
        self.collator = collator
        self.batch_size = batch_size

        mixture = resolve_mixture(data_mix)
        per_dataset_kwargs, weights = get_oxe_dataset_kwargs_and_weights(
            data_root_dir, mixture, load_camera_views=load_camera_views
        )
        if builder_factory is not None:
            for kw in per_dataset_kwargs:
                kw["builder"] = builder_factory(kw["name"])

        frame_transform_kwargs: Dict[str, Any] = {"resize_size": resize_resolution}
        if image_aug:
            frame_transform_kwargs["image_augment_kwargs"] = {
                "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
                "random_brightness": [0.2],
                "random_contrast": [0.8, 1.2],
                "random_saturation": [0.8, 1.2],
                "random_hue": [0.05],
                "augment_order": [
                    "random_resized_crop",
                    "random_brightness",
                    "random_contrast",
                    "random_saturation",
                    "random_hue",
                ],
            }

        self.dataset = make_interleaved_dataset(
            per_dataset_kwargs,
            weights,
            train=train,
            shuffle_buffer_size=shuffle_buffer_size,
            traj_transform_kwargs={
                "window_size": 1,
                "future_action_window_size": future_action_window_size,
                "skip_unlabeled": True,
                "goal_relabeling_strategy": None,
            },
            frame_transform_kwargs=frame_transform_kwargs,
            balance_weights=True,
            traj_transform_threads=traj_transform_threads,
            traj_read_threads=traj_read_threads,
        )
        self.dataset_statistics = self.dataset.dataset_statistics
        self.true_length = getattr(self.dataset, "true_length", None)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        examples: List[Dict[str, Any]] = []
        for frame in self.dataset.as_numpy_iterator():
            examples.append(self.batch_transform(frame))
            if len(examples) == self.batch_size:
                yield self.collator(examples)
                examples = []

    def __len__(self) -> int:
        if self.true_length is None:
            raise TypeError("Streaming dataset without known length")
        return self.true_length


class EpisodicRLDSDataset:
    """Whole-trajectory variant (reference datasets.py:162-178)."""

    def __init__(self, data_root_dir: str, dataset_name: str, batch_transform: RLDSBatchTransform,
                 train: bool = True, builder=None):
        from bridgelang_tpu.vla.datasets.rlds.dataset import apply_trajectory_transforms, make_dataset_from_rlds
        from bridgelang_tpu.vla.datasets.rlds.oxe.materialize import make_oxe_dataset_kwargs

        kwargs = make_oxe_dataset_kwargs(dataset_name, data_root_dir)
        if builder is not None:
            kwargs["builder"] = builder
        ds, self.dataset_statistics = make_dataset_from_rlds(train=train, **kwargs)
        self.dataset = apply_trajectory_transforms(ds, train=train, window_size=1)
        self.batch_transform = batch_transform

    def __iter__(self) -> Iterator[List[Dict[str, Any]]]:
        def index(node, i):
            if isinstance(node, dict):
                return {k: index(v, i) for k, v in node.items()}
            return node[i]

        for traj in self.dataset.as_numpy_iterator():
            n = len(traj["action"])
            yield [self.batch_transform(index(traj, i)) for i in range(n)]


class DummyDataset:
    """Synthetic VLA dataset template (reference datasets.py:180-232) — also
    the fixture for end-to-end training tests."""

    def __init__(self, batch_transform: RLDSBatchTransform, n: int = 64, seed: int = 0,
                 image_hw: Tuple[int, int] = (224, 224)):
        self.batch_transform = batch_transform
        self.n = n
        self.rng = np.random.default_rng(seed)
        self.image_hw = image_hw

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            frame = {
                "dataset_name": "dummy_dataset",
                "action": self.rng.uniform(-1, 1, size=(1, 7)).astype(np.float32),
                "observation": {
                    "image_primary": self.rng.integers(0, 255, size=(1, *self.image_hw, 3), dtype=np.uint8)
                },
                "task": {"language_instruction": b"do something spectacular"},
            }
            yield self.batch_transform(frame)
