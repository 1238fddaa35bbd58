"""Shared tiny-model fixtures for fast CPU tests."""

import dataclasses

import numpy as np

from bridgelang_tpu.models.llm.llama import LLMConfig
from bridgelang_tpu.models.vision.vit import ViTConfig
from bridgelang_tpu.models.vlm import VLMConfig

TINY_VIT = ViTConfig(image_size=32, patch_size=8, width=32, depth=4, num_heads=4, mlp_dim=64,
                     use_cls_token=True, num_reg_tokens=2, no_embed_class=True, layerscale_init=1e-5)
TINY_VIT_B = ViTConfig(image_size=32, patch_size=8, width=48, depth=3, num_heads=4, mlp_dim=96,
                       use_cls_token=False)

TINY_LLM = LLMConfig(
    vocab_size=512, padded_vocab_size=576, dim=64, n_layers=3, n_heads=4, n_kv_heads=2,
    intermediate_size=128, max_seq_len=256, pad_token_id=512,
)


def tiny_vlm_config() -> VLMConfig:
    # Uses the real dinosiglip wiring but overrides the LLM to a tiny one; the
    # vision backbone id must stay registered, so tests that need a tiny vision
    # tower monkey-patch build_vision_backbone (see test_vlm.py fixture).
    return dataclasses.replace(VLMConfig(), llm=TINY_LLM)


def random_image(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


TINY_NORM_STATS = {
    "bridge_orig": {
        "action": {
            "q01": [-0.1, -0.1, -0.1, -0.3, -0.3, -0.3, 0.0],
            "q99": [0.1, 0.1, 0.1, 0.3, 0.3, 0.3, 1.0],
            "mask": [True, True, True, True, True, True, False],
        }
    }
}


class StubTokenizer:
    """Minimal Llama-like tokenizer: maps characters to small ids; BOS=1."""

    vocab_size = 512
    pad_token_id = 512

    def __call__(self, text):
        ids = [1] + [2 + (ord(c) % 200) for c in text[:20]]

        class R:
            input_ids = ids

        return R()

    def encode(self, text):
        return self(text).input_ids

    def decode(self, ids):
        return " ".join(map(str, ids))

    def batch_decode(self, batch):
        return [self.decode(b) for b in batch]
