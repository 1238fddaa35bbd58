"""Interactive VLM REPL: chat about an image from the terminal.

Counterpart of reference scripts/generate.py:52-133.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class GenerateConfig:
    checkpoint: str = "prism-dinosiglip-224px+7b"
    image: str = "test.jpg"
    tokenizer_path: Optional[str] = None
    max_new_tokens: int = 128
    quantize_int8: bool = True


def main(cfg: GenerateConfig) -> None:
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from bridgelang_tpu.models.llm.prompting import get_prompt_builder
    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.models.load import load_vla
    from bridgelang_tpu.ops.image_ops import preprocess_batch

    model, params = load_vla(cfg.checkpoint, quantize_int8=cfg.quantize_int8)
    tokenizer = get_tokenizer(cfg.tokenizer_path)
    image = np.asarray(Image.open(cfg.image).convert("RGB"))
    pixels = preprocess_batch(jnp.asarray(image[None]), model.image_transform, dtype=model.dtype)

    print(f"Loaded {cfg.checkpoint}; chatting about {cfg.image} (ctrl-d to exit)")
    builder = get_prompt_builder(model.cfg.llm_family)
    while True:
        try:
            user = input("\n>> ")
        except EOFError:
            break
        builder.add_turn("human", user)
        ids = np.asarray(tokenizer.encode(builder.get_prompt()), dtype=np.int32)[None]
        mask = np.ones_like(ids)
        out = model.generate_greedy(params, jnp.asarray(ids), jnp.asarray(mask), pixels,
                                    max_new_tokens=cfg.max_new_tokens)
        out_ids = np.asarray(out)[0]
        eos = np.where(out_ids == model.cfg.llm.eos_token_id)[0]
        if len(eos):
            out_ids = out_ids[: eos[0]]
        reply = tokenizer.decode(out_ids.tolist())
        builder.add_turn("gpt", reply)
        print(reply)


if __name__ == "__main__":
    main(parse_cli(GenerateConfig))
