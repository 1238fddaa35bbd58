"""Single-image predict_action demo (counterpart of the fork's
run_openvla_demo.py:1-53 + run_openvla.sh): load a checkpoint, run one action
prediction on an image, log the result.

  python scripts/demo.py --checkpoint /ckpts/openvla-7b --image test.jpg \
      --instruction "pick up the cup" [--log_file run_log.txt]
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from bridgelang_tpu.conf import parse_cli


@dataclass
class DemoConfig:
    checkpoint: str = "openvla-7b"
    image: str = "test.jpg"
    instruction: str = "pick up the object"
    unnorm_key: Optional[str] = None
    tokenizer_path: Optional[str] = None
    quantize_int8: bool = True
    log_file: Optional[str] = None


def main(cfg: DemoConfig) -> None:
    import numpy as np
    from PIL import Image

    from bridgelang_tpu.models.llm.tokenizer import get_tokenizer
    from bridgelang_tpu.models.load import load_vla

    model, params = load_vla(cfg.checkpoint, quantize_int8=cfg.quantize_int8)
    model.tokenizer = get_tokenizer(cfg.tokenizer_path)
    image = np.asarray(Image.open(cfg.image).convert("RGB"))

    t0 = time.time()
    action = model.predict_action(params, image, cfg.instruction, unnorm_key=cfg.unnorm_key)
    msg = (f"instruction={cfg.instruction!r}\naction={np.round(action, 5).tolist()}\n"
           f"latency={time.time()-t0:.2f}s (incl. compile)")
    print(msg)
    if cfg.log_file:
        with open(cfg.log_file, "a") as f:
            f.write(msg + "\n")


if __name__ == "__main__":
    main(parse_cli(DemoConfig))
