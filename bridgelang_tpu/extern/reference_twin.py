"""Import and drive the reference's own `trust_remote_code` HF modeling files.

The last unexecuted reference surface (VERDICT r04, Missing #2): checkpoints
exported by `extern/hf_export.py` were manifest-checked against the
reference's converter key map, but never LOADED under the reference's actual
`modeling_prismatic.py` — that file hard-imports timm. With
`extern/timm_shim.py` supplying the timm surface, this module imports the
reference's configuration + modeling files verbatim from a directory (no
copy into this repo) and builds the twin from an exported checkpoint.

Decode uses a manual cached greedy loop through the twin's OWN
`forward()` (both its multimodal fuse-after-BOS branch and its cached
single-token branch, modeling_prismatic.py:325-430) rather than
`GenerationMixin.generate`: the twin pins transformers==4.40.1 conventions
(`_reorder_cache`, legacy `prepare_inputs_for_generation`) and this
environment carries 4.57, where GenerationMixin's internals drifted. The
forward path — the part the reference authored — is what parity must
exercise; the greedy argmax loop around it is 6 lines of driver.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path
from typing import Optional

import numpy as np


_IMPORTED_DIRS: dict = {}  # package_name -> resolved source dir


def import_reference_hf(hf_dir, package_name: str = "bridgelang_reference_hf"):
    """Import `configuration_prismatic.py` + `modeling_prismatic.py` from
    `hf_dir` as a package (their relative imports intact). Returns the
    modeling module. Installs the timm shim first if timm is absent.

    Import is cached per `package_name`; asking for a DIFFERENT hf_dir under
    the same name raises instead of silently returning the first tree's
    code (a parity 'pass' against modeling code that was never loaded)."""
    from bridgelang_tpu.extern.timm_shim import install

    install()
    hf_dir = Path(hf_dir).resolve()
    if package_name in sys.modules:
        cached = _IMPORTED_DIRS.get(package_name)
        if cached is not None and cached != hf_dir:
            raise ValueError(
                f"{package_name!r} already imported from {cached}; pass a distinct "
                f"package_name to load modeling code from {hf_dir}")
        return sys.modules[package_name + ".modeling_prismatic"]
    import importlib.machinery

    pkg = types.ModuleType(package_name)
    pkg.__path__ = [str(hf_dir)]
    pkg.__package__ = package_name
    pkg.__spec__ = importlib.machinery.ModuleSpec(package_name, None, is_package=True)
    sys.modules[package_name] = pkg
    try:
        for sub in ("configuration_prismatic", "modeling_prismatic"):
            spec = importlib.util.spec_from_file_location(
                f"{package_name}.{sub}", hf_dir / f"{sub}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"{package_name}.{sub}"] = mod
            spec.loader.exec_module(mod)
    except BaseException:
        # A half-imported package must not poison the cache: drop every
        # registered module so a retry (same or corrected hf_dir) starts
        # clean instead of hitting the already-imported guard above.
        for name in (package_name, f"{package_name}.configuration_prismatic",
                     f"{package_name}.modeling_prismatic"):
            sys.modules.pop(name, None)
        raise
    # Record the source dir only AFTER a fully successful import.
    _IMPORTED_DIRS[package_name] = hf_dir
    return sys.modules[package_name + ".modeling_prismatic"]


def load_twin(ckpt_dir, hf_dir, strict: bool = True):
    """Build `OpenVLAForActionPrediction` from an exported checkpoint dir
    (config.json + model.safetensors) using the reference's modeling code.

    Returns (twin_model.eval(), load_result) where load_result is torch's
    (missing_keys, unexpected_keys). With `strict=False` a default export's
    known dead-weight gaps (tower-final `norm`, SigLIP `attn_pool` — see
    hf_export.py docstring) surface in missing_keys; an export made with
    `source_hf=` loads with both lists empty.
    """
    from safetensors import safe_open

    modeling = import_reference_hf(hf_dir)
    config_mod = sys.modules[modeling.__package__ + ".configuration_prismatic"]

    ckpt_dir = Path(ckpt_dir)
    with open(ckpt_dir / "config.json") as f:
        raw = json.load(f)
    raw.pop("architectures", None)
    raw.pop("model_type", None)
    config = config_mod.OpenVLAConfig(**raw)
    # transformers>=4.55 resolves attention at __init__ via the model's
    # `_supports_sdpa`, which the twin defines as a property delegating to
    # `self.language_model` — not yet constructed at that point (the twin
    # pins transformers==4.40.1, where the probe ran later). Requesting
    # eager attention sidesteps the probe; eager is also the deterministic
    # choice for parity checks.
    config._attn_implementation = "eager"

    twin = modeling.OpenVLAForActionPrediction(config)
    # framework="pt": native torch tensors, so bf16 checkpoints (every
    # published openvla-7b shard) load without a numpy round trip (numpy
    # reads bf16 as ml_dtypes.bfloat16, which torch.from_numpy rejects).
    # Glob picks up sharded model-0000x-of-0000N.safetensors layouts too;
    # load_state_dict casts into the twin's fp32 params via Tensor.copy_.
    sd = {}
    files = sorted(ckpt_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No *.safetensors under {ckpt_dir}")
    for f in files:
        with safe_open(str(f), framework="pt") as sf:
            for key in sf.keys():
                sd[key] = sf.get_tensor(key)
    result = twin.load_state_dict(sd, strict=strict)
    return twin.eval(), result


def twin_greedy_actions(twin, input_ids: np.ndarray, pixel_values: np.ndarray,
                        n_tokens: int = 7, unnorm_key: Optional[str] = None):
    """Greedy-decode `n_tokens` action tokens through the twin's own forward
    (multimodal prefill + cached steps), then apply ITS de-tokenization
    (bin_centers / vocab-offset / q01-q99, modeling_prismatic.py:510-534).
    Returns (tokens[int64], unnormalized action[float64])."""
    import torch

    ids = torch.from_numpy(np.asarray(input_ids, np.int64))
    pix = torch.from_numpy(np.asarray(pixel_values, np.float32))
    tokens = []
    with torch.no_grad():
        out = twin(input_ids=ids, attention_mask=torch.ones_like(ids),
                   pixel_values=pix, use_cache=True)
        past = out.past_key_values
        nxt = out.logits[:, -1].argmax(-1, keepdim=True)
        tokens.append(int(nxt))
        for _ in range(n_tokens - 1):
            out = twin(input_ids=nxt, past_key_values=past, use_cache=True)
            past = out.past_key_values
            nxt = out.logits[:, -1].argmax(-1, keepdim=True)
            tokens.append(int(nxt))
    toks = np.asarray(tokens, np.int64)

    # The twin's own de-tokenization contract (predict_action tail).
    discretized = twin.vocab_size - toks
    normalized = twin.bin_centers[np.clip(discretized - 1, 0, twin.bin_centers.shape[0] - 1)]
    if unnorm_key is None:
        return toks, normalized
    stats = twin.get_action_stats(unnorm_key) if hasattr(twin, "get_action_stats") \
        else twin.norm_stats[unnorm_key]["action"]
    mask = np.asarray(stats.get("mask", np.ones_like(stats["q01"], dtype=bool)))
    q01, q99 = np.asarray(stats["q01"]), np.asarray(stats["q99"])
    action = np.where(mask, 0.5 * (normalized + 1) * (q99 - q01) + q01, normalized)
    return toks, action
