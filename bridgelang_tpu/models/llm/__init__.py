from bridgelang_tpu.models.llm.llama import (
    LLM_CONFIGS,
    LLM_FAMILIES,
    LLMConfig,
    embed_tokens,
    init_kv_cache,
    init_llm_params,
    llm_forward,
    lm_logits,
)
from bridgelang_tpu.models.llm.prompting import PromptBuilder, build_vla_prompt, get_prompt_builder

__all__ = [
    "LLM_CONFIGS",
    "LLM_FAMILIES",
    "LLMConfig",
    "embed_tokens",
    "init_kv_cache",
    "init_llm_params",
    "llm_forward",
    "lm_logits",
    "PromptBuilder",
    "build_vla_prompt",
    "get_prompt_builder",
]
