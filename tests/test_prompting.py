"""Byte-exact prompt format tests (formats documented at reference
prismatic/models/backbones/llm/prompting/*.py; these strings define the
training distribution, so they must not drift)."""

from bridgelang_tpu.models.llm.prompting import (
    LLAMA2_CHAT_SYS_PROMPT,
    PromptBuilder,
    VICUNA_SYS_PROMPT,
    build_vla_prompt,
    get_prompt_builder,
)


def test_pure_single_turn():
    b = PromptBuilder("pure")
    b.add_turn("human", "What action should the robot take to pick up the cup?")
    assert b.get_prompt() == "In: What action should the robot take to pick up the cup?\nOut:"


def test_pure_multi_turn():
    b = PromptBuilder("pure")
    b.add_turn("human", "hello")
    b.add_turn("gpt", "hi there")
    b.add_turn("human", "bye")
    assert b.get_prompt() == "In: hello\nOut: hi there</s>In: bye\nOut:"


def test_pure_empty_gpt_turn_renders_space():
    b = PromptBuilder("pure")
    b.add_turn("human", "x")
    b.add_turn("gpt", "")
    assert b.prompt == "In: x\nOut:  </s>"


def test_image_token_stripped():
    b = PromptBuilder("pure")
    b.add_turn("human", "<image>\ndescribe")
    assert b.get_prompt() == "In: describe\nOut:"


def test_llama2_chat_first_turn_embeds_system_prompt():
    b = PromptBuilder("llama2-chat")
    b.add_turn("human", "hello")
    expected = f"[INST] <<SYS>\n{LLAMA2_CHAT_SYS_PROMPT}\n<</SYS>>\n\nhello [/INST]"
    assert b.get_prompt() == expected


def test_vicuna_first_turn_prefixes_system_prompt():
    b = PromptBuilder("vicuna-v15")
    b.add_turn("human", "hello")
    assert b.get_prompt() == f"{VICUNA_SYS_PROMPT} USER: hello ASSISTANT:"


def test_mistral_no_system_prompt():
    b = PromptBuilder("mistral-instruct")
    b.add_turn("human", "hello")
    assert b.get_prompt() == "[INST] hello [/INST]"


def test_phi_keeps_explicit_bos():
    b = PromptBuilder("phi")
    b.add_turn("human", "hello")
    b.add_turn("gpt", "world")
    assert b.get_prompt() == "<|endoftext|>Input: hello\nOutput: world\n<|endoftext|>"


def test_get_potential_prompt_does_not_mutate():
    b = PromptBuilder("pure")
    probe = b.get_potential_prompt("q1")
    assert probe == "In: q1\nOut:"
    assert b.prompt == "" and b.turn_count == 0


def test_family_dispatch():
    assert get_prompt_builder("llama2-pure").format_id == "pure"
    assert get_prompt_builder("vicuna").format_id == "vicuna-v15"


def test_vla_prompt_lowercases_instruction():
    # reference: vlas/openvla.py:53 lowercases the instruction
    assert build_vla_prompt("Pick UP the Cup") == "In: What action should the robot take to pick up the cup?\nOut:"
    assert build_vla_prompt("close drawer", openvla_v01=True) == (
        f"{VICUNA_SYS_PROMPT} USER: What action should the robot take to close drawer? ASSISTANT:"
    )
