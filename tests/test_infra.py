"""Infra utilities: overwatch rank helpers, stand-in tokenizer contract."""

import numpy as np

from bridgelang_tpu.models.llm.tokenizer import ByteFallbackTokenizer, get_tokenizer
from bridgelang_tpu.overwatch import initialize_overwatch


def test_overwatch_rank_helpers():
    ow = initialize_overwatch("test")
    assert ow.rank() == 0 and ow.world_size() >= 1 and ow.is_rank_zero()
    calls = []

    @ow.rank_zero_only
    def only_zero(x):
        calls.append(x)
        return x * 2

    assert only_zero(3) == 6 and calls == [3]


def test_byte_fallback_tokenizer_contract():
    tok = ByteFallbackTokenizer()
    ids = tok.encode("pick up the café cup")
    assert ids[0] == tok.bos_token_id
    # ids stay strictly below the action-token range
    assert max(ids) < 32000 - 256
    assert tok.decode(ids) == "pick up the café cup"
    assert tok("x").input_ids == tok.encode("x")
    assert isinstance(get_tokenizer(None), ByteFallbackTokenizer)


def test_tokenizer_never_collides_with_action_tokens():
    tok = ByteFallbackTokenizer()
    ids = tok.encode("".join(chr(c) for c in range(32, 1000)))
    assert max(ids) < 31744  # action tokens live in [31744, 32000)
