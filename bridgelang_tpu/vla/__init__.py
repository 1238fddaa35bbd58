from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer

__all__ = ["ActionTokenizer"]
