"""Tokenizers for the JAX encoder/decoder models.

The reference gets tokenization from llama.cpp
(/root/reference/src/raglite/_embed.py:21-36).  Here:

- ``ByteTokenizer``: dependency-free UTF-8 byte tokenizer (ids 0-255 plus
  specials) for hermetic runs and tests.
- ``load_tokenizer``: HuggingFace ``tokenizers`` JSON when a checkpoint
  directory provides one.
"""

from __future__ import annotations

__all__ = ["ByteTokenizer", "HFTokenizer", "load_tokenizer"]


class ByteTokenizer:
    """UTF-8 bytes shifted past special ids; deterministic and lossless."""

    PAD, BOS, EOS = 0, 1, 2
    _OFFSET = 3

    def __init__(self, vocab_size: int = 8192) -> None:
        self.vocab_size = max(vocab_size, 256 + self._OFFSET)

    def encode(self, text: str) -> list[int]:
        return [b + self._OFFSET for b in text.encode("utf-8")]

    def decode(self, ids: list[int]) -> str:
        data = bytes(i - self._OFFSET for i in ids if i >= self._OFFSET)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    """Wrapper over a ``tokenizers`` JSON file (XLM-R sentencepiece and
    Qwen byte-level-BPE vocabularies both load through this)."""

    def __init__(self, path: str) -> None:
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()

        def first_id(*names: str, default: int) -> int:
            for name in names:
                tid = self._tok.token_to_id(name)
                if tid is not None:
                    return tid
            return default

        self.PAD = first_id("<pad>", "<|endoftext|>", default=0)
        self.BOS = first_id("<s>", "<|im_start|>", default=1)
        self.EOS = first_id("</s>", "<|im_end|>", "<|endoftext|>", default=2)

    def token_id(self, token: str) -> int | None:
        return self._tok.token_to_id(token)

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids: list[int]) -> str:
        return self._tok.decode(ids)


def load_tokenizer(path: str):
    import os

    if os.path.exists(path):
        return HFTokenizer(path)
    return ByteTokenizer()
