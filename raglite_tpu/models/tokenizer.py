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
    EOS_IDS = (2,)
    _OFFSET = 3

    def __init__(self, vocab_size: int = 8192) -> None:
        self.vocab_size = max(vocab_size, 256 + self._OFFSET)

    def encode(self, text: str) -> list[int]:
        return [b + self._OFFSET for b in text.encode("utf-8")]

    def decode(self, ids: list[int]) -> str:
        # Ids in [259, vocab_size) are unused vocabulary: skip them rather
        # than crash (unconstrained sampling can emit any id in the vocab).
        data = bytes(
            i - self._OFFSET for i in ids if self._OFFSET <= i < self._OFFSET + 256
        )
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    """Wrapper over a ``tokenizers`` JSON file (XLM-R sentencepiece, Qwen/
    Llama byte-level-BPE, and Gemma sentencepiece vocabularies all load
    through this).

    Special ids come from the checkpoint's ``config.json``
    (eos/bos/pad_token_id — the authoritative source) when available;
    otherwise from a probe over the common special-token names.  Name
    guessing alone mis-assigned REAL content tokens as specials for
    vocabularies using other names (Gemma's <bos>/<eos>, Llama-3's
    <|begin_of_text|>/<|end_of_text|>), which broke stop-token handling.
    """

    def __init__(self, path: str, *, special_ids: dict | None = None) -> None:
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()

        def first_id(*names: str, default: int) -> int:
            for name in names:
                tid = self._tok.token_to_id(name)
                if tid is not None:
                    return tid
            return default

        special_ids = special_ids or {}

        def resolved(key: str, *names: str, default: int) -> int:
            value = special_ids.get(key)
            if isinstance(value, int):
                return value
            if isinstance(value, list) and value and isinstance(value[0], int):
                return value[0]  # HF configs may list several eos ids
            return first_id(*names, default=default)

        self.PAD = resolved("pad_token_id", "<pad>", "<|endoftext|>", default=0)
        self.BOS = resolved(
            "bos_token_id", "<s>", "<bos>", "<|begin_of_text|>", "<|im_start|>",
            default=1,
        )
        self.EOS = resolved(
            "eos_token_id", "</s>", "<eos>", "<|end_of_text|>", "<|im_end|>",
            "<|endoftext|>", default=2,
        )
        # HF configs may list SEVERAL eos ids (Llama-3 instruct:
        # [<|end_of_text|>, <|eot_id|>]); generation must stop on every one
        # of them, not just EOS = the first.
        eos_value = special_ids.get("eos_token_id")
        if isinstance(eos_value, list):
            self.EOS_IDS = tuple(i for i in eos_value if isinstance(i, int)) or (self.EOS,)
        else:
            self.EOS_IDS = (self.EOS,)

    def token_id(self, token: str) -> int | None:
        return self._tok.token_to_id(token)

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids: list[int]) -> str:
        return self._tok.decode(ids)


def load_tokenizer(path: str, *, required: bool = True):
    """Load the checkpoint's tokenizer.json (with special ids from the
    sibling config.json when present).

    A missing file raises by default — feeding UTF-8 byte ids into a BPE
    embedding table produces meaningless embeddings / gibberish generations
    with no error anywhere.  ``required=False`` degrades to the byte
    tokenizer WITH a warning (numerics-only use, e.g. parity testing).
    """
    import json
    import os

    if not os.path.exists(path):
        msg = (
            f"tokenizer.json not found at {path}; a pretrained checkpoint "
            "must ship its tokenizer (the byte tokenizer is only valid for "
            "presets and orbax checkpoints trained with it)"
        )
        if required:
            raise FileNotFoundError(msg)
        import warnings

        warnings.warn(msg + " — falling back to the byte tokenizer", stacklevel=2)
        return ByteTokenizer()
    special_ids: dict = {}
    config_path = os.path.join(os.path.dirname(path), "config.json")
    if os.path.exists(config_path):
        with open(config_path) as f:
            hf = json.load(f)
        special_ids = {
            key: hf[key]
            for key in ("pad_token_id", "bos_token_id", "eos_token_id")
            if hf.get(key) is not None
        }
    return HFTokenizer(path, special_ids=special_ids)
