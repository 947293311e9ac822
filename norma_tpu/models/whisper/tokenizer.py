"""Tokenizer facade.

The reference uses the HF ``tokenizers`` Rust crate directly
(``Cargo.toml:32``; usage whisper/mod.rs:86-90, model.rs:147).  We wrap the
same library's Python binding behind the two calls the framework needs so
tests can substitute a toy implementation.
"""

from __future__ import annotations

from typing import List, Optional

from ...errors import LoadTokenizerError


class WhisperTokenizer:
    def __init__(self, inner) -> None:
        self._inner = inner

    @classmethod
    def from_file(cls, path: str) -> "WhisperTokenizer":
        try:
            from tokenizers import Tokenizer
        except ImportError as e:  # pragma: no cover
            raise LoadTokenizerError(str(e)) from e
        try:
            return cls(Tokenizer.from_file(path))
        except Exception as e:
            raise LoadTokenizerError(str(e)) from e

    def token_to_id(self, token: str) -> Optional[int]:
        return self._inner.token_to_id(token)

    def decode(self, ids: List[int], skip_special_tokens: bool = True) -> str:
        return self._inner.decode(ids, skip_special_tokens=skip_special_tokens)
