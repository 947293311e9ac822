"""The runnable Whisper streaming model.

Re-creation of the reference's ``whisper::Model`` + its ``Model`` impl
(``/root/reference/src/models/whisper/model.rs:16-159``): owns the decode
engine, tokenizer and long-form state, and consumes PCM chunks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ...decode import DecodeEngine, LanguageState, LongFormDecoder
from .. import Model


class WhisperModel(Model):
    SAMPLE_RATE = 16_000
    dtype = np.float32

    def __init__(
        self,
        engine: DecodeEngine,
        tokenizer,
        lang: LanguageState,
        language_tokens: Optional[Sequence[int]] = None,
        seed: int = 0,
    ) -> None:
        self.engine = engine
        self.tokenizer = tokenizer
        self.longform = LongFormDecoder(
            engine, tokenizer, lang, language_tokens=language_tokens, seed=seed
        )

    def transcribe(self, data: np.ndarray, final_chunk: bool) -> str:
        return self.longform.transcribe(np.asarray(data, np.float32), final_chunk)
