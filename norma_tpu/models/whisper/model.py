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
        timestamps: bool = False,
    ) -> None:
        self.engine = engine
        self.tokenizer = tokenizer
        self.longform = LongFormDecoder(
            engine,
            tokenizer,
            lang,
            language_tokens=language_tokens,
            seed=seed,
            timestamps=timestamps,
        )

    def transcribe(self, data: np.ndarray, final_chunk: bool) -> str:
        return self.longform.transcribe(np.asarray(data, np.float32), final_chunk)

    def warmup(self) -> None:
        """Pre-compile the serving path (fused window prefill + token loop,
        and the detection path for multilingual models) so the first real
        audio chunk doesn't pay compilation latency."""
        import jax.numpy as jnp

        from ...frontend.mel import prepare_audio

        lf = self.longform
        audio = jnp.asarray(
            prepare_audio(np.zeros(lf.window_samples, np.float32), lf.n_frames)
        )[None]
        lang = lf.lang.token
        if lang is None:
            from ...frontend.mel import log_mel_spectrogram

            mel = log_mel_spectrogram(
                audio, n_mels=self.engine.cfg.num_mel_bins, n_frames=lf.n_frames
            )
            feats = self.engine.encode(mel)
            self.engine.detect_language(feats)
            lang = self.engine.st.sot  # any valid slot token compiles the loop
        state = self.engine.prefill_window(audio, int(lang))
        self.engine.run_loop(state, 0.0, seed=0)
