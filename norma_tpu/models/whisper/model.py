"""The runnable Whisper streaming model.

Re-creation of the reference's ``whisper::Model`` + its ``Model`` impl
(``/root/reference/src/models/whisper/model.rs:16-159``): owns the decode
engine, tokenizer and long-form state, and consumes PCM chunks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ...decode import DecodeEngine, LanguageState, LongFormDecoder
from ...tracing import instrument
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

    @instrument(
        fields={
            "input_data_len": lambda a: len(a["data"]),
            "buf_len": lambda a: a["self"].longform.buf.size,
            "final_chunk": lambda a: a["final_chunk"],
        }
    )  # reference #[instrument(fields(...))], model.rs:54
    def transcribe(self, data: np.ndarray, final_chunk: bool) -> str:
        return self.longform.transcribe(np.asarray(data, np.float32), final_chunk)

    @instrument
    def warmup(self, batch: int = 1, put=None) -> None:
        """Pre-compile the serving path — the fused whole-window program
        (mel + encoder + detection when multilingual + prefill + ladder) —
        so the first real audio chunk doesn't pay compilation latency.

        ``batch``: the window batch size to compile for.  Programs are
        shape-specialized per batch, so batched serving must warm each
        power-of-two bucket it can dispatch — use
        ``BatchedTranscriber.warmup()``, which calls this per bucket.
        ``put``: optional placement hook applied to the warmup audio
        (e.g. a dp-sharded ``jax.device_put``); programs also specialize
        on input SHARDING, so mesh serving must warm with the same
        placement its rounds will use.
        """
        import jax.numpy as jnp

        from ...frontend.mel import prepare_audio

        lf = self.longform
        audio = jnp.asarray(
            np.tile(
                prepare_audio(np.zeros(lf.window_samples, np.float32), lf.n_frames),
                (batch, 1),
            )
        )
        if put is not None:
            audio = put(audio)
        lang = lf.lang.token
        self.engine.transcribe_window(
            audio, [int(lang) if lang is not None else -1] * batch, seed=0
        )
        if lang is None and lf.language_tokens:
            # Detect-mode models run the detect variant on window 1 and the
            # known-language variant from window 2 on (once the language is
            # resolved); compile that second program now too, or it stalls
            # the live stream mid-utterance.
            self.engine.transcribe_window(
                audio, [int(lf.language_tokens[0])] * batch, seed=0
            )
        if hasattr(self.engine, "warmup_fallback"):
            # Speculative engines have a second program (the t>0 fallback
            # rungs) that silence can never reach: compile it here too —
            # with the same placement, or mesh serving still compiles it
            # mid-stream on the first gate-failing window.
            self.engine.warmup_fallback(batch, put=put)
