"""Multi-stream continuous batching scheduler.

The reference serves strictly ONE stream per Transcriber (a second start is
rejected, lib.rs:640).  This is the capability the TPU build adds (SURVEY.md
§2c): N concurrent audio streams share one model on one chip; their ready
windows are padded into a fixed batch and every engine call — log-mel,
encoder, prefill, the on-device token loop — runs ONCE for the whole batch.
The batch dimension is padded to ``max_streams`` so exactly one program is
compiled per model (no recompilation as streams come and go).

Per-stream state (long-form buffers, drain accounting, language detection,
temperature fallback) stays isolated: the LongFormDecoder state machine is
driven window-by-window by the scheduler instead of its own loop.  The t=0
rung runs batched (the common case); streams whose result fails the
logprob gate fall back to the per-stream temperature ladder re-using their
already-encoded features.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ..constants import LOGPROB_THRESHOLD, NO_SPEECH_THRESHOLD, TEMPERATURES
from ..decode.engine import DecodingResult
from ..decode.longform import LanguageState, LongFormDecoder
from ..errors import NormaError, StartError
from ..frontend.mel import log_mel_spectrogram, prepare_audio
from ..input import Settings
from ..models.whisper.model import WhisperModel
from .channels import ReceiverClosed, RecycledRing, StringChannel, StringReceiver

logger = logging.getLogger(__name__)


class TooManyStreams(StartError):
    def __init__(self, limit: int) -> None:
        super().__init__(f"all {limit} stream slots are busy")


class BatchedStreamHandle:
    def __init__(self, owner: "BatchedTranscriber", sid: int, receiver: StringReceiver):
        self._owner = owner
        self._sid = sid
        self.receiver = receiver

    def stop(self) -> None:
        self._owner._stop_stream(self._sid)


class _Stream:
    def __init__(self, sid, pipeline, ring, state: LongFormDecoder, schan):
        self.sid = sid
        self.pipeline = pipeline
        self.ring = ring
        self.state = state
        self.schan = schan
        self.final = False  # final chunk seen
        self.want_decode = False
        self.source_closed = False
        self.dead = False
        self.seed = sid * 100_003


class BatchedTranscriber:
    """Serve up to ``max_streams`` concurrent streams with one model."""

    def __init__(self, model: WhisperModel, max_streams: int = 8) -> None:
        if not isinstance(model, WhisperModel):
            raise NormaError("BatchedTranscriber requires a WhisperModel")
        self.model = model
        self.engine = model.engine
        self.tokenizer = model.tokenizer
        self.max_streams = max_streams
        self._base_lang = model.longform.lang
        self._language_tokens = model.longform.language_tokens
        self._streams: Dict[int, _Stream] = {}
        self._lock = threading.Lock()
        self._next_sid = 0
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="batch-scheduler", daemon=True
        )
        self._thread.start()

    @classmethod
    def from_definition(cls, definition, max_streams: int = 8) -> "BatchedTranscriber":
        return cls(definition.blocking_try_to_model(), max_streams)

    # ------------------------------------------------------------------

    def blocking_start(self, settings: Settings) -> BatchedStreamHandle:
        if settings.source is None:
            raise NormaError(
                "BatchedTranscriber requires an injected AudioSource per "
                "stream (microphone multiplexing is host-specific)"
            )
        with self._lock:
            if len(self._streams) >= self.max_streams:
                raise TooManyStreams(self.max_streams)
            sid = self._next_sid
            self._next_sid += 1

            from ..audio.pipeline import StreamPipeline

            chunk_len = max(
                self.model.SAMPLE_RATE, self.model.longform.window_samples // 25
            )
            ring = RecycledRing(8, chunk_len, self.model.dtype)
            pipeline = StreamPipeline(
                settings.source, self.model.SAMPLE_RATE, self.model.dtype, ring
            )
            lang = LanguageState(const=self._base_lang.const)
            state = LongFormDecoder(
                self.engine,
                self.tokenizer,
                lang,
                language_tokens=self._language_tokens,
                seed=sid * 7919,
                timestamps=self.model.longform.timestamps,
            )
            schan = StringChannel(8)
            stream = _Stream(sid, pipeline, ring, state, schan)
            self._streams[sid] = stream
            pipeline.start()
            return BatchedStreamHandle(self, sid, schan.receiver())

    def _stop_stream(self, sid: int) -> None:
        with self._lock:
            s = self._streams.get(sid)
        if s is not None:
            s.pipeline.stop()  # flushes final chunk, closes ring

    def close(self) -> None:
        with self._lock:
            streams = list(self._streams.values())
        for s in streams:
            s.pipeline.stop()
        self._closed.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _drain_rings(self) -> bool:
        got = False
        with self._lock:
            streams = list(self._streams.values())
        for s in streams:
            while True:
                status, chunk = s.ring.poll()
                if status == "chunk":
                    s.state.feed(chunk.data)
                    if chunk.is_final:
                        s.final = True
                    s.ring.release(chunk)
                    s.want_decode = True
                    got = True
                elif status == "closed":
                    s.source_closed = True
                    break
                else:
                    break
        return got

    def _ready(self) -> List[_Stream]:
        with self._lock:
            streams = list(self._streams.values())
        return [
            s
            for s in streams
            if not s.dead and s.want_decode and s.state.next_window() is not None
        ]

    @staticmethod
    def _batch_size(n: int, cap: int) -> int:
        """Pad to the next power of two (<= cap): low-occupancy rounds skip
        the full-width batch while keeping compiled variants to log2(cap)."""
        b = 1
        while b < n:
            b *= 2
        return min(b, cap)

    def _decode_round(self, ready: List[_Stream]) -> None:
        n = len(ready)
        B = self._batch_size(n, self.max_streams)
        lf0 = ready[0].state
        n_frames = lf0.n_frames

        windows = np.zeros((B, (n_frames + 3) * 160 + 400), np.float32)
        for i, s in enumerate(ready):
            w = prepare_audio(s.state.next_window(), n_frames=n_frames)
            windows[i, : len(w)] = w
        if n < B:
            windows[n:] = windows[0]  # pad rows; results discarded

        audio_j = jnp.asarray(windows[:, : (n_frames - 1) * 160 + 400])
        need_detect = [
            i for i, s in enumerate(ready) if s.state.lang.needs_detection
        ]
        feats = None
        if need_detect:
            mel = log_mel_spectrogram(
                audio_j,
                n_mels=self.engine.cfg.num_mel_bins,
                n_frames=n_frames,
                center=getattr(self.engine, "mel_center", False),
            )
            feats = self.engine.encode(mel)
            probs = self.engine.detect_language(feats)
            for i in need_detect:
                tok = self._language_tokens[int(np.argmax(probs[i]))]
                ready[i].state.lang.set_detected(tok)

        langs = np.zeros(B, np.int32)
        for i, s in enumerate(ready):
            tok = s.state.lang.token
            langs[i] = tok if tok is not None else self.engine.st.sot
        if n < B:
            langs[n:] = langs[0]

        # Batched prefill + t=0 decode (the common accepted rung).  With
        # no detection pending, mel+encode+prefill fuse into one dispatch.
        if feats is not None:
            state = self.engine.prefill(feats, langs)
        else:
            state = self.engine.prefill_window(audio_j, langs)
        drs = self.engine.run_loop(state, 0.0, seed=ready[0].seed)

        for i, s in enumerate(ready):
            dr: Optional[DecodingResult] = drs[i]
            s.seed += len(TEMPERATURES)
            nsp = dr.no_speech_prob
            if nsp > NO_SPEECH_THRESHOLD:
                # probe fired: prefix-only semantics (engine returns the
                # full decode, but gates make this equivalent; mirror the
                # single-stream early-exit)
                dr = DecodingResult(
                    tokens=np.asarray(state["prefix"])[i].tolist(),
                    avg_logprob=0.0,
                    no_speech_prob=nsp,
                )
            else:
                accepted = not (
                    dr.compression_ratio > 2.4
                    or dr.avg_logprob < LOGPROB_THRESHOLD
                ) or nsp > NO_SPEECH_THRESHOLD
                if not accepted:
                    dr = self._fallback_ladder(feats, audio_j, i, langs[i], s)
            cont = s.state.apply_result(dr, s.final)
            s.want_decode = bool(cont)
            self._emit(s)

    def _fallback_ladder(self, feats, audio_j, idx, lang, s: _Stream):
        """Per-stream ladder t>0 (rare path: re-prefills one stream)."""
        if feats is not None:
            st1 = self.engine.prefill(feats[idx : idx + 1], int(lang))
        else:
            st1 = self.engine.prefill_window(audio_j[idx : idx + 1], int(lang))
        for k, t in enumerate(TEMPERATURES[1:], start=1):
            dr = self.engine.run_loop(st1, t, seed=s.seed + k)[0]
            needs_fallback = (
                dr.compression_ratio > 2.4 or dr.avg_logprob < LOGPROB_THRESHOLD
            )
            if not needs_fallback or dr.no_speech_prob > NO_SPEECH_THRESHOLD:
                return dr
        return None

    def _emit(self, s: _Stream) -> None:
        text = s.state.finish_call(final_chunk=False)
        if text:
            try:
                s.schan.try_send(text)
            except ReceiverClosed:
                s.dead = True
                s.pipeline.stop()

    def _finish_stream(self, s: _Stream) -> None:
        s.state.finish_call(final_chunk=True)  # clears detected language
        s.schan.close_sender()
        with self._lock:
            self._streams.pop(s.sid, None)

    def _run(self) -> None:
        while True:
            if self._closed.is_set():
                with self._lock:
                    remaining = list(self._streams.values())
                if not remaining or all(
                    s.source_closed and s.state.next_window() is None
                    for s in remaining
                ):
                    for s in remaining:
                        self._finish_stream(s)
                    return
            got = self._drain_rings()
            ready = self._ready()
            if ready:
                try:
                    self._decode_round(ready)
                except Exception:
                    logger.exception("batched decode round failed")
                    with self._lock:
                        streams = list(self._streams.values())
                    for s in streams:
                        s.schan.close_sender()
                    raise
            # Retire streams whose source ended and buffer drained.
            with self._lock:
                done = [
                    s
                    for s in self._streams.values()
                    if s.dead
                    or (
                        s.source_closed
                        and s.final
                        and (
                            s.state.next_window() is None or not s.want_decode
                        )
                    )
                ]
            for s in done:
                # With final=True the hold paths never trigger, so a
                # remaining buffer means want_decode stayed True and the
                # next round drains it; only finish when empty.
                if s.dead or s.state.next_window() is None:
                    self._finish_stream(s)
            if not got and not ready:
                time.sleep(0.005)
