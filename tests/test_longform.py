"""Long-form drain-accounting unit tests with a scripted fake engine.

Pins the reference's window/drain semantics (model.rs:100-151) case by
case: drain-all+emit, hold-for-more-data, partial drain by timestamp with
stop vs next-window, quality gates, and final-chunk force-drain.
"""

import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.decode.engine import DecodingResult
from norma_tpu.decode.longform import LanguageState, LongFormDecoder

SOT, LANG, TASK = TEST_ST.sot, TEST_LANG_IDS[0], TEST_ST.task
EOT, TS0 = TEST_ST.eot, TEST_ST.zero_sec  # ts tick k == TS0 + k


def dr(tokens, logprob=-0.1, nsp=0.0):
    return DecodingResult(
        tokens=[SOT, LANG, TASK] + tokens, avg_logprob=logprob, no_speech_prob=nsp
    )


class FakeEngine:
    """Replays scripted DecodingResults; records requested window sizes."""

    def __init__(self, results):
        self.cfg = tiny_config()  # window = 2*32*160 = 10240 samples
        self.st = TEST_ST
        self.results = list(results)
        self.window_sizes = []

    def decode_with_fallback_windowed(self, audio, lang, seed):
        self.window_sizes.append(int(np.asarray(audio).shape[1]))
        return self.results.pop(0)

    def transcribe_window(self, audio, langs, seed):
        """Fused-path surface: replay one scripted result per window."""
        self.window_sizes.append(int(np.asarray(audio).shape[1]))
        return [self.results.pop(0)], {
            "langs": np.asarray(langs),
            "lang_probs": None,
        }


def make(results):
    eng = FakeEngine(results)
    lf = LongFormDecoder(eng, ToyTokenizer(), LanguageState(const=LANG))
    assert lf.window_samples == 10240
    return eng, lf


def test_full_window_drains_all_and_emits():
    eng, lf = make([dr([TS0, 5, EOT])])  # s_ts=0, eot-terminated
    out = lf.transcribe(np.arange(10240, dtype=np.float32), final_chunk=False)
    assert out == " w5"
    assert lf.buf.size == 0


def test_short_window_holds():
    eng, lf = make([dr([TS0, 5, EOT])])
    out = lf.transcribe(np.zeros(5000, np.float32), final_chunk=False)
    assert out == ""  # text withheld, re-decoded with more context later
    assert lf.buf.size == 5000


def test_partial_drain_by_timestamp_then_stop():
    # segments: [ts0, 5, ts10], [ts10, 6, eot]; drain = 10 ticks = 3200.
    eng, lf = make([dr([TS0, 5, TS0 + 10, TS0 + 10, 6, EOT])])
    data = np.arange(8000, dtype=np.float32)
    out = lf.transcribe(data, final_chunk=False)
    assert out == " w5"  # completed segment emitted; eot segment withheld
    assert lf.buf.size == 8000 - 3200
    np.testing.assert_array_equal(lf.buf, data[3200:])


def test_partial_drain_then_next_window():
    # More audio than one window: after draining to the last segment start
    # the decoder takes a NEW slice immediately (model.rs:129-136).
    first = dr([TS0, 5, TS0 + 10, TS0 + 10, 6, EOT])
    second = dr([TS0, 7, EOT])  # decoded from the advanced buffer; held
    eng, lf = make([first, second])
    out = lf.transcribe(np.zeros(12240, np.float32), final_chunk=False)
    assert out == " w5"
    assert len(eng.window_sizes) == 2
    # second slice = min(12240-3200, 10240) = 9040 -> held (short, s_ts=0)
    assert lf.buf.size == 12240 - 3200


def test_quality_gate_discards_slice():
    eng, lf = make([dr([TS0, 5, EOT], logprob=-5.0, nsp=0.9)])
    out = lf.transcribe(np.zeros(4000, np.float32), final_chunk=False)
    assert out == ""
    assert lf.buf.size == 0  # gated slice dropped (model.rs:95-98)


def test_all_temperatures_failed_discards_slice():
    eng, lf = make([None])
    out = lf.transcribe(np.zeros(4000, np.float32), final_chunk=False)
    assert out == ""
    assert lf.buf.size == 0


def test_prefix_only_drains():
    """Deviation 1: no-speech probe early-exit must not wedge the buffer."""
    eng, lf = make(
        [DecodingResult(tokens=[SOT, LANG, TASK], avg_logprob=0.0, no_speech_prob=0.95)]
    )
    out = lf.transcribe(np.zeros(4000, np.float32), final_chunk=False)
    assert out == ""
    assert lf.buf.size == 0


def test_final_chunk_drains_and_emits_everything():
    eng, lf = make([dr([TS0, 5, TS0 + 10, TS0 + 10, 6, EOT])])
    out = lf.transcribe(np.zeros(5000, np.float32), final_chunk=True)
    assert out == " w5 w6"  # final: the eot segment's text is emitted too
    assert lf.buf.size == 0


def test_ts_only_segments_force_drain():
    """Deviation 3: all segments timestamp-terminated (the eot tail was
    dropped by the two-boundary rule) must not wedge the decoder."""
    toks = [TS0, 5, TS0 + 3, TS0 + 4, 6, TS0 + 8, 7, EOT]
    # segments: [ts0,5,ts3], [ts4,6,ts8] -- then [7, EOT] has one boundary
    # and is dropped; nothing would drain in the reference.
    eng, lf = make([dr(toks), dr(toks)])
    out = lf.transcribe(np.zeros(4000, np.float32), final_chunk=False)
    assert out == " w5 w6"  # completed segments emitted once
    assert lf.buf.size == 0  # forced drain instead of spinning
    assert len(eng.results) == 1  # only one decode consumed


def test_timestamped_emission_absolute_offsets():
    """timestamps=True prefixes segments with stream-absolute times that
    keep advancing as audio drains across windows."""
    # window 1 (8000 samples fed): segs [ts0,5,ts10](0.00-0.20s) then
    # [ts10,6,eot] -> drains 3200 (0.2s), holds.
    first = dr([TS0, 5, TS0 + 10, TS0 + 10, 6, EOT])
    # window 2 (final): [ts0,7,eot] at offset 0.2s, slice=4800 -> end 0.5s
    second = dr([TS0, 7, EOT])
    eng, lf = make([first, second])
    lf.timestamps = True
    out1 = lf.transcribe(np.zeros(8000, np.float32), final_chunk=False)
    assert out1 == "[0.00s -> 0.20s] w5"
    out2 = lf.transcribe(np.zeros(0, np.float32), final_chunk=True)
    assert out2 == "[0.20s -> 0.50s] w7"
    assert lf.time_offset_s == pytest.approx(0.5)


def test_feed_copies_ring_slot_views():
    """Regression: feed() must not alias the caller's (recycled) buffer."""
    eng, lf = make([dr([TS0, 5, EOT])])
    slot = np.arange(5000, dtype=np.float32)
    lf.feed(slot[:4000])  # a view, like Chunk.data
    slot[:] = -1.0  # producer recycles the slot
    assert lf.buf[0] == 0.0 and lf.buf[3999] == 3999.0


def test_detect_language_cleared_on_final_only():
    eng, lf = make([dr([TS0, 5, EOT]), dr([TS0, 6, EOT])])
    lf.lang = LanguageState()  # Detect mode
    lf.lang.set_detected(LANG)
    lf.transcribe(np.zeros(10240, np.float32), final_chunk=False)
    assert lf.lang.detected == LANG  # kept across non-final calls
    lf.transcribe(np.zeros(10240, np.float32), final_chunk=True)
    assert lf.lang.detected is None  # reset after final (model.rs:153-156)
