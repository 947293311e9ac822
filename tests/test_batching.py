"""Multi-stream continuous batching scheduler tests (tiny model, hermetic)."""

import time

import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.decode import DecodeEngine, LanguageState, LongFormDecoder
from norma_tpu.input import Settings
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel
from norma_tpu.runtime.batching import BatchedTranscriber, TooManyStreams


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    return WhisperModel(
        engine,
        ToyTokenizer(),
        LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )


def _source(seed, seconds=1.2, freq=330.0):
    return SyntheticSource(
        sample_rate=16_000,
        channels=1,
        dtype=np.float32,
        freq=freq,
        noise=0.02,
        duration=seconds,
        realtime=False,
        seed=seed,
    )


def test_batch_size_padding():
    bs = BatchedTranscriber._batch_size
    assert [bs(n, 8) for n in (1, 2, 3, 4, 5, 8)] == [1, 2, 4, 4, 8, 8]
    assert bs(7, 4) == 4


def test_three_concurrent_streams(model):
    bt = BatchedTranscriber(model, max_streams=4)
    handles = []
    for i in range(3):
        h = bt.blocking_start(Settings(source=_source(i, freq=220.0 + 110 * i)))
        handles.append(h)
    time.sleep(0.5)
    for h in handles:
        h.stop()

    texts = []
    for h in handles:
        texts.append("".join(list(h.receiver)))
    bt.close()

    for t in texts:
        assert isinstance(t, str)
    # Voiced audio through a random model: at least one stream emits text.
    assert any(texts), texts


def test_stream_limit(model):
    bt = BatchedTranscriber(model, max_streams=2)
    h1 = bt.blocking_start(Settings(source=_source(1)))
    h2 = bt.blocking_start(Settings(source=_source(2)))
    with pytest.raises(TooManyStreams):
        bt.blocking_start(Settings(source=_source(3)))
    h1.stop()
    h2.stop()
    list(h1.receiver)
    list(h2.receiver)
    # Slots freed after streams finish -> a new start succeeds.
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            h3 = bt.blocking_start(Settings(source=_source(4)))
            break
        except TooManyStreams:
            time.sleep(0.05)
    else:
        pytest.fail("slot never freed")
    h3.stop()
    list(h3.receiver)
    bt.close()


def test_batched_matches_single_stream(model):
    """Same audio through the batched scheduler == single-stream decoder."""
    seconds = 1.0
    t = np.arange(int(16_000 * seconds)) / 16_000

    # Batched: one stream fed a deterministic tone (the packer's final flush
    # drops one trailing sample, so the oracle gets tone[:-1]).
    bt = BatchedTranscriber(model, max_streams=4)
    src = SyntheticSource(
        sample_rate=16_000, channels=1, dtype=np.float32,
        freq=440.0, noise=0.0, duration=seconds, realtime=False,
    )
    # Regenerate the oracle for the no-noise tone:
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    lf2 = LongFormDecoder(
        model.engine,
        model.tokenizer,
        LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )
    expected_tone = lf2.transcribe(tone[:-1], final_chunk=True)

    h = bt.blocking_start(Settings(source=src))
    time.sleep(0.3)
    h.stop()
    got = "".join(list(h.receiver))
    bt.close()

    assert got == expected_tone
