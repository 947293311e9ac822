"""WhisperModel.warmup() compiles the serving path without side effects."""

import numpy as np

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.decode import DecodeEngine, LanguageState
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel


def _model(lang_state):
    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    return WhisperModel(
        engine, ToyTokenizer(), lang_state, language_tokens=TEST_LANG_IDS
    )


def test_warmup_monolingual():
    m = _model(LanguageState(const=TEST_LANG_IDS[0]))
    m.warmup()
    assert m.longform.buf.size == 0  # no state leaked
    out = m.transcribe(np.zeros(5000, np.float32), final_chunk=True)
    assert isinstance(out, str)


def test_warmup_detect_mode():
    m = _model(LanguageState())
    m.warmup()
    # warmup must not pin a detected language
    assert m.longform.lang.detected is None
    out = m.transcribe(
        (0.1 * np.random.default_rng(0).standard_normal(5000)).astype(np.float32),
        final_chunk=True,
    )
    assert isinstance(out, str)


def test_warmup_detect_mode_compiles_both_variants():
    """Detect-mode serving uses BOTH window programs: detect on window 1,
    known-language from window 2 on.  Warmup must invoke both, or the
    second compiles mid-stream (review finding r2)."""
    m = _model(LanguageState())
    calls = []
    orig = m.engine.transcribe_window

    def spy(audio, langs, seed):
        calls.append(list(np.asarray(langs, np.int64).reshape(-1)))
        return orig(audio, langs, seed=seed)

    m.engine.transcribe_window = spy
    m.warmup()
    assert len(calls) == 2, calls
    assert calls[0][0] == -1  # detect variant
    assert calls[1][0] in TEST_LANG_IDS  # known-language variant
