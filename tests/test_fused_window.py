"""Fused single-dispatch window decode vs the compositional path.

The fused program (engine.transcribe_window) must reproduce the step-by-step
path (mel/encode/prefill/run_loop + host ladder) exactly for every
deterministic outcome.  Random tiny models essentially never pass the
reference's avg_logprob >= -1 gate (the grammar forces tokens the model puts
no mass on), so the gate thresholds are monkeypatched per engine instance to
carve out each deterministic regime:

  - LOGPROB_THRESHOLD=-100: every window accepts at rung 0 (greedy) -> the
    whole fused pipeline (mel, encoder, prefill, token loop, ladder
    bookkeeping) must match the compositional path token-for-token.
  - NO_SPEECH_THRESHOLD=0.0: the probe always fires -> prefix-only early
    exit parity (reference model.rs:308-315).
  - default thresholds: all rungs fail -> None parity.

(t>0 rungs draw from different PRNG streams — fold_in(rung) vs seed+rung —
so only their LAW is shared; that law is pinned by the chi-square test.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

import norma_tpu.decode.engine as engine_mod
from helpers import TEST_LANG_IDS, TEST_ST, tiny_config
from norma_tpu.decode.engine import DecodeEngine
from norma_tpu.frontend.mel import log_mel_spectrogram, prepare_audio
from norma_tpu.model import init_params

CFG = tiny_config()
PARAMS = init_params(CFG, seed=0)


def make_engine():
    return DecodeEngine(PARAMS, CFG, TEST_ST, language_token_ids=TEST_LANG_IDS)


def window(seed, seconds=0.5):
    n_frames = 2 * CFG.max_source_positions
    rng = np.random.default_rng(seed)
    raw = (0.1 * rng.standard_normal(int(seconds * 16000))).astype(np.float32)
    return jnp.asarray(prepare_audio(raw, n_frames=n_frames))[None]


def unfused(engine, audio, lang, seed=0):
    n_frames = 2 * engine.cfg.max_source_positions
    mel = log_mel_spectrogram(
        audio, n_mels=engine.cfg.num_mel_bins, n_frames=n_frames
    )
    feats = engine.encode(mel)
    return engine.decode_with_fallback(feats, lang, seed=seed)


def test_fused_rung0_exact_parity(monkeypatch):
    """Accept-everything gate: deterministic end-to-end equality."""
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    engine = make_engine()
    lang = TEST_LANG_IDS[0]
    for seed in range(6):
        audio = window(seed)
        want = unfused(engine, audio, lang)
        got = engine.transcribe_window(audio, [lang], seed=0)[0][0]
        assert want is not None and got is not None
        assert got.tokens == want.tokens, f"seed {seed}"
        assert got.avg_logprob == pytest.approx(
            want.avg_logprob, abs=1e-4, nan_ok=True
        )
        assert got.no_speech_prob == pytest.approx(want.no_speech_prob, abs=1e-5)


def test_fused_no_speech_early_exit_parity(monkeypatch):
    """Probe-always-fires gate: prefix-only results on both paths."""
    monkeypatch.setattr(engine_mod, "NO_SPEECH_THRESHOLD", 0.0)
    engine = make_engine()
    lang = TEST_LANG_IDS[2]
    for seed in (0, 1):
        audio = window(seed)
        want = unfused(engine, audio, lang)
        got = engine.transcribe_window(audio, [lang], seed=0)[0][0]
        assert want.tokens == got.tokens == [TEST_ST.sot, lang, TEST_ST.task]
        assert want.avg_logprob == got.avg_logprob == 0.0
        assert got.no_speech_prob == pytest.approx(want.no_speech_prob, abs=1e-5)


def test_fused_all_rungs_fail_parity(monkeypatch):
    """Default gates, greedy-only ladder: rung-0 rejection (avg < -1) must
    yield None on both paths; rung-0 NaN acceptance (grammar deadlock, a
    faithful reference quirk: NaN < thresh is false) must match exactly.
    (With t>0 rungs the two paths draw different PRNG streams, so the
    accepting rung itself is stochastic — hence the greedy-only ladder.)"""
    monkeypatch.setattr(engine_mod, "TEMPERATURES", (0.0,))
    # mtp=12 caps the decode before the tiny timestamp space deadlocks, so
    # avg_logprob stays finite (< -1) and the gate rejects deterministically.
    cfg = tiny_config(max_target_positions=12)
    engine = DecodeEngine(
        init_params(cfg, seed=0), cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    lang = TEST_LANG_IDS[0]
    nones = 0
    for seed in range(4):
        n_frames = 2 * cfg.max_source_positions
        rng = np.random.default_rng(seed)
        raw = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        audio = jnp.asarray(prepare_audio(raw, n_frames=n_frames))[None]
        want = unfused(engine, audio, lang)
        got = engine.transcribe_window(audio, [lang], seed=0)[0][0]
        if want is None:
            assert got is None
            nones += 1
        else:
            assert got is not None and got.tokens == want.tokens
    assert nones >= 1, "no all-rungs-failed case exercised"


def test_fused_detection_matches_detect_language(monkeypatch):
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    engine = make_engine()
    for seed in (0, 3):
        audio = window(seed)
        n_frames = 2 * engine.cfg.max_source_positions
        mel = log_mel_spectrogram(
            audio, n_mels=engine.cfg.num_mel_bins, n_frames=n_frames
        )
        feats = engine.encode(mel)
        probs = engine.detect_language(feats)
        want_tok = TEST_LANG_IDS[int(np.argmax(probs[0]))]

        res, info = engine.transcribe_window(audio, [-1], seed=0)
        assert int(info["langs"][0]) == want_tok
        np.testing.assert_allclose(info["lang_probs"][0], probs[0], atol=1e-5)

        # And the decode must equal a fused decode with the token given.
        res2, _ = engine.transcribe_window(audio, [want_tok], seed=0)
        assert res[0].tokens == res2[0].tokens


def test_fused_batched_matches_single(monkeypatch):
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    engine = make_engine()
    lang = TEST_LANG_IDS[1]
    audios = [window(s) for s in (10, 11, 12)]
    batch = jnp.concatenate(audios, axis=0)
    batched, _ = engine.transcribe_window(batch, lang, seed=0)
    for i, a in enumerate(audios):
        single = engine.transcribe_window(a, [lang], seed=0)[0][0]
        assert batched[i].tokens == single.tokens
        assert batched[i].avg_logprob == pytest.approx(
            single.avg_logprob, abs=1e-4, nan_ok=True
        )


def test_fused_mixed_langs_and_detection(monkeypatch):
    """Heterogeneous batch: one detecting stream, two fixed languages."""
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    engine = make_engine()
    audios = [window(s) for s in (20, 21, 22)]
    batch = jnp.concatenate(audios, axis=0)
    langs = [-1, TEST_LANG_IDS[0], TEST_LANG_IDS[2]]
    res, info = engine.transcribe_window(batch, langs, seed=0)
    assert len(res) == 3
    assert int(info["langs"][1]) == TEST_LANG_IDS[0]
    assert int(info["langs"][2]) == TEST_LANG_IDS[2]
    assert int(info["langs"][0]) in TEST_LANG_IDS
    # Each stream's prefix carries its own language token.
    for i in range(3):
        assert res[i].tokens[1] == int(info["langs"][i])


def test_async_dispatch_fetch_matches_sync(monkeypatch):
    """transcribe_window_async + transcribe_window_fetch (the round-
    pipelined scheduler's split) must reproduce the synchronous call
    exactly, including with two rounds in flight at once."""
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    engine = make_engine()
    a1, a2 = window(1), window(2)
    langs = [TEST_LANG_IDS[0]]

    want1, info1 = engine.transcribe_window(a1, langs, seed=0)
    want2, info2 = engine.transcribe_window(a2, langs, seed=9)

    # Two dispatches queued before either fetch (the pipelined order).
    p1 = engine.transcribe_window_async(a1, langs, seed=0)
    p2 = engine.transcribe_window_async(a2, langs, seed=9)
    got2, ginfo2 = engine.transcribe_window_fetch(p2)
    got1, ginfo1 = engine.transcribe_window_fetch(p1)

    for want, got in ((want1, got1), (want2, got2)):
        assert [None if r is None else r.tokens for r in want] == [
            None if r is None else r.tokens for r in got
        ]
    np.testing.assert_array_equal(info1["langs"], ginfo1["langs"])
    np.testing.assert_array_equal(info2["langs"], ginfo2["langs"])
