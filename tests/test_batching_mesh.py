"""BatchedTranscriber on a device mesh + latency-fairness of the fused round.

VERDICT r1 item 4: (a) a batched run on the virtual mesh with dp-sharded
live batches must transcribe identically to the unsharded scheduler;
(b) one gated stream (temperature-fallback ladder) must not serialize the
round — the scheduler makes exactly ONE fused engine call per round, never
per-stream B=1 ladder calls.
"""

import time

import jax
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.decode import DecodeEngine, LanguageState
from norma_tpu.input import Settings
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel
from norma_tpu.parallel import make_mesh, shard_params
from norma_tpu.runtime.batching import BatchedTranscriber


def _source(seed, seconds=1.0, freq=330.0):
    return SyntheticSource(
        sample_rate=16_000, channels=1, dtype=np.float32,
        freq=freq, noise=0.02, duration=seconds, realtime=False, seed=seed,
    )


def _run_streams(bt, n=3):
    handles = [
        bt.blocking_start(Settings(source=_source(i, freq=220.0 + 110 * i)))
        for i in range(n)
    ]
    time.sleep(0.4)
    for h in handles:
        h.stop()
    texts = ["".join(list(h.receiver)) for h in handles]
    bt.close()
    return texts


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ virtual devices")
def test_batched_on_mesh_matches_unsharded(monkeypatch):
    # Greedy-only ladder: sampled (t>0) rungs draw seeds tied to the
    # scheduler's round composition, which is thread-timing dependent; the
    # greedy rung is seed-independent so emissions compare deterministically.
    import norma_tpu.decode.engine as engine_mod

    monkeypatch.setattr(engine_mod, "TEMPERATURES", (0.0,))
    cfg = tiny_config(
        d_model=64, encoder_attention_heads=4, decoder_attention_heads=4
    )
    params = init_params(cfg, seed=3)

    def build(params_, mesh=None):
        engine = DecodeEngine(
            params_, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
        )
        model = WhisperModel(
            engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
            language_tokens=TEST_LANG_IDS,
        )
        return BatchedTranscriber(model, max_streams=4, mesh=mesh)

    want = _run_streams(build(params))

    mesh = make_mesh(dp=2, tp=2)
    got = _run_streams(build(shard_params(params, mesh), mesh=mesh))

    assert got == want


def test_gated_stream_does_not_serialize_round():
    """With random weights EVERY window fails the logprob gate, so every
    stream runs the full fallback ladder every round.  The old scheduler
    issued per-stream B=1 ladder calls on the shared thread; the fused
    scheduler must make exactly one batched engine call per round."""
    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(
        engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )

    calls = []
    orig = engine.transcribe_window_async

    def spy(audio, langs, seed, n_active=None):
        calls.append(int(audio.shape[0]))
        return orig(audio, langs, seed, n_active=n_active)

    engine.transcribe_window_async = spy
    bt = BatchedTranscriber(model, max_streams=4)
    texts = _run_streams(bt, n=3)
    assert len(calls) >= 1
    # Rounds with 3 ready streams batch to B=4; drain rounds may be
    # narrower, but NO round degrades to a per-stream ladder sequence:
    # every engine call in a 3-stream run covers all ready streams at once.
    assert all(b in (1, 2, 4) for b in calls)
    # The ladder for a gated (all-rungs-failing) stream happened in-graph:
    # there are no bursts of repeated B=1 calls (old per-stream fallback
    # made len(TEMPERATURES)-1 = 5 extra host calls per gated stream).
    for i in range(len(calls) - 2):
        assert not (calls[i] == calls[i + 1] == calls[i + 2] == 1), calls


@pytest.mark.skipif(len(jax.devices()) < 3, reason="needs 3+ virtual devices")
def test_non_power_of_two_dp_rounds_batch(monkeypatch):
    """dp=3: the round batch (power-of-two sized) must round up to a
    multiple of dp or the sharded device_put is unshardable and the
    scheduler thread dies (review finding r2)."""
    import norma_tpu.decode.engine as engine_mod

    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    cfg = tiny_config()
    mesh = make_mesh(dp=3, tp=1)
    params = shard_params(init_params(cfg, seed=3), mesh)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(
        engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )
    bt = BatchedTranscriber(model, max_streams=6, mesh=mesh)
    seen_batches = []
    orig = engine.transcribe_window_async

    def spy(audio, langs, seed, n_active=None):
        seen_batches.append(int(audio.shape[0]))
        return orig(audio, langs, seed=seed, n_active=n_active)

    engine.transcribe_window_async = spy
    # 2 ready streams -> power-of-two B=2, not divisible by dp=3: must be
    # rounded to 3 and decoded; the streams must then terminate (the bug
    # killed the scheduler thread on the unshardable device_put, leaving
    # receivers blocked forever).  Transcript content is model-dependent
    # (this tone can legitimately transcribe to empty).
    _run_streams(bt, n=2)
    assert seen_batches, "no decode round ran"
    assert all(b % 3 == 0 for b in seen_batches), seen_batches
    assert not bt._thread.is_alive()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ virtual devices")
def test_mesh_warmup_compiles_sharded_variants():
    """BatchedTranscriber.warmup() on a mesh warms with the SAME dp-sharded
    placement its rounds use (programs specialize on input sharding), then
    live rounds run without error."""
    cfg = tiny_config(
        d_model=64, encoder_attention_heads=4, decoder_attention_heads=4
    )
    mesh = make_mesh(dp=2, tp=2)
    params = shard_params(init_params(cfg, seed=3), mesh)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(
        engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )
    bt = BatchedTranscriber(model, max_streams=4, mesh=mesh)
    try:
        bt.warmup()  # buckets 2, 4 (dp=2 floor), dp-sharded inputs
        h = bt.blocking_start(Settings(source=_source(0)))
        assert list(h.receiver) is not None
    finally:
        bt.close()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ virtual devices")
def test_spec_fallback_live_dispatch_hits_warmed_cache(monkeypatch):
    """The speculative t>0 fallback program warmed with the mesh placement
    must be the SAME compiled entry the live gate-failure dispatch hits:
    warmup_fallback remembers its put hook and transcribe_window re-applies
    it to feats, so the jit cache (keyed on input sharding) cannot miss on
    GSPMD's unpinned choice for the window program's output placement."""
    import norma_tpu.decode.speculative as spec_mod
    from norma_tpu.decode import SpeculativeEngine
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.parallel.sharding import shard_batch

    # Force the logprob gate to fail for every live row so the live
    # fallback dispatch definitely runs.
    monkeypatch.setattr(spec_mod, "LOGPROB_THRESHOLD", float("inf"))

    cfg = tiny_config(
        d_model=64, encoder_attention_heads=4, decoder_attention_heads=4
    )
    # Distil-style draft: same dims, shallow decoder.
    dcfg = tiny_config(
        d_model=64, encoder_attention_heads=4, decoder_attention_heads=4,
        decoder_layers=1, encoder_layers=1,
    )
    mesh = make_mesh(dp=2, tp=2)
    params = shard_params(init_params(cfg, seed=3), mesh)
    dparams = shard_params(init_params(dcfg, seed=103), mesh)
    engine = SpeculativeEngine(
        params, cfg, dparams, dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    B = 2
    put = lambda a: shard_batch(a, mesh)
    engine.warmup_fallback(batch=B, put=put)
    assert engine._fallback_rungs._cache_size() == 1

    rng = np.random.default_rng(0)
    win = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=2 * cfg.max_source_positions,
    )
    audio = shard_batch(np.stack([win] * B), mesh)
    results, _ = engine.transcribe_window(audio, [TEST_LANG_IDS[0]] * B, seed=7)
    assert any(r is not None for r in results)
    # One compiled entry total: the live dispatch hit the warmed program
    # instead of compiling a second specialization mid-utterance.
    assert engine._fallback_rungs._cache_size() == 1
