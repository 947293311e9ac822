"""Stream-churn soak for the batched scheduler.

Race-safety evidence beyond the single-wave tests: streams start and end
in overlapping waves, one receiver is abandoned mid-stream (the scheduler
must tear that stream down and keep serving the others), slots must be
reusable after retirement, and close() must join cleanly with no stuck
threads.  Runs hermetically on CPU with the tiny seeded model.
"""

import threading
import time

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, confident_params, texty_config
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.decode import DecodeEngine, LanguageState
from norma_tpu.input import Settings
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel
from norma_tpu.runtime.batching import BatchedTranscriber


def _source(i):
    return SyntheticSource(
        sample_rate=16000, channels=1, duration=0.6, freq=250.0 + 40 * i,
        realtime=False,
    )


def test_churn_waves_and_abandoned_receiver():
    cfg = texty_config()
    params = confident_params(cfg)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]))
    bt = BatchedTranscriber(model, max_streams=3)
    try:
        results = {}
        threads = []

        def drain(tag, handle):
            results[tag] = list(handle.receiver)

        total_started = 0
        for wave in range(3):
            handles = []
            for i in range(3):
                # The abandoned stream from the previous wave retires
                # asynchronously (the scheduler notices ReceiverClosed at a
                # round boundary) — bounded-wait admission absorbs that.
                h = bt.blocking_start(
                    Settings(source=_source(total_started)), timeout=60.0
                )
                handles.append(h)
                total_started += 1
            # Abandon one receiver immediately: the scheduler must drop the
            # stream (ReceiverClosed) without affecting its batch-mates.
            handles[0].receiver.close()
            for i, h in enumerate(handles[1:], start=1):
                t = threading.Thread(
                    target=drain, args=(f"w{wave}s{i}", h), daemon=True
                )
                t.start()
                threads.append(t)
            for t in threads:
                t.join(timeout=120)
            assert not any(t.is_alive() for t in threads), "drain thread stuck"
            threads.clear()

        # 9 streams on 3 slots: retirement must have freed slots each wave.
        assert total_started == 9
        # Every non-abandoned stream produced output and terminated.
        assert len(results) == 6
        for tag, segs in results.items():
            assert segs, f"stream {tag} produced no output"
            assert all(isinstance(s, str) for s in segs)
        # Under nominal load (receivers drained promptly) the lossy paths
        # must not fire: zero transcript drops, zero audio-chunk drops.
        m = bt.metrics()
        assert m["transcript_drops"] == 0, m
        assert m["audio_drops"] == 0, m
    finally:
        bt.close()
    assert not bt._thread.is_alive(), "scheduler thread did not exit"


def test_stop_mid_stream_releases_slot():
    cfg = texty_config()
    params = confident_params(cfg)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]))
    bt = BatchedTranscriber(model, max_streams=1)
    try:
        h1 = bt.blocking_start(
            Settings(source=SyntheticSource(sample_rate=16000, channels=1,
                                            duration=30.0, realtime=False))
        )
        time.sleep(0.2)
        h1.stop()  # flushes the final chunk; stream retires after drain
        out1 = list(h1.receiver)
        assert out1, "stopped stream must still flush its transcript"

        # The single slot must be free again.
        h2 = bt.blocking_start(Settings(source=_source(1)))
        out2 = list(h2.receiver)
        assert out2
    finally:
        bt.close()


def test_admission_timeout_semantics():
    """timeout=0 rejects a full scheduler immediately (reference shape,
    lib.rs:649-661); timeout>0 admits once an in-flight retirement frees
    the slot; waiters see close() promptly instead of timing out."""
    import pytest

    from norma_tpu.runtime.batching import TooManyStreams

    cfg = texty_config()
    params = confident_params(cfg)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    model = WhisperModel(engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]))
    bt = BatchedTranscriber(model, max_streams=1)
    try:
        h1 = bt.blocking_start(Settings(source=_source(0)))
        with pytest.raises(TooManyStreams):
            bt.blocking_start(Settings(source=_source(1)))  # timeout=0
        # h1's source is finite and non-realtime: it retires as soon as the
        # scheduler drains it, so a bounded wait must win the slot.
        drained = threading.Thread(
            target=lambda: list(h1.receiver), daemon=True
        )
        drained.start()
        h2 = bt.blocking_start(Settings(source=_source(1)), timeout=60.0)
        assert list(h2.receiver)
        drained.join(timeout=60)
    finally:
        bt.close()
    # A waiter behind a closed scheduler errors out promptly.
    t0 = time.monotonic()
    with pytest.raises(Exception, match="closed"):
        bt.blocking_start(Settings(source=_source(2)), timeout=60.0)
    assert time.monotonic() - t0 < 5.0


def test_soak_tool_self_test(monkeypatch, capsys):
    """tools/soak_serving.py --cpu is the hermetic self-test of the
    hardware soak; keep it green so run_hw_session.sh's soak step works."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "soak_serving",
        __file__.rsplit("/tests/", 1)[0] + "/tools/soak_serving.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        _sys, "argv",
        ["soak_serving.py", "--cpu", "--minutes", "0.05", "--streams", "2"],
    )
    mod.main()
    assert "SOAK PASS" in capsys.readouterr().out
