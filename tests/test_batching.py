"""Multi-stream continuous batching scheduler tests (tiny model, hermetic)."""

import time

import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, confident_params, texty_config, tiny_config
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.decode import DecodeEngine, LanguageState, LongFormDecoder
from norma_tpu.input import Settings
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel
from norma_tpu.runtime.batching import BatchedTranscriber, TooManyStreams


@pytest.fixture(scope="module")
def model():
    cfg = texty_config()
    params = confident_params(cfg)
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


def test_start_after_close_refused(model):
    """A stream started after close() would never be serviced (the
    scheduler thread is gone): it must be refused, not silently leak a
    capture pipeline with a forever-blocking receiver."""
    from norma_tpu.errors import NormaError

    bt = BatchedTranscriber(model, max_streams=2)
    bt.close()
    with pytest.raises(NormaError, match="closed"):
        bt.blocking_start(Settings(source=_source(0)))


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning"
)
def test_fatal_decode_error_tears_down(model, monkeypatch):
    """A fatal error in a decode round must stop capture pipelines, mark
    the transcriber closed, and unblock receivers — not leak capture
    threads that spam 'ring full' forever."""
    from norma_tpu.errors import NormaError

    bt = BatchedTranscriber(model, max_streams=2)
    monkeypatch.setattr(
        bt, "_dispatch_round",
        lambda ready: (_ for _ in ()).throw(RuntimeError("device lost")),
    )
    h = bt.blocking_start(Settings(source=_source(1, seconds=0.6)))
    # Receiver unblocks (sender closed by the teardown path).
    texts = list(h.receiver)
    assert texts == [] or all(isinstance(t, str) for t in texts)
    # Scheduler thread exited; transcriber is closed and refuses new work.
    bt._thread.join(timeout=10)
    assert not bt._thread.is_alive()
    assert bt._closed.is_set()
    with pytest.raises(NormaError, match="closed"):
        bt.blocking_start(Settings(source=_source(2)))
    # The stream's capture pipeline was stopped (source thread gone).
    with bt._lock:
        streams = list(bt._streams.values())
    for s in streams:
        assert s.pipeline._stopped


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


def test_admission_bounded_by_one_round(model):
    """A stream whose audio arrives while a round is IN FLIGHT is admitted
    in the immediately following round — worst-case admission latency is
    one program duration (VERDICT r2: bounded-latency admission)."""
    import threading

    from norma_tpu.decode import DecodeEngine
    from norma_tpu.model import init_params

    cfg = tiny_config()
    engine = DecodeEngine(
        init_params(cfg, seed=3), cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    from norma_tpu.models.whisper.model import WhisperModel

    m = WhisperModel(
        engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )
    bt = BatchedTranscriber(m, max_streams=4)

    permits = threading.Semaphore(0)
    gate_on = threading.Event()
    gate_on.set()
    rounds = []
    orig_round = bt._dispatch_round
    # Gate the DISPATCH (the round-pipelined scheduler never calls the
    # synchronous transcribe_window): a blocked dispatch emulates a long
    # in-flight round.
    orig_window = engine.transcribe_window_async

    def gated_window(audio, langs, seed, n_active=None):
        if gate_on.is_set():
            assert permits.acquire(timeout=60), "test gate timed out"
        return orig_window(audio, langs, seed, n_active=n_active)

    def spy_round(ready):
        rounds.append(sorted(s.sid for s in ready))
        return orig_round(ready)

    engine.transcribe_window_async = gated_window
    bt._dispatch_round = spy_round
    try:
        # Stream A: enough audio for several windows => several rounds.
        ha = bt.blocking_start(
            Settings(source=SyntheticSource(
                sample_rate=16_000, channels=1, duration=3.0, freq=330.0,
                realtime=False,
            ))
        )
        ta = threading.Thread(target=lambda: list(ha.receiver), daemon=True)
        ta.start()
        # Wait for round 1 to be in flight (blocked on the gate).
        deadline = time.monotonic() + 30
        while not rounds and time.monotonic() < deadline:
            time.sleep(0.01)
        assert rounds, "no round started"

        # Mid-round: stream B arrives and its audio is fully buffered.
        hb = bt.blocking_start(
            Settings(source=SyntheticSource(
                sample_rate=16_000, channels=1, duration=0.6, freq=440.0,
                realtime=False,
            ))
        )
        tb = threading.Thread(target=lambda: list(hb.receiver), daemon=True)
        tb.start()
        time.sleep(0.3)  # let B's source drain into its ring
        n_before = len(rounds)
        permits.release()  # finish the in-flight round

        # B must be in the very next round that starts.
        deadline = time.monotonic() + 30
        while len(rounds) <= n_before and time.monotonic() < deadline:
            permits.release()
            time.sleep(0.01)
        assert len(rounds) > n_before, "no further round started"
        assert hb._sid in rounds[n_before], (
            f"stream admitted late: rounds={rounds}"
        )
        gate_on.clear()
        for _ in range(64):
            permits.release()
        ta.join(timeout=60)
        tb.join(timeout=60)
        assert not ta.is_alive() and not tb.is_alive()
    finally:
        gate_on.clear()
        for _ in range(256):
            permits.release()
        bt.close()


def test_pad_rows_are_inert(monkeypatch):
    """Engine-level: padded rows (n_active) decode nothing and leave real
    rows' results identical to an unpadded batch."""
    import norma_tpu.decode.engine as engine_mod

    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import init_params
    import jax.numpy as jnp

    cfg = tiny_config()
    engine = DecodeEngine(
        init_params(cfg, seed=0), cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(7)
    wins = np.stack([
        prepare_audio(
            (0.1 * rng.standard_normal(12_000)).astype(np.float32),
            n_frames=n_frames,
        )
        for _ in range(2)
    ])
    lang = TEST_LANG_IDS[0]

    want, _ = engine.transcribe_window(jnp.asarray(wins), [lang] * 2, seed=0)
    # B=4 with 2 pad rows (duplicating row 0, as the scheduler does).
    padded = np.concatenate([wins, wins[:1], wins[:1]], axis=0)
    got, _ = engine.transcribe_window(
        jnp.asarray(padded), [lang] * 4, seed=0, n_active=2
    )
    for i in range(2):
        assert got[i].tokens == want[i].tokens
        assert got[i].avg_logprob == pytest.approx(
            want[i].avg_logprob, abs=1e-4, nan_ok=True
        )
    # Pad rows decoded nothing and emit NO result (and, inside the host
    # loop, no decode_telemetry — a pad row's rung-0/avg=0 carry must not
    # read as a perfect real decode).
    for i in (2, 3):
        assert got[i] is None


def test_round_cap_rotates_and_completes(model):
    """max_round_streams caps the fused round's width (the admission
    latency knob) while rotation cycles through the backlog so nothing
    starves and every stream still completes."""
    bt = BatchedTranscriber(model, max_streams=4, max_round_streams=2)
    rounds = []
    orig = bt._dispatch_round

    def spy(ready):
        rounds.append(sorted(s.sid for s in ready))
        return orig(ready)

    bt._dispatch_round = spy
    handles = [
        bt.blocking_start(Settings(source=_source(i, seconds=1.4,
                                                  freq=220.0 + 60 * i)))
        for i in range(4)
    ]
    import threading

    outs = {}
    threads = []
    for i, h in enumerate(handles):
        t = threading.Thread(
            target=lambda i=i, h=h: outs.setdefault(i, list(h.receiver)),
            daemon=True,
        )
        t.start()
        threads.append(t)
    time.sleep(0.5)
    for h in handles:
        h.stop()
    for t in threads:
        t.join(timeout=120)
    bt.close()

    assert len(outs) == 4
    assert rounds, "no rounds ran"
    assert all(len(r) <= 2 for r in rounds), rounds
    # Rotation served every stream (no starvation).
    served = set().union(*map(set, rounds))
    assert served == {h._sid for h in handles}, (rounds, served)


# -- Round-3 engine/batching review fixes -------------------------------------


def test_failing_source_start_releases_slot(model):
    """A source whose start() raises must not leak its stream slot —
    repeated failures would exhaust max_streams with nothing to stop."""
    bt = BatchedTranscriber(model, max_streams=1)
    try:
        class BoomSource(SyntheticSource):
            def start(self, on_data, on_end=None):
                raise RuntimeError("device open failed")

        for _ in range(3):
            with pytest.raises(RuntimeError, match="device open failed"):
                bt.blocking_start(Settings(source=BoomSource(
                    sample_rate=16_000, channels=1, duration=0.5)))
        # The slot is still free.
        h = bt.blocking_start(Settings(source=SyntheticSource(
            sample_rate=16_000, channels=1, duration=0.4, realtime=False)))
        assert list(h.receiver)  # stream runs to completion
    finally:
        bt.close()


def test_warmup_covers_scheduler_buckets(model):
    """BatchedTranscriber.warmup() compiles every dp-rounded power-of-two
    bucket the scheduler can dispatch (including the speculative fallback
    per bucket) so no live round pays a mid-stream compile."""
    import copy
    model2 = copy.copy(model)  # don't monkeypatch the shared fixture
    bt = BatchedTranscriber(model2, max_streams=5)
    try:
        calls = []
        model2.warmup = lambda batch=1, put=None: calls.append(batch)
        bt.warmup()
        assert calls == [1, 2, 4, 5], calls
    finally:
        bt.close()

    # A round-size cap bounds the buckets warmup compiles: rounds never
    # dispatch wider than max_round_streams.
    import copy
    model3 = copy.copy(model)
    bt2 = BatchedTranscriber(model3, max_streams=8, max_round_streams=3)
    try:
        calls2 = []
        model3.warmup = lambda batch=1, put=None: calls2.append(batch)
        bt2.warmup()
        assert calls2 == [1, 2, 4], calls2  # n<=3 -> buckets 1,2,4
    finally:
        bt2.close()


def test_close_start_race_does_not_leak_scheduler():
    """close() marks closed under the lock before snapshotting, so a start
    racing with close either is admitted-and-stopped or refused — never
    admitted-and-ignored (which would hang the scheduler join forever)."""
    import threading

    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    for _ in range(10):
        engine = DecodeEngine(
            params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
        )
        m = WhisperModel(
            engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0])
        )
        bt = BatchedTranscriber(m, max_streams=2)
        barrier = threading.Barrier(2)
        errors = []

        def starter():
            barrier.wait()
            try:
                bt.blocking_start(Settings(source=SyntheticSource(
                    sample_rate=16_000, channels=1, duration=0.3,
                    realtime=False)))
            except Exception as e:
                errors.append(e)

        t = threading.Thread(target=starter, daemon=True)
        t.start()
        barrier.wait()
        bt.close()
        t.join(timeout=10)
        assert not t.is_alive()
        assert not bt._thread.is_alive(), "scheduler thread leaked"


def test_latency_metrics_populated(model):
    """metrics() exposes admission->first-partial and ready->applied
    percentiles once streams have emitted (VERDICT r3: measure the
    multi-stream admission/emission latency distribution)."""
    bt = BatchedTranscriber(model, max_streams=4)
    handles = [
        bt.blocking_start(Settings(source=_source(i, seconds=1.0)))
        for i in range(2)
    ]
    time.sleep(0.4)
    for h in handles:
        h.stop()
    for h in handles:
        "".join(list(h.receiver))
    m = bt.metrics()
    bt.close()

    lat = m["latency"]
    ra = lat["ready_to_applied"]
    assert ra is not None and ra["n"] >= 2
    assert 0.0 <= ra["p50_ms"] <= ra["p99_ms"] <= ra["max_ms"]
    af = lat["admit_to_first_partial"]
    # Text emission depends on the toy model emitting: the fixture's
    # confident params always emit, so the series must be populated.
    assert af is not None and af["n"] >= 1
    assert af["p50_ms"] > 0


def test_pipelined_rounds_are_disjoint(model):
    """Round pipelining must never put a stream in two in-flight rounds:
    consecutive dispatches drawn from _ready() exclude in-flight sids."""
    bt = BatchedTranscriber(model, max_streams=4)
    assert bt.pipeline_rounds  # plain engine supports the async split
    dispatched = []
    orig = bt._dispatch_round

    def spy(ready):
        # Every stream handed to dispatch must not already be in flight.
        assert all(not s.in_flight for s in ready)
        dispatched.append([s.sid for s in ready])
        return orig(ready)

    bt._dispatch_round = spy
    handles = [
        bt.blocking_start(Settings(source=_source(i, seconds=1.6)))
        for i in range(3)
    ]
    import threading

    threads = [
        threading.Thread(target=lambda h=h: list(h.receiver), daemon=True)
        for h in handles
    ]
    for t in threads:
        t.start()
    time.sleep(0.5)
    for h in handles:
        h.stop()
    for t in threads:
        t.join(timeout=120)
    bt.close()
    assert dispatched, "no rounds dispatched"
