"""Instrumentation coverage (VERDICT r1 item 3/5): a debug-level run of the
hermetic e2e path must emit the reference's span structure (SURVEY §5):
every public entry instrumented, hot-path fields on transcribe and the
per-slice span, decode telemetry from the engine."""

import logging
import time

import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.decode import DecodeEngine, LanguageState
from norma_tpu.input import Settings
from norma_tpu.model import init_params
from norma_tpu.models.whisper.model import WhisperModel
from norma_tpu.runtime.transcriber import Transcriber


class _Definition:
    def common_params(self):
        from norma_tpu.models import CommonModelParams

        return CommonModelParams(
            max_chunk_len=8000, data_buffer_size=3, string_buffer_size=3
        )

    def blocking_try_to_model(self):
        cfg = tiny_config()
        params = init_params(cfg, seed=0)
        engine = DecodeEngine(
            params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
        )
        return WhisperModel(
            engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
            language_tokens=TEST_LANG_IDS,
        )


def test_e2e_span_structure(caplog):
    with caplog.at_level(logging.DEBUG, logger="norma_tpu"):
        jh, handle = Transcriber.blocking_spawn(_Definition())
        src = SyntheticSource(
            sample_rate=16_000, channels=1, dtype=np.float32,
            freq=330.0, noise=0.02, duration=0.8, realtime=False,
        )
        rx = handle.blocking_start(Settings(source=src))
        time.sleep(0.3)
        handle.stop()
        list(rx)
        handle.close()
        jh.join(timeout=10)

    text = caplog.text
    # Construction + control loop (reference lib.rs:315-393).
    assert "Transcriber.blocking_new enter" in text
    assert "Transcriber.blocking_spawn enter" in text
    assert "Transcriber.run enter" in text
    # Stream start/stop handle ops (lib.rs:644,678).
    assert "TranscriberHandle.blocking_start enter" in text
    assert "TranscriberHandle.stop enter" in text
    # Model hot path with fields (model.rs:54).
    assert "WhisperModel.transcribe enter" in text
    assert "input_data_len" in text and "buf_len" in text
    # Per-slice debug span (model.rs:72).
    assert "Transcribe slice enter" in text
    assert "slice_len" in text
    # Fused decode program span with batch fields.
    assert "DecodeEngine.transcribe_window enter" in text
    # Exit lines carry wall-time.
    assert "WhisperModel.transcribe exit" in text


def test_instrument_disabled_is_cheap(caplog):
    """Below the span level, instrumented fns skip field extraction."""
    from norma_tpu.tracing import instrument, logger as tlog

    calls = []

    @instrument(fields={"x": lambda a: calls.append(1)})
    def f(x):
        return x + 1

    old = tlog.level
    tlog.setLevel(logging.WARNING)
    try:
        assert f(1) == 2
        assert calls == []  # extractor never ran
    finally:
        tlog.setLevel(old)


def test_async_instrument_wraps_coroutines():
    import asyncio

    from norma_tpu.tracing import instrument

    @instrument
    async def g(v):
        return v * 2

    assert asyncio.run(g(21)) == 42


def test_instrument_field_named_name_or_level(caplog):
    """Span fields named 'name'/'level' collide with span()'s own
    positional args; the instrument layer must rename rather than
    TypeError the instrumented call (the 'telemetry never breaks the
    call' contract)."""
    import logging

    from norma_tpu.tracing import instrument

    @instrument(fields={"name": lambda a: a["x"], "level": lambda a: a["x"]})
    def f(x):
        return x * 2

    with caplog.at_level(logging.DEBUG, logger="norma_tpu"):
        assert f(21) == 42
    msgs = " ".join(r.getMessage() for r in caplog.records)
    assert "name_" in msgs and "level_" in msgs


def test_device_time_report_parses_xplane(tmp_path):
    """The xplane parser (the trusted-measurement path behind every
    device-ms figure) aggregates durations/counts per line name in one
    pass, hermetically pinned with a synthetic proto."""
    pytest.importorskip("tensorflow")
    from tensorflow.tsl.profiler.protobuf.xplane_pb2 import XSpace

    from norma_tpu.tracing import device_time_report, device_time_report_multi

    xs = XSpace()
    p = xs.planes.add()
    p.name = "/device:TPU:0"
    p.event_metadata[1].name = "jit_step"
    p.event_metadata[2].name = "fusion.1"
    ln = p.lines.add()
    ln.name = "XLA Modules"
    for dur in (5_000_000, 7_000_000):  # picoseconds
        ev = ln.events.add()
        ev.metadata_id = 1
        ev.duration_ps = dur
    ln2 = p.lines.add()
    ln2.name = "XLA Ops"
    ev = ln2.events.add()
    ev.metadata_id = 2
    ev.duration_ps = 3_000_000
    # A non-TPU plane must be ignored.
    host = xs.planes.add()
    host.name = "/host:CPU"
    hl = host.lines.add()
    hl.name = "XLA Modules"
    he = hl.events.add()
    he.metadata_id = 1
    he.duration_ps = 99_000_000

    sub = tmp_path / "run1"
    sub.mkdir()
    (sub / "x.xplane.pb").write_bytes(xs.SerializeToString())

    r = device_time_report_multi(str(tmp_path), ("XLA Modules", "XLA Ops"))
    assert r["XLA Modules"] == {"jit_step": (0.012, 2)}
    assert r["XLA Ops"] == {"fusion.1": (0.003, 1)}
    assert device_time_report(str(tmp_path)) == {"jit_step": (0.012, 2)}
