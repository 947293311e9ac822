"""End-to-end runtime tests.

Mirror of the reference's integration tests
(``/root/reference/tests/transcriber.rs``) — spawn, start, record ~3s, stop,
drain — but hermetic: a SyntheticSource replaces the real microphone (the
reference's tests are #[ignore]-d because they need hardware).  Asserts the
same protocol: non-empty output, only MSG/FINAL_MSG strings, and EXACTLY ONE
final message.
"""

import asyncio
import time

import numpy as np
import pytest

from norma_tpu import Transcriber, TranscriberRunning, NoStreamRunning
from norma_tpu.input import Settings
from norma_tpu.models.mock import FINAL_MSG, MSG, MockDef
from norma_tpu.audio.sources import SyntheticSource


def _settings(duration=None, rate=48_000, dtype=np.int16):
    # 48kHz stereo i16 source: exercises mixdown + conversion + resampling
    # down to the Mock model's 44.1kHz f64 (like the reference's mock).
    return Settings(
        source=SyntheticSource(
            sample_rate=rate,
            channels=2,
            dtype=dtype,
            duration=duration,
            realtime=False,
        )
    )


def test_blocking_mock_model():
    jh, th = Transcriber.blocking_spawn(MockDef())

    stream = th.blocking_start(_settings())
    # Non-realtime synthetic source: give it a moment to push >1s of audio.
    time.sleep(0.5)
    th.stop()
    th.close()

    res = list(stream)

    assert res, "expected non-empty message list"
    for msg in res:
        assert msg in (MSG, FINAL_MSG), f"unexpected message {msg!r}"
    assert res.count(FINAL_MSG) == 1, "expected exactly one FINAL_MSG"

    jh.join(timeout=10)


def test_async_mock_model():
    async def main():
        jh, th = await Transcriber.spawn(MockDef())
        stream = await th.start(_settings())
        await asyncio.sleep(0.5)
        th.stop()
        th.close()

        res = []
        while True:
            msg = await stream.recv()
            if msg is None:
                break
            res.append(msg)

        assert res
        for msg in res:
            assert msg in (MSG, FINAL_MSG)
        assert res.count(FINAL_MSG) == 1
        jh.join(timeout=10)

    asyncio.run(main())


def test_double_start_rejected():
    jh, th = Transcriber.blocking_spawn(MockDef())
    stream = th.blocking_start(_settings())
    time.sleep(0.1)
    with pytest.raises(TranscriberRunning):
        th.blocking_start(_settings())
    th.stop()
    th.close()
    list(stream)
    jh.join(timeout=10)


def test_stop_without_stream():
    jh, th = Transcriber.blocking_spawn(MockDef())
    with pytest.raises(NoStreamRunning):
        th.stop()
    th.close()
    jh.join(timeout=10)


def test_restart_after_stop():
    """The transcriber keeps serving new starts after a stream ends."""
    jh, th = Transcriber.blocking_spawn(MockDef())
    for _ in range(2):
        stream = th.blocking_start(_settings())
        time.sleep(0.3)
        th.stop()
        res = list(stream)
        assert res and res.count(FINAL_MSG) == 1
    th.close()
    jh.join(timeout=10)


def test_receiver_close_tears_down_stream():
    """Dropping the string receiver stops the stream but keeps the
    transcriber alive (reference: lib.rs:479-489)."""
    jh, th = Transcriber.blocking_spawn(MockDef())
    stream = th.blocking_start(_settings())
    time.sleep(0.3)
    stream.close()
    # Give the run loop a moment to notice and tear down.
    time.sleep(1.0)
    # A new start must now succeed (stream no longer "running").
    stream2 = th.blocking_start(_settings())
    time.sleep(0.2)
    th.stop()
    th.close()
    list(stream2)
    jh.join(timeout=10)


def test_transcribe_error_surfaces_via_join():
    from norma_tpu.models import CommonModelParams, Model, ModelDefinition

    class Boom(Model):
        SAMPLE_RATE = 16_000
        dtype = np.float32

        def transcribe(self, data, final_chunk):
            raise RuntimeError("boom")

    class BoomDef(ModelDefinition):
        def common_params(self):
            return CommonModelParams(16_000, 3, 3)

        def blocking_try_to_model(self):
            return Boom()

    jh, th = Transcriber.blocking_spawn(BoomDef())
    stream = th.blocking_start(_settings(rate=16_000))
    time.sleep(0.5)
    with pytest.raises(RuntimeError, match="boom"):
        jh.join(timeout=10)
    # The stream was torn down on error.
    assert stream.blocking_recv(timeout=0.5) is None
