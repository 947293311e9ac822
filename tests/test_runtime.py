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


# -- Concurrency review fixes (round 3) ---------------------------------------


def test_receiver_close_unblocks_blocked_recv():
    """Closing the receiver must wake a thread blocked in blocking_recv on a
    SILENT stream: silence produces no send() to trip ReceiverClosed, so the
    receiver-closed flag itself must end the wait (tokio semantics)."""
    import threading

    from norma_tpu.runtime.channels import StringChannel

    chan = StringChannel(4)
    rx = chan.receiver()
    got = []
    t = threading.Thread(target=lambda: got.append(rx.blocking_recv()))
    t.start()
    time.sleep(0.2)
    rx.close()
    t.join(timeout=5)
    assert not t.is_alive(), "blocking_recv never woke after receiver.close()"
    assert got == [None]


def test_receiver_close_still_drains_buffered():
    from norma_tpu.runtime.channels import StringChannel

    chan = StringChannel(4)
    rx = chan.receiver()
    chan.send("a")
    chan.send("b")
    rx.close()
    assert rx.blocking_recv(timeout=1) == "a"
    assert rx.blocking_recv(timeout=1) == "b"
    assert rx.blocking_recv(timeout=1) is None


def test_is_closed_distinguishes_timeout_from_end_of_stream():
    """blocking_recv(timeout) returns None both on a silent live stream and
    at end of stream; is_closed is the disambiguator, so a polling consumer
    doesn't mistake slowness for termination."""
    from norma_tpu.runtime.channels import StringChannel

    chan = StringChannel(4)
    rx = chan.receiver()
    # Silent but live: timeout None, NOT closed.
    assert rx.blocking_recv(timeout=0.05) is None
    assert not rx.is_closed
    # Sender closed with one buffered segment: not ended until drained.
    chan.send("tail")
    chan.close_sender()
    assert not rx.is_closed
    assert rx.blocking_recv(timeout=1) == "tail"
    assert rx.is_closed
    assert rx.blocking_recv(timeout=0.05) is None


def test_ring_send_racing_close_fails_without_counting_a_drop():
    """A try_send whose commit lands after close() must not claim success:
    the blocked receiver already returned None, so the chunk is
    undeliverable.  It must NOT count in ``dropped`` either — that counter
    means lossy backpressure (ring full), the first-check closed path does
    not count one, and the churn soaks assert dropped == 0 across nominal
    stop()s whose teardown can race an in-flight send.

    The interleave is made deterministic by closing the ring from inside the
    data's __getitem__, which try_send invokes BETWEEN its slot-claim lock
    and its commit lock."""
    import numpy as np

    from norma_tpu.runtime.channels import RecycledRing

    ring = RecycledRing(2, 4)

    class ClosesMidCopy:
        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, idx):
            ring.close()  # fires exactly in the claim->commit window
            return self.arr[idx]

    sent = ring.try_send(ClosesMidCopy(np.ones(4, np.float32)), 4)
    assert sent is False, "commit after close must not report success"
    assert ring.dropped == 0, "teardown race is not a backpressure drop"
    # The claimed slot was recycled, not leaked.
    assert len(ring._free) == 2
    status, _ = ring.poll()
    assert status == "closed"


def test_is_closed_stays_false_while_buffered_tail_remains():
    """After the RECEIVER closes its half, buffered segments are still
    deliverable (_recv drains before checking flags) — so is_closed must
    stay False until the tail is drained, or a `while not rx.is_closed`
    poller exits early and silently loses it."""
    from norma_tpu.runtime.channels import StringChannel

    chan = StringChannel(4)
    rx = chan.receiver()
    chan.send("tail")
    rx.close()
    assert not rx.is_closed, "buffered tail still deliverable"
    assert rx.blocking_recv(timeout=1) == "tail"
    assert rx.is_closed
    assert rx.blocking_recv(timeout=0.05) is None


def test_abandoned_start_request_is_not_served():
    """A blocking_start that times out must not leave a zombie stream: the
    run loop either skips the queued request or tears the stream down if the
    open already happened (an unowned receiver would otherwise block the
    run loop at the first full transcript buffer, hanging the transcriber)."""
    from norma_tpu.runtime.transcriber import _StartReply

    r = _StartReply()
    with pytest.raises(Exception):
        r.wait(timeout=0.05)  # times out -> abandoned
    assert r.abandoned()
    assert r.reply("receiver") is False  # run() must see the abandonment

    # And the winning order: reply first, wait returns it.
    r2 = _StartReply()
    assert r2.reply("rx") is True
    assert r2.wait(timeout=1) == "rx"


def test_close_lands_past_a_pending_start():
    """close() with a pending start stuck in the 1-slot ctrl queue must
    still terminate the run loop (the sentinel used to be dropped on
    queue.Full, leaking the thread forever) and fail the pending start."""
    import queue as _queue

    from norma_tpu.runtime.transcriber import TranscriberHandle, _StartReply, _StreamState
    from norma_tpu.errors import TranscriberDown

    ctrl = _queue.Queue(maxsize=1)
    pending = _StartReply()
    ctrl.put((Settings(), pending))  # ctrl is now full
    th = TranscriberHandle(_StreamState(), ctrl)
    th.close()
    # The pending start was displaced with TranscriberDown...
    res = pending.wait(timeout=1)
    assert isinstance(res, TranscriberDown)
    # ...and the shutdown sentinel landed.
    assert ctrl.get_nowait() is None


def test_close_preserves_another_closers_sentinel():
    """Two closers racing: the second pops the first's shutdown sentinel
    off the 1-slot ctrl queue (to make room for its own) — it must put one
    BACK, or the run loop never sees a sentinel and lives forever."""
    import queue as _queue

    from norma_tpu.runtime.transcriber import TranscriberHandle, _StreamState

    ctrl = _queue.Queue(maxsize=1)
    ctrl.put(None)  # closer A's sentinel already queued
    h = TranscriberHandle(_StreamState(), ctrl)
    h.close()  # closer B
    assert ctrl.get_nowait() is None, "shutdown sentinel was consumed"
    assert ctrl.empty()


def test_start_against_dead_transcriber_fails_fast():
    """After the run loop exits, blocking_start must raise TranscriberDown
    promptly — even with timeout=None (the reference's closed control
    channel errors the send immediately, lib.rs:636,668); previously
    timeout=None hung forever and a finite timeout burned all of it."""
    import time as _time

    from norma_tpu.models.mock import MockDef
    from norma_tpu.runtime import Transcriber
    from norma_tpu.errors import TranscriberDown

    jh, h = Transcriber.blocking_spawn(MockDef())
    h.close()  # run loop exits
    jh.join(timeout=5)
    t0 = _time.monotonic()
    with pytest.raises(TranscriberDown):
        h.blocking_start(timeout=None)
    assert _time.monotonic() - t0 < 2.0, "dead-transcriber start was not fast"


def test_busy_ctrl_queue_times_out_as_running_not_down():
    """A put that times out on a FULL ctrl queue means the transcriber is
    alive and busy — the error must be TranscriberRunning, not
    TranscriberDown (whose message tells the user to join(), which would
    block forever on a healthy thread).  The total wait must also honor ONE
    deadline, not timeout for the put plus timeout for the reply."""
    import queue as _queue
    import time as _time

    from norma_tpu.runtime.transcriber import TranscriberHandle, _StreamState
    from norma_tpu.errors import TranscriberRunning

    ctrl = _queue.Queue(maxsize=1)
    ctrl.put(("occupied", None))  # a pending start holds the slot
    h = TranscriberHandle(_StreamState(), ctrl)
    t0 = _time.monotonic()
    with pytest.raises(TranscriberRunning):
        h.blocking_start(timeout=0.3)
    assert _time.monotonic() - t0 < 1.0
