"""Data-plane channels.

Re-creation of the reference's channel architecture
(``/root/reference/src/lib.rs:157,396-404``):

  - ``RecycledRing``  — thingbuf-style bounded channel of preallocated,
    recycled fixed-capacity audio buffers with NON-BLOCKING lossy send
    (``try_send_ref``; a full ring drops the chunk with a warning,
    lib.rs:243-253).  A chunk shorter than its capacity is the
    end-of-stream signal (lib.rs:463).
  - ``StringChannel``  — bounded blocking channel for transcripts (tokio
    mpsc semantics: send blocks when full, fails when the receiver is
    closed).
  - control/oneshot channels are plain ``queue.Queue`` instances.

A C++ lock-free SPSC ring (``norma_tpu/audio/native``) backs the real-time
microphone path; this Python implementation serves every other source and
is the portable fallback.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class Chunk:
    """A filled ring slot: ``data[:length]`` is valid PCM."""

    buf: np.ndarray
    length: int

    @property
    def data(self) -> np.ndarray:
        return self.buf[: self.length]

    @property
    def is_final(self) -> bool:
        # End-of-stream protocol: a non-full chunk is the last one.
        return self.length < self.buf.shape[0]


class RecycledRing:
    """Bounded MPSC channel with slot recycling and drop-on-full send."""

    def __init__(self, capacity: int, chunk_len: int, dtype=np.float32) -> None:
        # The reference's thingbuf needs >= 2 slots of slack; callers pass
        # the already-adjusted CommonModelParams.data_buffer_size.
        self._free: "queue.Queue[np.ndarray]" = queue.Queue()
        self._full: "queue.Queue[Optional[Chunk]]" = queue.Queue()
        self._capacity = capacity
        self._chunk_len = chunk_len
        self._closed = threading.Event()
        self.dropped = 0
        for _ in range(max(capacity, 2)):
            self._free.put(np.zeros(chunk_len, dtype))

    @property
    def chunk_len(self) -> int:
        return self._chunk_len

    def try_send(self, data: np.ndarray, length: int) -> bool:
        """Non-blocking lossy send (reference: try_send_ref, lib.rs:244).

        Copies ``data[:length]`` into a recycled slot.  Returns False (chunk
        dropped) when no slot is free or the channel is closed.
        """
        if self._closed.is_set():
            return False
        try:
            slot = self._free.get_nowait()
        except queue.Empty:
            self.dropped += 1
            logger.warning("audio ring full; dropping chunk of %d samples", length)
            return False
        slot[:length] = data[:length]
        self._full.put(Chunk(slot, length))
        return True

    def recv(self, timeout: Optional[float] = None) -> Optional[Chunk]:
        """Blocking receive; None once closed and drained."""
        while True:
            if self._closed.is_set():
                try:
                    return self._full.get_nowait()
                except queue.Empty:
                    return None
            try:
                return self._full.get(timeout=0.05 if timeout is None else timeout)
            except queue.Empty:
                if timeout is not None:
                    return None

    def poll(self):
        """Non-blocking receive: (status, chunk) with status in
        {'chunk', 'empty', 'closed'}."""
        try:
            return "chunk", self._full.get_nowait()
        except queue.Empty:
            if self._closed.is_set():
                return "closed", None
            return "empty", None

    def release(self, chunk: Chunk) -> None:
        """Recycle a consumed slot."""
        self._free.put(chunk.buf)

    def close(self) -> None:
        self._closed.set()


class ReceiverClosed(Exception):
    pass


class StringReceiver:
    """Receiving half of a transcript channel.

    ``blocking_recv`` mirrors tokio's: returns None when the channel is
    closed AND drained.  Closing the receiver makes subsequent sends fail,
    which tears the stream down (reference: lib.rs:479-489).
    """

    def __init__(self, chan: "StringChannel") -> None:
        self._chan = chan

    def blocking_recv(self, timeout: Optional[float] = None) -> Optional[str]:
        return self._chan._recv(timeout)

    async def recv(self) -> Optional[str]:
        import asyncio

        return await asyncio.to_thread(self._chan._recv, None)

    def close(self) -> None:
        self._chan.close_receiver()

    def __iter__(self):
        while True:
            s = self.blocking_recv()
            if s is None:
                return
            yield s


class StringChannel:
    def __init__(self, maxsize: int) -> None:
        self._q: "queue.Queue[str]" = queue.Queue(maxsize=max(maxsize, 1))
        self._sender_closed = threading.Event()
        self._receiver_closed = threading.Event()

    def send(self, s: str) -> None:
        """Blocking send; raises ReceiverClosed if the receiver is gone."""
        while True:
            if self._receiver_closed.is_set():
                raise ReceiverClosed()
            try:
                self._q.put(s, timeout=0.05)
                return
            except queue.Full:
                continue

    def try_send(self, s: str, timeout: float = 0.2) -> bool:
        """Bounded-wait send for the batched scheduler: dropping beats
        stalling the shared decode loop.  Raises ReceiverClosed."""
        if self._receiver_closed.is_set():
            raise ReceiverClosed()
        try:
            self._q.put(s, timeout=timeout)
            return True
        except queue.Full:
            logger.warning("transcript channel full; dropping segment")
            return False

    def close_sender(self) -> None:
        self._sender_closed.set()

    def close_receiver(self) -> None:
        self._receiver_closed.set()

    def _recv(self, timeout: Optional[float]) -> Optional[str]:
        deadline = None
        while True:
            try:
                return self._q.get(timeout=0.05)
            except queue.Empty:
                if self._sender_closed.is_set():
                    return None
                if timeout is not None:
                    if deadline is None:
                        import time

                        deadline = time.monotonic() + timeout
                    else:
                        import time

                        if time.monotonic() >= deadline:
                            return None

    def receiver(self) -> StringReceiver:
        return StringReceiver(self)
