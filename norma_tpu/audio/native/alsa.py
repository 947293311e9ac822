"""Native microphone pipeline: ALSA capture -> C++ DSP -> native ring.

Full-native real-time path: the capture thread, mixdown, sinc resampling and
chunk packing all run in C++ (reference: cpal's C-API callback +
dasp/thingbuf, lib.rs:159-262); Python only consumes finished chunks.  On
hosts without libasound the loader reports no devices and the caller raises
DeviceError, exactly like the reference's StartError::DeviceError.
"""

from __future__ import annotations

import logging
from typing import List, Tuple

import numpy as np

from ...errors import BuildStreamError, DeviceError
from ...input import Settings
from ..device import select_device
from . import load
from .wrappers import NativeRing

logger = logging.getLogger(__name__)


def list_devices() -> List[str]:
    lib = load()
    if lib is None or not lib.nta_alsa_available():
        return []
    buf = bytes(65536)
    import ctypes

    cbuf = ctypes.create_string_buffer(buf)
    n = lib.nta_alsa_devices(cbuf, len(buf))
    if n <= 0:
        return []
    return [d for d in cbuf.value.decode("utf-8", "replace").split("\n") if d]


class NativeMicPipeline:
    """StreamPipeline-compatible owner of a native ALSA capture."""

    def __init__(self, lib, handle, ring: NativeRing) -> None:
        self._lib = lib
        self._handle = handle
        self.ring = ring
        self._stopped = False

    def stop(self) -> None:
        if self._stopped:
            return
        self._stopped = True
        # Joins the capture thread; the native side flushes the final short
        # chunk and closes the ring (end-of-stream protocol).
        self._lib.nta_alsa_stop(self._handle)


def open_native_mic(
    settings: Settings, model_rate: int, model_dtype, n_slots: int, chunk_len: int
) -> Tuple[NativeMicPipeline, NativeRing]:
    lib = load()
    if lib is None or not lib.nta_alsa_available():
        raise DeviceError()

    devices = list_devices()
    # ALSA always exposes the "default" PCM even when enumeration is empty.
    name = select_device(devices, settings, "default")

    ring = NativeRing(n_slots, chunk_len, out_dtype=model_dtype)

    handle = None
    # Prefer capturing at the model rate (no resample); fall back to common
    # hardware rates with native sinc resampling (lib.rs:532-541 semantics).
    for rate in (model_rate, 48_000, 44_100):
        for channels in (1, 2):
            handle = lib.nta_alsa_start(
                name.encode(), rate, channels, model_rate, ring.ptr
            )
            if handle:
                logger.info(
                    "native mic open: %s @ %d Hz x%d ch", name, rate, channels
                )
                return NativeMicPipeline(lib, handle, ring), ring
    raise BuildStreamError(f"failed to open ALSA device {name!r}")
