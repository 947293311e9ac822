"""Native audio runtime: build-on-demand ctypes binding.

C++ sources live beside this file; the shared library is compiled lazily
with g++ (no pybind11 in this environment — plain C ABI + ctypes) and
cached next to the sources.  Every entry degrades gracefully: if no
toolchain is available, ``load()`` returns None and callers fall back to
the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "norma_audio.cpp")
_LIB = os.path.join(_DIR, "libnorma_audio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-ldl", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native audio build failed: %s", e)
        return None


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)

        c = ctypes
        fp = c.POINTER(c.c_float)
        lib.nta_ring_new.restype = c.c_void_p
        lib.nta_ring_new.argtypes = [c.c_int64, c.c_int64]
        lib.nta_ring_try_send.restype = c.c_int
        lib.nta_ring_try_send.argtypes = [c.c_void_p, fp, c.c_int64]
        lib.nta_ring_recv.restype = c.c_int64
        lib.nta_ring_recv.argtypes = [c.c_void_p, fp, c.c_int]
        lib.nta_ring_close.argtypes = [c.c_void_p]
        lib.nta_ring_dropped.restype = c.c_uint64
        lib.nta_ring_dropped.argtypes = [c.c_void_p]
        lib.nta_ring_chunk_len.restype = c.c_int64
        lib.nta_ring_chunk_len.argtypes = [c.c_void_p]
        lib.nta_ring_free.argtypes = [c.c_void_p]

        lib.nta_resampler_new.restype = c.c_void_p
        lib.nta_resampler_new.argtypes = [c.c_double, c.c_double]
        lib.nta_resampler_process.restype = c.c_int64
        lib.nta_resampler_process.argtypes = [c.c_void_p, fp, c.c_int64, fp, c.c_int64]
        lib.nta_resampler_free.argtypes = [c.c_void_p]

        lib.nta_mixdown.argtypes = [c.c_void_p, c.c_int64, c.c_int, c.c_int, fp]

        lib.nta_packer_new.restype = c.c_void_p
        lib.nta_packer_new.argtypes = [c.c_void_p]
        lib.nta_packer_append.argtypes = [c.c_void_p, fp, c.c_int64]
        lib.nta_packer_close.argtypes = [c.c_void_p]
        lib.nta_packer_free.argtypes = [c.c_void_p]

        lib.nta_alsa_available.restype = c.c_int
        lib.nta_alsa_devices.restype = c.c_int64
        lib.nta_alsa_devices.argtypes = [c.c_char_p, c.c_int64]
        lib.nta_alsa_query_configs.restype = c.c_int64
        lib.nta_alsa_query_configs.argtypes = [c.c_char_p, c.c_char_p, c.c_int64]
        lib.nta_alsa_start.restype = c.c_void_p
        lib.nta_alsa_start.argtypes = [
            c.c_char_p, c.c_uint, c.c_uint, c.c_uint, c.c_void_p,
        ]
        lib.nta_alsa_start_fmt.restype = c.c_void_p
        lib.nta_alsa_start_fmt.argtypes = [
            c.c_char_p, c.c_uint, c.c_uint, c.c_int, c.c_uint, c.c_void_p,
        ]
        lib.nta_alsa_stop.argtypes = [c.c_void_p]

        _lib = lib
        return _lib
