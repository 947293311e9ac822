"""Microphone capture via the native ALSA extension.

The reference's microphone path is cpal binding the OS audio API
(``/root/reference/src/lib.rs:502-557``).  Here the OS layer is the C++
extension in ``audio/native`` (ALSA capture thread + lock-free ring);
this module enumerates devices, applies the Settings selection policy and
config ranking, and wraps the capture as an ``AudioSource``.
"""

from __future__ import annotations

import numpy as np

from ..errors import DeviceError
from ..input import Settings
from .sources import AudioSource


def open_microphone(settings: Settings, model_rate: int, model_dtype) -> AudioSource:
    from .native import alsa  # lazy: only the mic path needs the extension

    return alsa.AlsaSource(settings, model_rate, model_dtype)
