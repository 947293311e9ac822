"""norma-tpu: TPU-native real-time streaming speech-to-text.

A from-scratch re-creation of the capability set of MikeIvanichev/norma
(real-time Whisper transcription) built TPU-first: jitted JAX/XLA compute,
Pallas kernels for the log-mel frontend, an on-device autoregressive decode
loop, and a threaded runtime preserving the reference's Transcriber API
shape (blocking_spawn / blocking_start / stop, streamed partial
transcripts, final-chunk protocol).
"""

from . import audio, eval, input, models, parallel, tracing
from .errors import (
    NormaError,
    NoStreamRunning,
    StartError,
    StopError,
    TranscriberDown,
    TranscriberRunning,
)
from .runtime import JoinHandle, StringReceiver, Transcriber, TranscriberHandle
from .runtime.batching import BatchedTranscriber

__version__ = "0.3.0"

__all__ = [
    "audio",
    "eval",
    "input",
    "models",
    "parallel",
    "tracing",
    "BatchedTranscriber",
    "Transcriber",
    "TranscriberHandle",
    "JoinHandle",
    "StringReceiver",
    "NormaError",
    "StartError",
    "StopError",
    "TranscriberDown",
    "TranscriberRunning",
    "NoStreamRunning",
    "__version__",
]
