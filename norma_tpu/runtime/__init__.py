from .channels import Chunk, ReceiverClosed, RecycledRing, StringChannel, StringReceiver
from .transcriber import JoinHandle, Transcriber, TranscriberHandle

__all__ = [
    "Chunk",
    "JoinHandle",
    "ReceiverClosed",
    "RecycledRing",
    "StringChannel",
    "StringReceiver",
    "Transcriber",
    "TranscriberHandle",
]
