from .device import SupportedConfig, cmp_mic_config, rank_configs, select_device
from .pipeline import Packer, StreamPipeline, to_float
from .resample import StreamingResampler
from .sources import AudioSource, FileSource, SyntheticSource

__all__ = [
    "AudioSource",
    "FileSource",
    "SyntheticSource",
    "Packer",
    "StreamPipeline",
    "StreamingResampler",
    "SupportedConfig",
    "cmp_mic_config",
    "rank_configs",
    "select_device",
    "to_float",
]
