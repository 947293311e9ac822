from .config import PRESETS, WhisperConfig
from .load import (
    fuse_qkv,
    init_params,
    load_safetensors,
    param_count,
    params_from_hf_tensors,
    read_safetensors,
)
from .whisper import (
    cross_kv,
    decoder_full,
    decoder_prefill,
    decoder_step,
    encode,
    sinusoids,
)

__all__ = [
    "PRESETS",
    "WhisperConfig",
    "fuse_qkv",
    "init_params",
    "load_safetensors",
    "param_count",
    "params_from_hf_tensors",
    "read_safetensors",
    "cross_kv",
    "decoder_full",
    "decoder_prefill",
    "decoder_step",
    "encode",
    "sinusoids",
]
