"""Shared checkpoint loader for the whisper Definitions.

Re-creation of the loader halves of ``monolingual.rs:186-451`` /
``multilingual.rs``: resolve config/tokenizer/weights (HF hub download with
pinned revision, or a local directory for offline use), parse the config,
load weights onto the selected device, resolve special tokens, and build the
decode engine (the suppression masks are built inside DecodeEngine from the
config's suppress list, mirroring monolingual.rs:252-296).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...constants import TRANSCRIBE_TOKEN
from ...decode import DecodeEngine, LanguageState, SpecialTokens
from ...errors import MelBinsError, WhisperError
from ...model.config import WhisperConfig
from ...model.load import load_safetensors
from .. import CommonModelParams, SelectedDevice
from . import token_id
from .languages import ALL_LANGUAGES
from .model import WhisperModel
from .tokenizer import WhisperTokenizer


@dataclass(frozen=True)
class CheckpointFiles:
    config: str
    tokenizer: str
    weights: str


def resolve_files(
    repo_id: str,
    revision: str,
    quantized_ext: Optional[str],
    local_dir: Optional[str] = None,
) -> CheckpointFiles:
    """Find config/tokenizer/weights locally or via the HF hub.

    Mirrors monolingual.rs:189-211: quantized checkpoints use
    ``config-{ext}.json`` / ``tokenizer-{ext}.json`` / ``model-{ext}-q80.gguf``,
    normal ones ``config.json`` / ``tokenizer.json`` / ``model.safetensors``.
    """
    if quantized_ext is not None:
        names = (
            f"config-{quantized_ext}.json",
            f"tokenizer-{quantized_ext}.json",
            f"model-{quantized_ext}-q80.gguf",
        )
    else:
        names = ("config.json", "tokenizer.json", "model.safetensors")

    if local_dir is not None:
        paths = tuple(os.path.join(local_dir, n) for n in names)
        for p in paths:
            if not os.path.exists(p):
                raise WhisperError(f"checkpoint file not found: {p}")
        return CheckpointFiles(*paths)

    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise WhisperError(
            "huggingface_hub unavailable and no local_dir given"
        ) from e
    paths = tuple(
        hf_hub_download(repo_id=repo_id, filename=n, revision=revision)
        for n in names
    )
    return CheckpointFiles(*paths)


def build_model(
    *,
    repo_id: str,
    revision: str,
    quantized_ext: Optional[str],
    device: SelectedDevice,
    task_token_str: str = TRANSCRIBE_TOKEN,
    const_language_token_str: Optional[str] = None,
    local_dir: Optional[str] = None,
    dtype=jnp.float32,
    seed: int = 0,
    quantize_logits: bool = False,
    quantize_decoder: bool = False,
    mel_center: bool = False,
    timestamps: bool = False,
) -> WhisperModel:
    """Build a WhisperModel from a checkpoint.

    ``const_language_token_str`` set => monolingual (ConstLang); otherwise
    the model detects the language per utterance (Detect).
    """
    files = resolve_files(repo_id, revision, quantized_ext, local_dir)
    cfg = WhisperConfig.from_json(files.config)
    if cfg.num_mel_bins not in (80, 128):
        raise MelBinsError(cfg.num_mel_bins)
    tokenizer = WhisperTokenizer.from_file(files.tokenizer)

    jdev = device.to_jax_device()
    if quantized_ext is not None:
        from ...model.gguf import load_gguf_q8

        params = load_gguf_q8(files.weights, cfg, dtype)
    else:
        params = load_safetensors(files.weights, cfg, dtype)
    if quantize_decoder:
        from ...model.quant import quantize_decoder as _qd

        params = _qd(params)
    elif quantize_logits:
        from ...model.quant import quantize_logits_head

        params = quantize_logits_head(params)
    params = jax.device_put(params, jdev)

    st = SpecialTokens.from_tokenizer(tokenizer, task_token_str)

    lang_token_ids = [token_id(tokenizer, l.token()) for l in ALL_LANGUAGES]

    if const_language_token_str is not None:
        lang_state = LanguageState(
            const=token_id(tokenizer, const_language_token_str)
        )
    else:
        lang_state = LanguageState()

    engine = DecodeEngine(
        params, cfg, st, language_token_ids=lang_token_ids, mel_center=mel_center
    )
    return WhisperModel(
        engine,
        tokenizer,
        lang_state,
        language_tokens=lang_token_ids,
        seed=seed,
        timestamps=timestamps,
    )
