"""Shared test fixtures: a tiny Whisper config with a synthetic vocab layout
mirroring the real one (text < eot < sot < langs < tasks < no_speech <
no_timestamps < timestamps), plus a toy tokenizer."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from norma_tpu.decode.masks import SpecialTokens
from norma_tpu.model.config import WhisperConfig

# Tiny vocab layout (1000 tokens):
#   0..899    text
#   900       <|endoftext|>
#   901       <|startoftranscript|>
#   902..904  language tokens (<|en|>, <|zh|>, <|de|>)
#   905       <|transcribe|>   906 <|translate|>
#   907       <|nospeech|>
#   940       <|notimestamps|>
#   941..999  timestamps <|0.00|> (941) .. <|1.16|> (999)
TEST_ST = SpecialTokens(
    sot=901,
    eot=900,
    task=905,
    no_speech=907,
    no_timestamps=940,
    zero_sec=941,
    one_sec=991,
)
TEST_LANG_IDS = [902, 903, 904]


def tiny_config(**kw) -> WhisperConfig:
    defaults = dict(
        num_mel_bins=80,
        vocab_size=1000,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        max_source_positions=32,
        max_target_positions=48,
        suppress_tokens=(0, 5, 9, 907),
    )
    defaults.update(kw)
    return WhisperConfig(**defaults)


def texty_config(**kw) -> WhisperConfig:
    """tiny_config with EOT in the static suppress list.

    For PLUMBING tests that assert "the stream emitted transcript text":
    with EOT unreachable the greedy decode runs to the length cap through
    text/timestamp tokens instead of stopping empty, so emissions are
    non-empty AND deterministic (greedy rung 0, no t>0 draws whose seeds
    depend on batched round composition — the source of an old flake).
    Combine with :func:`confident_params`.
    """
    kw.setdefault("suppress_tokens", (0, 5, 9, 907, TEST_ST.eot))
    return tiny_config(**kw)


def confident_params(cfg: WhisperConfig, seed: int = 3, scale: float = 8.0):
    """Seeded params with a PEAKED decoder softmax (final LayerNorm gain
    scaled): greedy choices carry high probability, so decodes follow the
    deterministic rung-0 path instead of escalating through seed-dependent
    sampled rungs.  Pair with :func:`texty_config` in plumbing tests that
    assert non-empty transcript text."""
    import jax.numpy as jnp
    import numpy as _np

    from norma_tpu.model import init_params

    params = dict(init_params(cfg, seed=seed))
    d = dict(params["decoder"])
    d["ln_g"] = jnp.asarray(_np.asarray(d["ln_g"]) * scale)
    params["decoder"] = d
    return params


class ToyTokenizer:
    """Minimal tokenizer with the whisper special-token surface."""

    _SPECIALS = {
        "<|endoftext|>": 900,
        "<|startoftranscript|>": 901,
        "<|en|>": 902,
        "<|zh|>": 903,
        "<|de|>": 904,
        "<|transcribe|>": 905,
        "<|translate|>": 906,
        "<|nospeech|>": 907,
        "<|notimestamps|>": 940,
    }

    def __init__(self):
        self.specials = dict(self._SPECIALS)
        for i in range(941, 1000):
            self.specials[f"<|{(i - 941) * 0.02:.2f}|>"] = i
        self.id_to_special = {v: k for k, v in self.specials.items()}

    def token_to_id(self, s: str) -> Optional[int]:
        return self.specials.get(s)

    def decode(self, ids: List[int], skip_special_tokens: bool = True) -> str:
        parts = []
        for i in ids:
            if i in self.id_to_special or i >= 900:
                if not skip_special_tokens:
                    parts.append(self.id_to_special.get(i, f"<{i}>"))
            else:
                parts.append(f" w{i}")
        return "".join(parts)


def random_feats(cfg: WhisperConfig, B: int = 1, T: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, T, cfg.d_model)).astype(np.float32)


# ---- hermetic ALSA stub (tests/stub_alsa/stub_asound.c) --------------------
# Shared by test_native_stub.py and test_config_negotiation.py so the build
# command and the NTA_ALSA_LIB injection mechanism live in exactly one place.

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(_HERE)
ALSA_STUB_SRC = os.path.join(_HERE, "stub_alsa", "stub_asound.c")


def build_alsa_stub(out_path: str) -> str:
    """Compile the stub libasound to ``out_path``.

    Raises OSError/SubprocessError when no C toolchain is available —
    callers decide whether that is a skip or a failure.
    """
    import subprocess

    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", "-o", out_path, ALSA_STUB_SRC, "-lm"],
        check=True,
        capture_output=True,
        timeout=60,
    )
    return out_path


def run_stub_driver(driver: str, stub_path: str, timeout: int = 120):
    """Run ``driver`` source in a subprocess with the stub injected via
    NTA_ALSA_LIB (dlopen consults it at AlsaFns.load() time; a subprocess
    is required because this process may have cached a real/failed load).
    ``sys.argv[1]`` inside the driver is the repo root."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, NTA_ALSA_LIB=stub_path)
    return subprocess.run(
        [sys.executable, "-c", driver, REPO_ROOT],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO_ROOT,
    )
