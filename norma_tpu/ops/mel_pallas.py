"""Fused log-mel frontend as a Pallas TPU kernel.

The reference computes its mel spectrogram on the host CPU per slice
(candle ``audio::pcm_to_mel``, used at
``/root/reference/src/models/whisper/model.rs:74``).  TPU-native design: the
whole frontend — framing, windowed DFT, power spectrum, mel filterbank,
log10 — is ONE fused kernel, with the DFT expressed as two matmuls so the
FLOPs land on the MXU (TPUs have no FFT unit; a 400-point DFT against
precomputed hann-folded cos/sin matrices is ~1 GFLOP per 30s window, noise
for the MXU, and avoids any host round-trip).

The overlapped framing (n_fft=400 > hop=160) happens in XLA outside the
kernel: Mosaic rejects the strided-reshape patterns an in-kernel framing
needs (confirmed on hardware — the tile-unaligned [slab]->[rows,160]
reshape fails in the TPU compile helper), and the gather is a cheap
bandwidth-bound op XLA handles well.  The kernel then fuses the FLOPs-heavy
part: hann-folded DFT as two MXU matmuls, power spectrum, mel filterbank
matmul and log10, per [block_frames, 400] tile.

The global dynamic-range clamp (max - 8) needs an all-frames reduction, so
the kernel emits log10(mel power) and the tiny [B, n_mels, T] epilogue
(global max, clamp, +4, /4) is left to XLA fusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import HOP_LENGTH, N_FFT, N_FRAMES, N_FREQS
from ..frontend.filters import mel_filterbank
from ..frontend.mel import hann_window

from .tiling import round_up as _round_up

LANE = 128


@functools.lru_cache(maxsize=4)
def _dft_mats(n_mels: int):
    """Precompute hann-folded DFT cos/sin mats and padded mel matrix (f32)."""
    j = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(N_FREQS, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / N_FFT
    w = hann_window().astype(np.float64)[:, None]
    kp = _round_up(N_FREQS, LANE)  # 201 -> 256 lanes
    cos_m = np.zeros((N_FFT, kp), np.float32)
    sin_m = np.zeros((N_FFT, kp), np.float32)
    cos_m[:, :N_FREQS] = (w * np.cos(ang)).astype(np.float32)
    sin_m[:, :N_FREQS] = (w * np.sin(ang)).astype(np.float32)
    mel = mel_filterbank(n_mels)  # [n_mels, 201]
    mel_p = np.zeros((kp, n_mels), np.float32)
    mel_p[:N_FREQS, :] = mel.T
    return cos_m, sin_m, mel_p


def _frames_from_slab(slab: jax.Array, n: int) -> jax.Array:
    """[n*hop + 3*hop] samples -> [n, 400] overlapped frame matrix (XLA)."""
    rows = slab.reshape(n + 3, HOP_LENGTH)
    a = rows[0:n, :]
    b = rows[1 : n + 1, :]
    c = rows[2 : n + 2, : N_FFT - 2 * HOP_LENGTH]
    return jnp.concatenate([a, b, c], axis=1)


def _mel_block_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    """One grid step: [block_frames, 400] frames -> [block_frames, n_mels]
    log10 mel power (DFT matmuls + power + mel matmul + log, fused)."""
    frames = frames_ref[0]

    # HIGHEST precision: the DFT is ~1 GFLOP/window, and bf16 MXU passes
    # blow up under the log10 on near-silent bins (measured 0.3 in whisper
    # scale at default precision on v5e).
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32, precision=hp)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32, precision=hp)
    power = re * re + im * im  # [N, 256]

    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hp)
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(
        1.0 / np.log(10.0)
    )


def log_mel_pallas(
    audio: jax.Array,
    n_mels: int = 80,
    n_frames: int = N_FRAMES,
    block_frames: int = 600,
    interpret: bool = False,
) -> jax.Array:
    """Fused log-mel: [B, samples] f32 -> [B, n_mels, n_frames] whisper scale.

    ``audio`` must hold >= (n_frames + 3) * hop samples (use
    :func:`pad_for_pallas`).  ``n_frames`` must divide by ``block_frames``,
    which must itself be a multiple of 8 (TPU sublane tiling).
    """
    from jax.experimental import pallas as pl

    if audio.ndim == 1:
        audio = audio[None]
    B = audio.shape[0]
    assert n_frames % block_frames == 0, (n_frames, block_frames)
    assert block_frames % 8 == 0, block_frames  # TPU sublane tiling
    need = (n_frames + 3) * HOP_LENGTH
    assert audio.shape[1] >= need, (audio.shape, need)
    audio = audio[:, :need]

    cos_m, sin_m, mel_p = _dft_mats(n_mels)
    grid = (B, n_frames // block_frames)

    frames = jax.vmap(lambda row: _frames_from_slab(row, n_frames))(audio)

    out = pl.pallas_call(
        _mel_block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_frames, N_FFT), lambda b, t: (b, t, 0)),
            pl.BlockSpec(cos_m.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(sin_m.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel_p.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_frames, n_mels), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel_p))
    return _epilogue(out)


def log_mel_dft(audio: jax.Array, n_mels: int = 80, n_frames: int = N_FRAMES):
    """Pure-XLA equivalent of the Pallas kernel (same DFT-matmul math).

    Used as the CPU/test oracle and as a fallback path.
    """
    if audio.ndim == 1:
        audio = audio[None]
    need = (n_frames + 3) * HOP_LENGTH
    audio = audio[:, :need]
    cos_m, sin_m, mel_p = _dft_mats(n_mels)
    frames = jax.vmap(lambda row: _frames_from_slab(row, n_frames))(audio)
    hp = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btf,fk->btk", frames, jnp.asarray(cos_m), precision=hp)
    im = jnp.einsum("btf,fk->btk", frames, jnp.asarray(sin_m), precision=hp)
    power = re * re + im * im
    mel = jnp.einsum("btk,km->btm", power, jnp.asarray(mel_p), precision=hp)
    out = jnp.log(jnp.maximum(mel, 1e-10)) / np.float32(np.log(10.0))
    return _epilogue(out)


def _epilogue(log_spec_tn: jax.Array) -> jax.Array:
    """Global-max clamp + whisper scaling; [B, T, M] -> [B, M, T]."""
    log_spec = log_spec_tn.transpose(0, 2, 1)
    mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_for_pallas(audio: np.ndarray, n_frames: int = N_FRAMES) -> np.ndarray:
    """Zero-pad 1-D PCM for :func:`log_mel_pallas` / :func:`log_mel_dft`."""
    need = (n_frames + 3) * HOP_LENGTH
    audio = np.asarray(audio, np.float32)[..., :need]
    pad = need - audio.shape[-1]
    if pad:
        audio = np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
    return audio
