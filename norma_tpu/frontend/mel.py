"""Log-mel spectrogram frontend.

Re-creation of the reference's ``audio::pcm_to_mel`` frontend (imported from
candle at ``/root/reference/src/models/whisper/model.rs:74``), built
TPU-first: the whole pipeline (framing, windowed rFFT, mel matmul, log
compression, dynamic-range clamp) is expressed as a single jittable JAX
function over static shapes so XLA fuses it into a handful of kernels.  A
Pallas-fused variant lives in ``mel_pallas.py``.

Framing convention follows the reference's whisper.cpp lineage (NOT
OpenAI's torch.stft): frame ``i`` covers samples ``[i*hop, i*hop + n_fft)``
with NO center/reflect padding; audio is zero-padded at the tail.  The
reference computes >= N_FRAMES frames and the model truncates to N_FRAMES
(``model.rs:88``); the extra frames are pure silence (log-mel floor) and
cannot change the global max used for the dynamic-range clamp, so we
compute exactly N_FRAMES frames for a 30s window.

Pipeline per window (matching candle's log_mel_spectrogram):
  1. hann window (periodic, length 400) applied per frame
  2. rFFT(400) -> power spectrum over 201 bins
  3. mel filter matmul ([n_mels, 201] @ [201, frames])
  4. log10(max(power_mel, 1e-10))
  5. clamp below at (global_max - 8)
  6. (x + 4) / 4
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES
from .filters import mel_filterbank


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic hann window, matching torch.hann_window(n, periodic=True)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Zero-pad or truncate a 1-D PCM array to ``length`` samples."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = length - audio.shape[-1]
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames", "center"))
def log_mel_spectrogram(
    audio: jax.Array,
    n_mels: int = 80,
    n_frames: int = N_FRAMES,
    center: bool = False,
) -> jax.Array:
    """Compute the whisper log-mel spectrogram.

    Args:
      audio: [B, n_samples] (or [n_samples]) f32 PCM at 16 kHz.  Must hold at
        least ``(n_frames - 1) * hop + n_fft`` samples; use
        :func:`prepare_audio` to pad a raw window.
      n_mels: 80 or 128.
      n_frames: number of output frames (3000 for a 30s window).
      center: False (default) follows the reference's whisper.cpp/candle
        framing (frame i starts at i*hop); True follows OpenAI/HF
        torch.stft conventions (frames centered at i*hop with reflect
        padding) — bit-compatible with transformers' WhisperFeatureExtractor.

    Returns:
      [B, n_mels, n_frames] f32 log-mel features in [-1.5, ...] whisper scale.
    """
    if audio.ndim == 1:
        audio = audio[None]
    window = jnp.asarray(hann_window())
    filters = jnp.asarray(mel_filterbank(n_mels))

    if center:
        # Reflect-pad n_fft//2 on each side; frame i is centered at i*hop.
        audio = jnp.pad(
            audio[:, : n_frames * HOP_LENGTH],
            ((0, 0), (N_FFT // 2, N_FFT // 2)),
            mode="reflect",
        )

    # Frame: [B, n_frames, n_fft] WITHOUT a gather (a [n_frames, n_fft]
    # index gather measured ~8 ms/window on TPU).  With g = gcd(hop, n_fft)
    # the audio reshapes into g-sample blocks; each frame is n_fft//g
    # consecutive blocks at stride hop//g, so framing is n_fft//g strided
    # slices + one reshape — pure layout ops.
    g = int(np.gcd(HOP_LENGTH, N_FFT))
    blocks_per_win = N_FFT // g
    blocks_per_hop = HOP_LENGTH // g
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    pad_to = -audio.shape[1] % g
    if audio.shape[1] < need:
        raise ValueError(
            f"audio too short: {audio.shape[1]} < {need}; use prepare_audio"
        )
    if pad_to:
        audio = jnp.pad(audio, ((0, 0), (0, pad_to)))
    blocks = audio.reshape(audio.shape[0], -1, g)
    last = blocks_per_hop * (n_frames - 1)
    frames = jnp.stack(
        [
            blocks[:, k : k + last + 1 : blocks_per_hop, :]
            for k in range(blocks_per_win)
        ],
        axis=2,
    ).reshape(audio.shape[0], n_frames, N_FFT)
    frames = frames * window

    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)  # [B, n_frames, 201]
    power = jnp.square(spec.real) + jnp.square(spec.imag)

    mel = jnp.einsum(
        "mf,btf->bmt", filters, power, preferred_element_type=jnp.float32
    )  # [B, n_mels, n_frames]

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, log_max - 8.0)
    return (log_spec + 4.0) / 4.0


def prepare_audio(audio: np.ndarray, n_frames: int = N_FRAMES) -> np.ndarray:
    """Zero-pad raw PCM so that ``n_frames`` full frames can be extracted.

    The last frame starts at ``(n_frames-1)*hop`` and reads ``n_fft`` samples,
    so the padded length is ``(n_frames-1)*hop + n_fft`` (480_240 for 30s).
    """
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    return pad_or_trim(np.asarray(audio, dtype=np.float32), need)


def pcm_to_mel(audio: np.ndarray, n_mels: int = 80) -> jax.Array:
    """Host-convenience wrapper: raw PCM window -> [1, n_mels, N_FRAMES]."""
    return log_mel_spectrogram(jnp.asarray(prepare_audio(audio)), n_mels=n_mels)


def log_mel_reference(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Slow numpy reference used to validate the jitted/Pallas paths."""
    audio = prepare_audio(audio)
    window = hann_window().astype(np.float64)
    filters = mel_filterbank(n_mels).astype(np.float64)
    frames = np.stack(
        [
            audio[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT].astype(np.float64) * window
            for i in range(N_FRAMES)
        ]
    )
    spec = np.fft.rfft(frames, axis=-1)
    power = spec.real**2 + spec.imag**2
    mel = filters @ power.T  # [n_mels, n_frames]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
