"""Fused log-mel frontend as a Pallas TPU kernel.

The reference computes its mel spectrogram on the host CPU per slice
(candle ``audio::pcm_to_mel``, used at
``/root/reference/src/models/whisper/model.rs:74``).  TPU-native design: the
whole frontend — framing, windowed DFT, power spectrum, mel filterbank,
log10 — is ONE fused kernel, with the DFT expressed as two matmuls so the
FLOPs land on the MXU (TPUs have no FFT unit; a 400-point DFT against
precomputed hann-folded cos/sin matrices is ~1 GFLOP per 30s window, noise
for the MXU, and avoids any host round-trip).

Key trick: frames overlap (n_fft=400 > hop=160), which BlockSpec index maps
cannot express (they address in block units), so the kernel receives the
whole audio row (a 30s window is 1.9 MB — comfortably VMEM-resident) and
slices its slab with ``pl.ds``.  hop divides the frame length 2.5x, so the
[N, 400] frame matrix is assembled from three DENSE slices of the slab
viewed as [rows, 160]: frame i = rows[i] ++ rows[i+1] ++ rows[i+2][:80].

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

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


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
    """[n*hop + 3*hop] samples -> [n, 400] overlapped frame matrix."""
    rows = slab.reshape(n + 3, HOP_LENGTH)
    a = rows[0:n, :]
    b = rows[1 : n + 1, :]
    c = rows[2 : n + 2, : N_FFT - 2 * HOP_LENGTH]
    return jnp.concatenate([a, b, c], axis=1)


def _mel_block_kernel(audio_ref, cos_ref, sin_ref, mel_ref, out_ref, *, block_frames):
    """One grid step: [block_frames, n_mels] log10 mel power from one slab."""
    import jax.experimental.pallas as pl

    t = pl.program_id(1)
    slab_len = block_frames * HOP_LENGTH + 3 * HOP_LENGTH
    start = t * block_frames * HOP_LENGTH
    slab = audio_ref[0, pl.ds(start, slab_len)]
    frames = _frames_from_slab(slab, block_frames)

    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im  # [N, 256]

    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(
        1.0 / np.log(10.0)
    )


def log_mel_pallas(
    audio: jax.Array,
    n_mels: int = 80,
    n_frames: int = N_FRAMES,
    block_frames: int = 500,
    interpret: bool = False,
) -> jax.Array:
    """Fused log-mel: [B, samples] f32 -> [B, n_mels, n_frames] whisper scale.

    ``audio`` must hold >= (n_frames + 3) * hop samples (use
    :func:`pad_for_pallas`).  ``n_frames`` must divide by ``block_frames``.
    """
    from jax.experimental import pallas as pl

    if audio.ndim == 1:
        audio = audio[None]
    B = audio.shape[0]
    assert n_frames % block_frames == 0, (n_frames, block_frames)
    need = (n_frames + 3) * HOP_LENGTH
    assert audio.shape[1] >= need, (audio.shape, need)
    audio = audio[:, :need]

    cos_m, sin_m, mel_p = _dft_mats(n_mels)
    grid = (B, n_frames // block_frames)

    kernel = functools.partial(_mel_block_kernel, block_frames=block_frames)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Whole audio row per step (1.9 MB for 30s: VMEM-resident);
            # the kernel slices its overlapping slab with pl.ds.
            pl.BlockSpec((1, need), lambda b, t: (b, 0)),
            pl.BlockSpec(cos_m.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(sin_m.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel_p.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_frames, n_mels), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(audio, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel_p))
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
    re = jnp.einsum("btf,fk->btk", frames, jnp.asarray(cos_m))
    im = jnp.einsum("btf,fk->btk", frames, jnp.asarray(sin_m))
    power = re * re + im * im
    mel = jnp.einsum("btk,km->btm", power, jnp.asarray(mel_p))
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
