"""Log-mel frontend tests: filters vs reference assets, jit vs numpy oracle."""

import os

import numpy as np
import pytest

from norma_tpu.constants import HOP_LENGTH, N_FRAMES, N_SAMPLES
from norma_tpu.frontend import (
    log_mel_reference,
    log_mel_spectrogram,
    mel_filterbank,
    pcm_to_mel,
    prepare_audio,
)

REF_MEL_DIR = "/root/reference/src/models/whisper/whisper_mel_bytes"


@pytest.mark.parametrize("n_mels", [80, 128])
def test_filters_match_reference_assets(n_mels):
    path = os.path.join(REF_MEL_DIR, f"{n_mels}.bytes")
    if not os.path.exists(path):
        pytest.skip("reference assets not mounted")
    ref = np.frombuffer(open(path, "rb").read(), dtype="<f4").reshape(n_mels, 201)
    ours = mel_filterbank(n_mels)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def _tone(seconds=2.0, freq=440.0, sr=16_000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_jit_matches_numpy_reference(n_mels):
    audio = _tone(1.5) + 0.01 * np.random.default_rng(0).standard_normal(24000).astype(
        np.float32
    )
    ref = log_mel_reference(audio, n_mels=n_mels)
    out = np.asarray(pcm_to_mel(audio, n_mels=n_mels))[0]
    assert out.shape == (n_mels, N_FRAMES)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_silence_floor():
    out = np.asarray(pcm_to_mel(np.zeros(1000, np.float32)))[0]
    # All-silence window: log10(1e-10) = -10 -> (x+4)/4 = -1.5 everywhere.
    np.testing.assert_allclose(out, -1.5, atol=1e-5)


def test_value_range_and_padding():
    audio = _tone(0.5)
    out = np.asarray(pcm_to_mel(audio))[0]
    # Frames past the audio are silence, clamped to (max - 8): range <= 2.0.
    assert out.max() - out.min() <= 2.0 + 1e-5
    # Energy concentrated in the first 50 frames (0.5s = 50 frames @ 10ms).
    active = out[:, :50].mean()
    padded = out[:, 100:].mean()
    assert active > padded


def test_prepare_audio_length():
    need = (N_FRAMES - 1) * HOP_LENGTH + 400
    assert prepare_audio(np.zeros(10, np.float32)).shape[-1] == need
    assert prepare_audio(np.zeros(N_SAMPLES * 2, np.float32)).shape[-1] == need


def test_batched():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, (N_FRAMES - 1) * HOP_LENGTH + 400)).astype(np.float32)
    import jax.numpy as jnp

    out = np.asarray(log_mel_spectrogram(jnp.asarray(a)))
    assert out.shape == (3, 80, N_FRAMES)
    for i in range(3):
        single = np.asarray(log_mel_spectrogram(jnp.asarray(a[i])))[0]
        np.testing.assert_allclose(out[i], single, atol=1e-5)
