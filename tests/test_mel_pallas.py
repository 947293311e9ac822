"""Pallas/DFT mel frontend vs the rFFT reference implementation."""

import numpy as np
import pytest

from norma_tpu.constants import N_FRAMES
from norma_tpu.frontend.mel import log_mel_reference
from norma_tpu.ops.mel_pallas import log_mel_dft, log_mel_pallas, pad_for_pallas


def _audio(seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    sr = 16_000
    t = np.arange(int(seconds * sr)) / sr
    return (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_dft_matches_rfft_reference(n_mels):
    audio = _audio()
    ref = log_mel_reference(audio, n_mels=n_mels)
    out = np.asarray(log_mel_dft(pad_for_pallas(audio), n_mels=n_mels))[0]
    assert out.shape == (n_mels, N_FRAMES)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_pallas_interpret_matches_dft():
    audio = pad_for_pallas(_audio(seed=1))
    a = np.asarray(log_mel_dft(audio, n_mels=80))
    b = np.asarray(log_mel_pallas(audio, n_mels=80, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_batched_interpret():
    audio = np.stack([pad_for_pallas(_audio(seed=s)) for s in range(2)])
    out = np.asarray(log_mel_pallas(audio, n_mels=80, interpret=True))
    assert out.shape == (2, 80, N_FRAMES)
    for i in range(2):
        single = np.asarray(log_mel_pallas(audio[i], n_mels=80, interpret=True))[0]
        np.testing.assert_allclose(out[i], single, atol=1e-6)
