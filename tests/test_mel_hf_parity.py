"""Centered-mel parity vs transformers' WhisperFeatureExtractor.

``log_mel_spectrogram(center=True)`` must reproduce the canonical
OpenAI/HF frontend bit-for-bit (modulo f32), pinning the framing, window,
filterbank and dynamic-range conventions against an external oracle.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from norma_tpu.constants import N_SAMPLES
from norma_tpu.frontend.mel import log_mel_spectrogram, pad_or_trim


@pytest.mark.parametrize("n_mels", [80, 128])
def test_centered_mel_matches_whisper_feature_extractor(n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    rng = np.random.default_rng(0)
    t = np.arange(24_000) / 16_000
    audio = (
        0.4 * np.sin(2 * np.pi * 333 * t) + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)

    want = fe(
        audio, sampling_rate=16_000, return_tensors="np", padding="max_length"
    ).input_features[0]

    padded = pad_or_trim(audio, N_SAMPLES)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=n_mels, center=True))[0]

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)
