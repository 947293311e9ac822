"""Numerical parity vs the canonical HF torch Whisper implementation.

The reference's network lives in candle-transformers, which mirrors the HF
torch model.  We can't download real checkpoints here, but we CAN build a
random torch Whisper, export its weights through our safetensors-name
mapping, and require our encoder/decoder to reproduce torch's forward pass
numerically.  This pins conv/attention/LN/embedding conventions end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from norma_tpu.model import WhisperConfig as NTConfig
from norma_tpu.model.load import params_from_hf_tensors
from norma_tpu.model.whisper import decoder_full, encode


@pytest.fixture(scope="module")
def models():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    hf_cfg = WhisperConfig(
        vocab_size=500,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=32,
        max_target_positions=24,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    tm = WhisperForConditionalGeneration(hf_cfg).eval()

    tensors = {
        name: p.detach().numpy().astype(np.float32)
        for name, p in tm.named_parameters()
    }
    # Buffers hold the (sinusoidal-initialized-by-HF?) encoder positions.
    for name, b in tm.named_buffers():
        tensors.setdefault(name, b.detach().numpy().astype(np.float32))

    nt_cfg = NTConfig(
        num_mel_bins=80,
        vocab_size=500,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        max_source_positions=32,
        max_target_positions=24,
        suppress_tokens=(),
    )
    params = params_from_hf_tensors(tensors, nt_cfg)
    return tm, nt_cfg, params


def test_encoder_matches_torch(models):
    tm, cfg, params = models
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.num_mel_bins, 64)).astype(np.float32)

    with torch.no_grad():
        want = tm.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    got = np.asarray(encode(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decoder_logits_match_torch(models):
    tm, cfg, params = models
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.num_mel_bins, 64)).astype(np.float32)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 7)).astype(np.int64)

    with torch.no_grad():
        out = tm(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks),
        )
        want = out.logits.numpy()

    feats = encode(params, cfg, jnp.asarray(mel))
    got = np.asarray(decoder_full(params, cfg, jnp.asarray(toks.astype(np.int32)), feats))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
