"""Fused-QKV parity: load.fuse_qkv must not change any model output.

The fused form runs the decode hot path's three self-attention input
projections as ONE matmul (norma_tpu/model/whisper.py:qkv_proj) — per-layer
weight streaming and dispatch fusion for the per-token step the reference
runs via three separate candle linears (model.rs:317-329 hot loop).  Math
is identical (same per-output-element dot products; K's bias slot is
zeros), so outputs must match to float tolerance and greedy transcripts
exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, tiny_config
from norma_tpu.decode.engine import DecodeEngine
from norma_tpu.frontend.mel import prepare_audio
from norma_tpu.model import fuse_qkv, init_params
from norma_tpu.model.quant import quantize_decoder
from norma_tpu.model.whisper import decoder_full, encode

CFG = tiny_config()
PARAMS = init_params(CFG, seed=0)
FUSED = fuse_qkv(PARAMS)


def test_fuse_structure():
    layers = FUSED["decoder"]["layers"]
    assert "qkv_w" in layers and "q_w" not in layers
    L, D = CFG.decoder_layers, CFG.d_model
    assert layers["qkv_w"].shape == (L, D, 3, D)
    assert layers["qkv_b"].shape == (L, 3, D)
    # K slot bias is zeros (whisper k_proj has no bias).
    np.testing.assert_array_equal(np.asarray(layers["qkv_b"][:, 1]), 0.0)
    # Idempotent.
    again = fuse_qkv(FUSED)
    assert again["decoder"]["layers"] is not FUSED["decoder"]["layers"]
    assert "qkv_w" in again["decoder"]["layers"]


def test_encoder_parity():
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, CFG.num_mel_bins, 2 * CFG.max_source_positions)
        ),
        jnp.float32,
    )
    a = np.asarray(jax.jit(lambda p: encode(p, CFG, mel))(PARAMS))
    b = np.asarray(jax.jit(lambda p: encode(p, CFG, mel))(FUSED))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_decoder_parity():
    rng = np.random.default_rng(1)
    xa = jnp.asarray(
        rng.standard_normal((2, CFG.max_source_positions, CFG.d_model)),
        jnp.float32,
    )
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 7)), jnp.int32)
    a = np.asarray(decoder_full(PARAMS, CFG, toks, xa))
    b = np.asarray(decoder_full(FUSED, CFG, toks, xa))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_transcribe_window_token_parity(monkeypatch):
    import norma_tpu.decode.engine as engine_mod

    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    e_raw = DecodeEngine(PARAMS, CFG, TEST_ST, language_token_ids=TEST_LANG_IDS)
    e_fused = DecodeEngine(FUSED, CFG, TEST_ST, language_token_ids=TEST_LANG_IDS)
    lang = TEST_LANG_IDS[0]
    n_frames = 2 * CFG.max_source_positions
    for seed in range(3):
        rng = np.random.default_rng(seed)
        audio = jnp.asarray(
            prepare_audio(
                (0.1 * rng.standard_normal(9000)).astype(np.float32),
                n_frames=n_frames,
            )
        )[None]
        want = e_raw.transcribe_window(audio, [lang], seed=0)[0][0]
        got = e_fused.transcribe_window(audio, [lang], seed=0)[0][0]
        assert got.tokens == want.tokens, f"seed {seed}"
        assert got.avg_logprob == pytest.approx(
            want.avg_logprob, abs=1e-4, nan_ok=True
        )


def test_quantize_commutes_with_fuse():
    """quantize_decoder(fuse_qkv(p)) == fuse_qkv(quantize_decoder(p)):
    per-out-channel int8 grids are unaffected by stacking."""
    qf = quantize_decoder(FUSED)
    fq = fuse_qkv(quantize_decoder(PARAMS))
    for part in ("encoder", "decoder"):
        a = qf[part]["layers"]
        b = fq[part]["layers"]
        assert set(a.keys()) == set(b.keys()), part
    a = qf["decoder"]["layers"]
    b = fq["decoder"]["layers"]
    np.testing.assert_array_equal(np.asarray(a["qkv_w_q"]), np.asarray(b["qkv_w_q"]))
    np.testing.assert_allclose(
        np.asarray(a["qkv_w_s"]), np.asarray(b["qkv_w_s"]), rtol=1e-6
    )


def test_quantized_fused_decode_runs():
    rng = np.random.default_rng(2)
    xa = jnp.asarray(
        rng.standard_normal((1, CFG.max_source_positions, CFG.d_model)),
        jnp.float32,
    )
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 5)), jnp.int32)
    qf = quantize_decoder(FUSED)
    a = np.asarray(decoder_full(qf, CFG, toks, xa))
    b = np.asarray(decoder_full(fuse_qkv(quantize_decoder(PARAMS)), CFG, toks, xa))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.isfinite(a).all()


def test_fused_shardings_build():
    from norma_tpu.parallel.sharding import make_mesh, param_shardings

    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    sh = param_shardings(FUSED, mesh)
    flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    specs = {k: v.spec for k, v in flat.items() if "qkv" in k}
    assert specs, "no fused leaves found"
    for k, spec in specs.items():
        assert spec[-1] == "tp", (k, spec)
    # And sharded fused params still decode (SPMD compiles + runs).
    from norma_tpu.parallel.sharding import shard_params

    sp = shard_params(FUSED, mesh)
    rng = np.random.default_rng(3)
    xa = jnp.asarray(
        rng.standard_normal((2, CFG.max_source_positions, CFG.d_model)),
        jnp.float32,
    )
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 4)), jnp.int32)
    a = np.asarray(decoder_full(sp, CFG, toks, xa))
    b = np.asarray(decoder_full(FUSED, CFG, toks, xa))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
