"""Int8 weight-quantized matmul path tests (CPU: jnp path + Pallas interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, tiny_config
from norma_tpu.model import init_params
from norma_tpu.model.quant import quantize_logits_head
from norma_tpu.ops.quant_matmul import (
    quantize_per_channel,
    w8_matmul_jnp,
    w8_matmul_pallas,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 300)).astype(np.float32)
    q, s = quantize_per_channel(w)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # int8 grid error


def test_w8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    w = rng.standard_normal((64, 300)).astype(np.float32)
    q, s = quantize_per_channel(w)
    want = x @ w
    got = np.asarray(w8_matmul_jnp(jnp.asarray(x), q, s))
    # bf16 activations + int8 weights: ~1% relative error budget.
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


def test_pallas_matches_jnp_interpret():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    w = rng.standard_normal((128, 700)).astype(np.float32)  # needs padding
    q, s = quantize_per_channel(w)
    a = np.asarray(w8_matmul_jnp(jnp.asarray(x), q, s))
    b = np.asarray(
        w8_matmul_pallas(jnp.asarray(x), q, s, block_out=512, interpret=True)
    )
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_full_decoder_quantization():
    """quantize_decoder: int8 layer weights decode close to the f32 path
    and shrink the decoder's resident bytes."""
    import jax

    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.model.quant import DECODER_W8_KEYS, quantize_decoder

    cfg = tiny_config()
    params = init_params(cfg, seed=1)
    qparams = quantize_decoder(params)

    layers = qparams["decoder"]["layers"]
    orig = params["decoder"]["layers"]
    for name in DECODER_W8_KEYS:
        if name not in orig:  # e.g. "qkv_w" on an unfused stack
            continue
        assert name not in layers and name + "_q" in layers
        assert layers[name + "_q"].dtype == jnp.int8

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))

    assert nbytes(qparams["decoder"]["layers"]) < 0.35 * nbytes(
        params["decoder"]["layers"]
    )

    feats = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 16, cfg.d_model)), jnp.float32
    )
    e_ref = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    e_q = DecodeEngine(qparams, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    s_ref = e_ref.prefill(feats, TEST_LANG_IDS[0])
    s_q = e_q.prefill(feats, TEST_LANG_IDS[0])
    # no-speech probe within int8 tolerance
    assert abs(
        float(s_ref["no_speech_prob"][0]) - float(s_q["no_speech_prob"][0])
    ) < 0.05
    dr = e_q.run_loop(s_q, 0.0, seed=0)[0]
    assert dr.tokens[0] == TEST_ST.sot
    assert dr.tokens[-1] == TEST_ST.eot or len(dr.tokens) == cfg.max_target_positions


def test_quantized_engine_decodes():
    """Engine with q8 logits head produces a sane token stream."""
    from norma_tpu.decode.engine import DecodeEngine

    cfg = tiny_config()
    params = quantize_logits_head(init_params(cfg, seed=0))
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    feats = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 16, cfg.d_model)), jnp.float32
    )
    state = engine.prefill(feats, TEST_LANG_IDS[0])
    dr = engine.run_loop(state, 0.0, seed=0)[0]
    assert dr.tokens[0] == TEST_ST.sot
    assert dr.tokens[-1] == TEST_ST.eot or len(dr.tokens) == cfg.max_target_positions
