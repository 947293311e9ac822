"""Mesh-sharding correctness: SPMD decode == single-device decode.

Runs the full engine (prefill + while_loop token loop) with params sharded
Megatron-style over a dp x tp mesh of virtual CPU devices and requires
token-identical output to the unsharded run (highest matmul precision, so
GSPMD's inserted collectives must be exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, random_feats, tiny_config
from norma_tpu.decode import DecodeEngine
from norma_tpu.model import init_params
from norma_tpu.parallel import make_mesh, param_shardings, shard_batch, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4+ virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(
        d_model=64, encoder_attention_heads=4, decoder_attention_heads=4
    )
    params = init_params(cfg, seed=0)
    return cfg, params


def test_param_shardings_cover_tree(setup):
    cfg, params = setup
    mesh = make_mesh(dp=2, tp=2)
    sh = param_shardings(params, mesh)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    assert len(flat_p) == len(flat_s)


@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 4), (4, 1)])
def test_sharded_decode_matches_unsharded(setup, dp, tp):
    cfg, params = setup
    feats_np = random_feats(cfg, B=4, T=16, seed=7)

    ref_engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    ref_state = ref_engine.prefill(jnp.asarray(feats_np), TEST_LANG_IDS[0])
    ref = ref_engine.run_loop(ref_state, 0.0, seed=0)

    mesh = make_mesh(dp=dp, tp=tp)
    sharded = shard_params(params, mesh)
    eng = DecodeEngine(sharded, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    state = eng.prefill(shard_batch(feats_np, mesh), TEST_LANG_IDS[0])
    out = eng.run_loop(state, 0.0, seed=0)

    for r, o in zip(ref, out):
        assert r.tokens == o.tokens
        assert r.no_speech_prob == pytest.approx(o.no_speech_prob, abs=1e-5)


def test_sharded_quantized_decode_matches(setup):
    """int8 decoder weights shard over tp and still decode identically."""
    from norma_tpu.model.quant import quantize_decoder

    cfg, params = setup
    qparams = quantize_decoder(params)
    feats_np = random_feats(cfg, B=2, T=16, seed=11)

    ref = DecodeEngine(qparams, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    r = ref.run_loop(ref.prefill(jnp.asarray(feats_np), TEST_LANG_IDS[0]), 0.0, 0)

    mesh = make_mesh(dp=2, tp=2)
    eng = DecodeEngine(
        shard_params(qparams, mesh), cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    o = eng.run_loop(eng.prefill(shard_batch(feats_np, mesh), TEST_LANG_IDS[0]), 0.0, 0)
    for a, b in zip(r, o):
        assert a.tokens == b.tokens


def test_sharded_detect_matches(setup):
    cfg, params = setup
    feats_np = random_feats(cfg, B=2, T=16, seed=9)
    ref = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    ).detect_language(jnp.asarray(feats_np))

    mesh = make_mesh(dp=2, tp=2)
    eng = DecodeEngine(
        shard_params(params, mesh), cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    out = eng.detect_language(shard_batch(feats_np, mesh))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_mesh_guard_falls_back_to_xla_twins(setup, caplog):
    """Kernel impls configured + mesh-sharded params => XLA twins.

    The Pallas impls are validated single-device only; an engine whose
    params span a mesh must fall back (engine.py kernel×mesh guard)
    with a warning, and still decode identically to the unsharded
    exact-math engine.
    """
    import logging

    cfg, params = setup
    kcfg = cfg.with_(
        encoder_attn_impl="jax_flash",
        cross_kv_impl="kernel",
        self_kv_impl="kernel",
        encoder_q8_mode="w8a8_pallas",
    )
    feats_np = random_feats(cfg, B=2, T=16, seed=13)

    ref = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    r = ref.run_loop(ref.prefill(jnp.asarray(feats_np), TEST_LANG_IDS[0]), 0.0, 0)

    mesh = make_mesh(dp=2, tp=2)
    with caplog.at_level(logging.WARNING, logger="norma_tpu.decode.engine"):
        eng = DecodeEngine(
            shard_params(params, mesh),
            kcfg,
            TEST_ST,
            language_token_ids=TEST_LANG_IDS,
        )
    assert eng.cfg.encoder_attn_impl == "auto"
    assert eng.cfg.cross_kv_impl == "einsum"
    assert eng.cfg.self_kv_impl == "xla"
    assert eng.cfg.encoder_q8_mode == "w8a8"
    assert eng.fused_sampler is False
    assert any("falling back to XLA twins" in m for m in caplog.messages)

    o = eng.run_loop(eng.prefill(shard_batch(feats_np, mesh), TEST_LANG_IDS[0]), 0.0, 0)
    for a, b in zip(r, o):
        assert a.tokens == b.tokens


def test_single_device_engine_keeps_kernel_config(setup):
    """The guard must NOT touch a single-device engine's config."""
    cfg, params = setup
    kcfg = cfg.with_(cross_kv_impl="kernel", self_kv_impl="kernel")
    eng = DecodeEngine(params, kcfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    assert eng.cfg.cross_kv_impl == "kernel"
    assert eng.cfg.self_kv_impl == "kernel"
