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


def test_int4_blockwise_roundtrip_error():
    from norma_tpu.ops.quant_matmul import quantize_blockwise_int4, unpack_int4

    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 300)).astype(np.float32)
    q, s = quantize_blockwise_int4(w, block=32)
    # Nibble-packed int8 storage: half the rows, portable everywhere.
    assert q.dtype == jnp.int8 and q.shape == (64, 300)
    assert s.dtype == jnp.bfloat16 and s.shape == (4, 300)
    codes = np.asarray(unpack_int4(q), np.float32).reshape(4, 32, 300)
    assert codes.min() >= -7 and codes.max() <= 7
    deq = (codes * np.asarray(s, np.float32)[:, None, :]).reshape(128, 300)
    # 4-bit grid with per-32-block scales: ~7% worst-case grid error.
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.12


def test_w4_matmul_close_to_f32():
    from norma_tpu.ops.quant_matmul import quantize_blockwise_int4, w4_matmul_jnp

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    w = rng.standard_normal((128, 300)).astype(np.float32)
    q, s = quantize_blockwise_int4(w, block=32)
    want = x @ w
    got = np.asarray(w4_matmul_jnp(jnp.asarray(x), q, s))
    # int4 grid + bf16 activations: coarser than w8 but bounded.
    assert np.abs(got - want).max() / np.abs(want).max() < 0.15


def test_w4_pallas_matches_jnp_interpret():
    from norma_tpu.ops.quant_matmul import (
        quantize_blockwise_int4,
        w4_matmul_jnp,
        w4_matmul_pallas,
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    w = rng.standard_normal((128, 700)).astype(np.float32)  # needs padding
    q, s = quantize_blockwise_int4(w, block=32)
    want = np.asarray(w4_matmul_jnp(jnp.asarray(x), q, s))
    got = np.asarray(
        w4_matmul_pallas(jnp.asarray(x), q, s, block_out=512, interpret=True)
    )
    # Same codes; jnp scales the partials in f32, the kernel pre-scales
    # the bf16 weights — bf16-rounding accumulates over the 128-term dot
    # (~0.7% of the |y|~11 logit scale here).
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.15)


def test_int4_head_engine_decodes(monkeypatch):
    """The int4 head drives the full fused-window program to a
    well-formed result (structure, grammar, termination).

    Exact transcript parity is NOT asserted: measured at production dims
    ([1280, 51866]), blockwise int4 carries ~10% relative logit error
    (vs 0.8% for per-channel int8) — enough to flip argmax on
    random-weight models whose logits are near-uniform, and the reason
    the int4 head is opt-in with a documented accuracy tradeoff
    (PERF.md) rather than a default."""
    import norma_tpu.decode.engine as engine_mod
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model.quant import quantize_logits_head_int4

    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -100.0)
    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    e_q4 = DecodeEngine(
        quantize_logits_head_int4(params, block=32), cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    n_frames = 2 * cfg.max_source_positions
    lang = TEST_LANG_IDS[0]
    for seed in range(2):
        rng = np.random.default_rng(100 + seed)
        audio = jnp.asarray(
            prepare_audio(
                (0.1 * rng.standard_normal(9000)).astype(np.float32),
                n_frames=n_frames,
            )
        )[None]
        got = e_q4.transcribe_window(audio, [lang], seed=0)[0][0]
        assert got is not None
        assert got.tokens[:3] == [TEST_ST.sot, lang, TEST_ST.task]
        assert (
            got.tokens[-1] == TEST_ST.eot
            or len(got.tokens) >= cfg.max_target_positions - 1
        )


def test_quantized_heads_checkpoint_behavior(tmp_path):
    """Full loader path on a seeded checkpoint: the int8 head transcript
    is IDENTICAL to full precision (pinned — this is the quantization
    default users get), and the int4 head produces a well-formed
    transcript through the same pipeline (exactness intentionally not
    asserted; see test_int4_head_engine_decodes for the measured why)."""
    pytest.importorskip("tokenizers")
    from checkpoint_fixture import make_checkpoint_dir
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper import monolingual

    make_checkpoint_dir(tmp_path)
    rng = np.random.default_rng(11)
    audio = (0.1 * rng.standard_normal(24_000)).astype(np.float32)

    texts = {}
    for tag, kw in (
        ("f32", {}),
        ("int4", {"quantize_logits": "int4"}),
        ("int8", {"quantize_logits": True}),
    ):
        d = monolingual.Definition(
            monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
            local_dir=str(tmp_path), **kw,
        )
        model = d.blocking_try_to_model()
        texts[tag] = model.transcribe(audio.copy(), final_chunk=True)
    assert texts["f32"] == texts["int8"], texts
    assert isinstance(texts["int4"], str) and texts["int4"].strip()


def test_int4_head_mesh_spec_and_parity():
    """The int4 head must be REPLICATED under tp: on TPU it dispatches to a
    Pallas (Mosaic) custom call GSPMD cannot partition, so a sharded spec
    would force a per-step all-gather of the packed head or fail to
    compile.  (int8 is the tp-recommended quantized head.)  The sharded
    model must still produce the same logits."""
    import jax

    from norma_tpu.model.quant import quantize_logits_head_int4
    from norma_tpu.model.whisper import logits_head
    from norma_tpu.parallel.sharding import make_mesh, param_shardings, shard_params

    cfg = tiny_config()
    params = quantize_logits_head_int4(init_params(cfg, seed=0), block=32)
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sh = param_shardings(params, mesh)
    q4 = sh["decoder"]["tok_emb_q4"]
    assert q4["q"].spec == () and q4["s"].spec == ()
    sp = shard_params(params, mesh)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, cfg.d_model)), jnp.float32)
    a = np.asarray(logits_head(sp["decoder"], x))
    b = np.asarray(logits_head(params["decoder"], x))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


# ---- w8a8 encoder (quantize_encoder) --------------------------------------


def test_q8a8_dense_exact_integer_accumulation():
    """The int8 x int8 product accumulates in int32, so the result must
    EQUAL the dequantize-then-matmul computed in float64 (the quantization
    grids are the only approximation, and both sides share them)."""
    from norma_tpu.ops.quant_matmul import (
        q8a8_dense,
        quantize_activations,
        quantize_per_channel,
    )

    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((3, 7, 64)), jnp.float32)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    b = rng.standard_normal(96).astype(np.float32)
    wq, ws = quantize_per_channel(w)
    xq, xs = quantize_activations(x)
    got = np.asarray(q8a8_dense(xq, xs, wq, ws, jnp.asarray(b)))
    want = (
        (np.asarray(xq, np.float64) @ np.asarray(wq, np.float64))
        * np.asarray(xs, np.float64)
        * np.asarray(ws, np.float64)[None, :]
        + b
    )
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6, atol=1e-5)
    # And the combined grid error vs the true product stays int8-bounded.
    true = np.asarray(x, np.float64) @ w + b
    rel = np.abs(got - true).max() / np.abs(true).max()
    assert rel < 0.03


def test_q8a8_pallas_matches_xla_interpret():
    """The Pallas w8a8 tile kernel computes EXACTLY what q8a8_dense does
    (same int32 accumulation, scales applied in VMEM), across padding
    (M, N not multiples of the blocks) and leading batch dims."""
    from norma_tpu.ops.quant_matmul import (
        q8a8_dense,
        q8a8_dense_pallas,
        quantize_activations,
        quantize_per_channel,
    )

    rng = np.random.default_rng(24)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)
    w = rng.standard_normal((64, 300)).astype(np.float32)  # needs padding
    b = rng.standard_normal(300).astype(np.float32)
    wq, ws = quantize_per_channel(w)
    xq, xs = quantize_activations(x)
    want = np.asarray(q8a8_dense(xq, xs, wq, ws, jnp.asarray(b)))
    got = np.asarray(
        q8a8_dense_pallas(
            xq, xs, wq, ws, jnp.asarray(b),
            block_m=32, block_n=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_quantize_activations_no_clip_needed():
    """|x| <= amax implies |round(x/scale)| <= 127 exactly — including the
    amax element itself and all-zero rows (scale falls back to 1)."""
    from norma_tpu.ops.quant_matmul import quantize_activations

    rng = np.random.default_rng(21)
    x = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((3, 32)), np.zeros((1, 32))]
        ).astype(np.float32)
    )
    q, s = quantize_activations(x)
    assert q.dtype == jnp.int8
    assert int(jnp.abs(q).max()) <= 127
    assert np.all(np.asarray(q)[-1] == 0) and float(s[-1, 0]) == 1.0
    deq = np.asarray(q, np.float32) * np.asarray(s)
    assert np.abs(deq - np.asarray(x)).max() <= np.abs(np.asarray(x)).max() / 254 + 1e-7


def test_quantize_encoder_features_close_and_fuse_consistent():
    """w8a8 encoder features track the f32 encoder within the int8 grids,
    identically for fuse-then-quantize and quantize-then-fuse, at ~1/4 the
    resident bytes."""
    import jax

    from norma_tpu.model.load import fuse_qkv
    from norma_tpu.model.quant import ENCODER_W8_KEYS, quantize_encoder
    from norma_tpu.model.whisper import encode

    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
        ),
        jnp.float32,
    )
    ref = np.asarray(encode(params, cfg, mel))

    qp = quantize_encoder(params)
    for name in ENCODER_W8_KEYS:
        if name not in params["encoder"]["layers"]:
            continue
        assert name not in qp["encoder"]["layers"]
        assert qp["encoder"]["layers"][name + "_q"].dtype == jnp.int8
    got = np.asarray(encode(qp, cfg, mel))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.05

    # Decoder untouched: quantize_encoder is orthogonal to the decoder knobs.
    assert "fc1_w" in qp["decoder"]["layers"]

    # Per-projection amax is independent of fusion, so both orders must
    # produce bit-identical forwards.
    a = np.asarray(encode(quantize_encoder(fuse_qkv(params)), cfg, mel))
    b = np.asarray(encode(fuse_qkv(qp), cfg, mel))
    np.testing.assert_array_equal(a, b)

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
        )

    assert nbytes(qp["encoder"]["layers"]) < 0.35 * nbytes(
        params["encoder"]["layers"]
    )


def test_encoder_q8_mode_w8a16_matches_dequantized_weights():
    """encoder_q8_mode="w8a16" computes bf16 over dequantized int8 weights:
    it must match an encode over explicitly dequantized params (per-channel
    scales commute out of the contraction; only float rounding differs),
    and differ from w8a8 only by the activation grid."""
    from norma_tpu.model.load import fuse_qkv
    from norma_tpu.model.quant import quantize_encoder
    from norma_tpu.model.whisper import encode

    cfg = tiny_config()
    params = fuse_qkv(init_params(cfg, seed=3))
    qp = quantize_encoder(params)
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal(
            (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
        ),
        jnp.float32,
    )

    # Manual dequant: rebuild full-precision layers as q * s.
    lay = dict(qp["encoder"]["layers"])
    for name in ("qkv_w", "o_w", "fc1_w", "fc2_w"):
        q = np.asarray(lay.pop(name + "_q"), np.float32)
        s = np.asarray(lay.pop(name + "_s"), np.float32)
        lay[name] = jnp.asarray(q * np.expand_dims(s, 1))
    deq = dict(qp)
    deq["encoder"] = dict(qp["encoder"])
    deq["encoder"]["layers"] = lay

    want = np.asarray(encode(deq, cfg, mel))
    got16 = np.asarray(encode(qp, cfg.with_(encoder_q8_mode="w8a16"), mel))
    np.testing.assert_allclose(got16, want, rtol=1e-5, atol=1e-5)

    got8 = np.asarray(encode(qp, cfg, mel))  # default w8a8
    assert np.abs(got8 - got16).max() > 0  # activation grid is a real change

    with pytest.raises(ValueError, match="encoder_q8_mode"):
        encode(qp, cfg.with_(encoder_q8_mode="int8"), mel)


def test_quantize_encoder_engine_decodes():
    """The full fused-window program runs over a w8a8 encoder and yields a
    well-formed transcript result (exact parity intentionally not asserted:
    the activation grid shifts encoder features by design)."""
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model.quant import quantize_encoder

    cfg = tiny_config()
    params = quantize_encoder(init_params(cfg, seed=0))
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(22)
    audio = jnp.asarray(
        prepare_audio(
            (0.1 * rng.standard_normal(9000)).astype(np.float32),
            n_frames=n_frames,
        )
    )[None]
    got = engine.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)[0][0]
    assert got is None or got.tokens[0] == TEST_ST.sot


def test_quantize_encoder_tp_shardable():
    """Megatron tp-sharding applies to the w8a8 encoder stack (q on the
    weight axes, s on the out-channel axes) and the sharded forward
    matches the unsharded one exactly."""
    import jax

    from norma_tpu.model.load import fuse_qkv
    from norma_tpu.model.quant import quantize_encoder
    from norma_tpu.model.whisper import encode
    from norma_tpu.parallel.sharding import make_mesh, param_shardings, shard_params

    cfg = tiny_config()
    params = quantize_encoder(fuse_qkv(init_params(cfg, seed=1)))
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sh = param_shardings(params, mesh)
    lay = sh["encoder"]["layers"]
    assert lay["qkv_w_q"].spec[-1] == "tp"
    assert lay["qkv_w_s"].spec[-1] == "tp"
    assert lay["fc1_w_q"].spec[-1] == "tp"
    assert lay["fc2_w_q"].spec[1] == "tp"

    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
        ),
        jnp.float32,
    )
    want = np.asarray(encode(params, cfg, mel))
    sp = shard_params(params, mesh)
    got = np.asarray(encode(sp, cfg, mel))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantize_encoder_loader_path(tmp_path):
    """Loader opt-in: quantize_encoder=True transcribes through the full
    pipeline on a seeded checkpoint and composes with quantize_decoder."""
    pytest.importorskip("tokenizers")
    from checkpoint_fixture import make_checkpoint_dir
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper import monolingual

    make_checkpoint_dir(tmp_path)
    rng = np.random.default_rng(23)
    audio = (0.1 * rng.standard_normal(24_000)).astype(np.float32)
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(tmp_path), quantize_encoder=True, quantize_decoder=True,
    )
    model = d.blocking_try_to_model()
    lay = model.engine.params["encoder"]["layers"]
    assert "qkv_w_q" in lay and "qkv_w" not in lay
    text = model.transcribe(audio.copy(), final_chunk=True)
    assert isinstance(text, str)


# ---- int8 cross-attention K/V (quantize_cross_kv) -------------------------


def test_cross_kv_quantization_roundtrip():
    from norma_tpu.model.whisper import quantize_cross_kv

    rng = np.random.default_rng(7)
    xk = jnp.asarray(rng.standard_normal((2, 3, 16, 32)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((2, 3, 16, 32)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    assert kq["q"].dtype == jnp.int8 and kq["q"].shape == xk.shape
    assert kq["s"].shape == (2, 3, 32)
    deq = np.asarray(kq["q"], np.float32) * np.asarray(kq["s"])[:, :, None, :]
    rel = np.abs(deq - np.asarray(xk)).max() / np.abs(np.asarray(xk)).max()
    assert rel < 0.01  # int8 grid error per channel


def test_cross_q8_attention_matches_dequantized_reference():
    """The folded-scale int8 cross-attention must equal attention() over
    the explicitly dequantized K/V (the scales commute exactly; only
    float rounding differs)."""
    from norma_tpu.model.whisper import (
        attention,
        attention_cross_q8,
        attention_grouped,
        quantize_cross_kv,
    )

    rng = np.random.default_rng(8)
    B, Tq, Tk, D, H = 2, 1, 12, 32, 4
    q = jnp.asarray(rng.standard_normal((B, Tq, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    k_deq = (kq["q"].astype(jnp.float32) * kq["s"][:, :, None, :])[0]
    v_deq = (vq["q"].astype(jnp.float32) * vq["s"][:, :, None, :])[0]

    want = np.asarray(attention(q, k_deq, v_deq, H))
    got = np.asarray(
        attention_cross_q8(
            q, {"q": kq["q"][0], "s": kq["s"][0]},
            {"q": vq["q"][0], "s": vq["s"][0]}, H,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Grouped form (speculative ladder): G query rows share one K/V row.
    G = 3
    qg = jnp.asarray(rng.standard_normal((G * B, Tq, D)), jnp.float32)
    want_g = np.asarray(attention_grouped(qg, k_deq, v_deq, H, G))
    got_g = np.asarray(
        attention_cross_q8(
            qg, {"q": kq["q"][0], "s": kq["s"][0]},
            {"q": vq["q"][0], "s": vq["s"][0]}, H, n_groups=G,
        )
    )
    np.testing.assert_allclose(got_g, want_g, rtol=1e-4, atol=1e-4)


def test_cross_q8_chunked_matches_full_length():
    """The key-chunked online-softmax form must reproduce the full-length
    int8 cross-attention to float rounding (the softmax reduction is
    reassociated, nothing else changes) — plain and grouped, including a
    non-dividing chunk length (trailing partial chunk)."""
    from norma_tpu.model.whisper import (
        attention_cross_q8,
        attention_cross_q8_chunked,
        quantize_cross_kv,
    )

    rng = np.random.default_rng(11)
    B, Tq, Tk, D, H = 2, 3, 13, 32, 4
    q = jnp.asarray(rng.standard_normal((B, Tq, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    kq = {"q": kq["q"][0], "s": kq["s"][0]}
    vq = {"q": vq["q"][0], "s": vq["s"][0]}

    want = np.asarray(attention_cross_q8(q, kq, vq, H))
    for chunk in (4, 5, 13, 64):  # 13 % 4 != 0: partial trailing chunk
        got = np.asarray(
            attention_cross_q8_chunked(q, kq, vq, H, key_chunk=chunk)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # Grouped form (speculative ladder rows share one K/V stream).
    G = 3
    qg = jnp.asarray(rng.standard_normal((G * B, 1, D)), jnp.float32)
    want_g = np.asarray(attention_cross_q8(qg, kq, vq, H, n_groups=G))
    got_g = np.asarray(
        attention_cross_q8_chunked(qg, kq, vq, H, n_groups=G, key_chunk=5)
    )
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-5)


def test_cross_q8_a8_matches_explicit_quant_twin():
    """The fully-int8 QK/PV form must equal an explicit dequantize-then-
    attend twin of the SAME quantization decisions (pins the scale folding
    exactly), and stay within the documented drift tier of the bf16-dequant
    reference."""
    from norma_tpu.model.whisper import (
        attention_cross_q8,
        attention_cross_q8_a8,
        quantize_cross_kv,
    )

    rng = np.random.default_rng(12)
    B, Tq, Tk, D, H = 2, 1, 12, 32, 4
    dh = D // H
    q = jnp.asarray(rng.standard_normal((B, Tq, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    kq = {"q": kq["q"][0], "s": kq["s"][0]}
    vq = {"q": vq["q"][0], "s": vq["s"][0]}

    got = np.asarray(attention_cross_q8_a8(q, kq, vq, H))

    # Twin: replicate the row quantization of q and w explicitly in f32.
    qf = np.asarray(q, np.float64) * np.asarray(kq["s"], np.float64)[:, None, :]
    qf = qf * float(dh) ** -0.5
    sq = np.maximum(np.max(np.abs(qf), axis=-1, keepdims=True), 1e-8) / 127.0
    qi = np.clip(np.round(qf / sq), -127, 127)
    qh = (qi * sq).reshape(B, Tq, H, dh)
    kh = np.asarray(kq["q"], np.float64).reshape(B, Tk, H, dh)
    vh = np.asarray(vq["q"], np.float64).reshape(B, Tk, H, dh)
    logits = np.einsum("bqhd,bkhd->bhqk", qh, kh)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    sw = np.maximum(w.max(-1, keepdims=True), 1e-8) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127) * sw
    out = np.einsum("bhqk,bkhd->bqhd", wq, vh).reshape(B, Tq, D)
    want = out * np.asarray(vq["s"], np.float64)[:, None, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Whole-path drift vs the bf16-dequant reference stays in its tier.
    ref = np.asarray(attention_cross_q8(q, kq, vq, H))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_cross_kv_impl_dispatch():
    """cross_q8_attn honors WhisperConfig.cross_kv_impl and rejects
    unknown values; engines built with each impl decode a window."""
    import pytest

    from norma_tpu.model.whisper import cross_q8_attn, quantize_cross_kv

    cfg = tiny_config()
    rng = np.random.default_rng(13)
    B, Tk, D, H = 1, 8, 32, 4
    q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xk)
    kq = {"q": kq["q"][0], "s": kq["s"][0]}
    vq = {"q": vq["q"][0], "s": vq["s"][0]}

    base = np.asarray(cross_q8_attn(cfg, q, kq, vq, H))
    ch = np.asarray(
        cross_q8_attn(cfg.with_(cross_kv_impl="chunked", cross_kv_chunk=3),
                      q, kq, vq, H)
    )
    np.testing.assert_allclose(ch, base, rtol=1e-5, atol=1e-5)
    a8 = np.asarray(cross_q8_attn(cfg.with_(cross_kv_impl="a8"), q, kq, vq, H))
    assert np.isfinite(a8).all()
    with pytest.raises(ValueError):
        cross_q8_attn(cfg.with_(cross_kv_impl="nope"), q, kq, vq, H)


def test_prep_cross_kv_kernel_layout_roundtrip():
    """The kernel layout must be a pure relayout of the per-channel
    quantized codes: un-transposing [L,H,B,dh,Ta] must reproduce the
    original [L,B,Ta,D] code tensor exactly."""
    from norma_tpu.model.whisper import quantize_cross_kv
    from norma_tpu.ops.paged_cross import prep_cross_kv_kernel

    rng = np.random.default_rng(15)
    L, B, Ta, D, H = 2, 3, 12, 24, 4
    xk = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    kp, vp = prep_cross_kv_kernel(kq, vq, H)

    assert kp["kT"].shape == (L, H, B, D // H, Ta)
    assert kp["kT"].dtype == jnp.int8
    back = np.asarray(kp["kT"]).transpose(0, 2, 4, 1, 3).reshape(L, B, Ta, D)
    np.testing.assert_array_equal(back, np.asarray(kq["q"]))
    np.testing.assert_array_equal(np.asarray(kp["s"]), np.asarray(kq["s"]))
    back_v = np.asarray(vp["kT"]).transpose(0, 2, 4, 1, 3).reshape(L, B, Ta, D)
    np.testing.assert_array_equal(back_v, np.asarray(vq["q"]))


def test_cross_kernel_interpret_matches_einsum():
    """The Pallas cross-decode kernel (interpret mode — the math, not the
    Mosaic lowering, which tools/verify_paged_cross_tpu.py gates on real
    hardware) must match the einsum form on the same int8 codes, plain
    and grouped, to bf16-operand tolerance."""
    from norma_tpu.model.whisper import attention_cross_q8, quantize_cross_kv
    from norma_tpu.ops.paged_cross import (
        cross_attention_q8_kernel,
        prep_cross_kv_kernel,
    )

    rng = np.random.default_rng(17)
    B, Ta, D, H = 2, 16, 32, 4
    xk = jnp.asarray(rng.standard_normal((1, B, Ta, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((1, B, Ta, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    kp, vp = prep_cross_kv_kernel(kq, vq, H)
    kq1 = {"q": kq["q"][0], "s": kq["s"][0]}
    vq1 = {"q": vq["q"][0], "s": vq["s"][0]}
    kp1 = {k: v[0] for k, v in kp.items()}
    vp1 = {k: v[0] for k, v in vp.items()}

    q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    ref = np.asarray(attention_cross_q8(q, kq1, vq1, H))
    got = np.asarray(
        cross_attention_q8_kernel(q, kp1, vp1, H, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

    # Grouped rungs share one stream's K/V block.
    G = 3
    qg = jnp.asarray(rng.standard_normal((G * B, 1, D)), jnp.float32)
    ref_g = np.asarray(attention_cross_q8(qg, kq1, vq1, H, n_groups=G))
    got_g = np.asarray(
        cross_attention_q8_kernel(qg, kp1, vp1, H, n_groups=G, interpret=True)
    )
    np.testing.assert_allclose(got_g, ref_g, rtol=2e-2, atol=2e-2)

    # Head tiling is a pure DMA-granularity knob — identical outputs.
    base = np.asarray(
        cross_attention_q8_kernel(
            q, kp1, vp1, H, heads_per_cell=1, interpret=True
        )
    )
    # hpc=0 resolves to the auto tile (largest divisor <= the sweep's
    # winner for the batch size) — still identical outputs.
    for hpc in (0, 2, 4):
        tiled = np.asarray(
            cross_attention_q8_kernel(
                q, kp1, vp1, H, heads_per_cell=hpc, interpret=True
            )
        )
        np.testing.assert_allclose(tiled, base, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="divide"):
        cross_attention_q8_kernel(
            q, kp1, vp1, H, heads_per_cell=3, interpret=True
        )


def test_engine_kernel_impl_falls_back_off_tpu():
    """cross_kv_impl="kernel" on a non-TPU backend must build the PLAIN
    quantized dict (the kernel is TPU-only) and decode via the einsum
    form — same quantization grid, so transcripts match einsum exactly."""
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio

    cfg0 = tiny_config()
    params = init_params(cfg0, seed=2)
    win = prepare_audio(
        (0.1 * np.random.default_rng(16).standard_normal(12_000)).astype(
            np.float32
        ),
        n_frames=2 * cfg0.max_source_positions,
    )
    outs = {}
    for impl in ("einsum", "kernel"):
        e = DecodeEngine(
            params, cfg0.with_(cross_kv_impl=impl), TEST_ST,
            language_token_ids=TEST_LANG_IDS, quantize_cross_kv=True,
        )
        out, _ = e.transcribe_window(
            jnp.asarray(win)[None], [TEST_LANG_IDS[0]], seed=0
        )
        outs[impl] = out[0]
    assert (outs["kernel"] is None) == (outs["einsum"] is None)
    if outs["kernel"] is not None:
        assert outs["kernel"].tokens == outs["einsum"].tokens


def test_speculative_rejects_kernel_impl():
    from norma_tpu.decode import SpeculativeEngine

    cfg = tiny_config().with_(cross_kv_impl="kernel")
    dcfg = cfg.with_(decoder_layers=1, encoder_layers=1)
    params = init_params(cfg, seed=0)
    dparams = init_params(dcfg, seed=1)
    with pytest.raises(ValueError, match="kernel"):
        SpeculativeEngine(
            params, cfg, dparams, dcfg, TEST_ST, quantize_cross_kv=True
        )
    # Without quantize_cross_kv the impl string is inert: allowed.
    SpeculativeEngine(params, cfg, dparams, dcfg, TEST_ST)


def test_engine_cross_kv_impls_transcribe_windows():
    """DecodeEngine runs the fused window under every cross_kv_impl on
    both ladder strategies (B=1 speculative, B=4 sequential)."""
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio

    n_frames_cfg = tiny_config()
    rng = np.random.default_rng(14)
    win = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=2 * n_frames_cfg.max_source_positions,
    )
    for impl in ("chunked", "a8"):
        cfg = tiny_config().with_(cross_kv_impl=impl, cross_kv_chunk=7)
        params = init_params(cfg, seed=2)
        e = DecodeEngine(
            params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS,
            quantize_cross_kv=True,
        )
        out1, _ = e.transcribe_window(
            jnp.asarray(win)[None], [TEST_LANG_IDS[0]], seed=0
        )
        assert out1[0] is None or out1[0].tokens[0] == TEST_ST.sot
        win4 = jnp.asarray(np.stack([win] * 4))
        out4, _ = e.transcribe_window(win4, [TEST_LANG_IDS[0]] * 4, seed=0)
        assert len(out4) == 4


def test_engine_quantize_cross_kv_decodes_both_ladders():
    """quantize_cross_kv engines run the full fused window on both ladder
    strategies (speculative B=1, sequential B>2) and stay close to the
    bf16 engine's no-speech probe."""
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio

    cfg = tiny_config()
    params = init_params(cfg, seed=2)
    e_ref = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    e_q = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS,
        quantize_cross_kv=True,
    )
    assert e_q.quantize_cross_kv

    feats = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 16, cfg.d_model)),
        jnp.float32,
    )
    s_ref = e_ref.prefill(feats, TEST_LANG_IDS[0])
    s_q = e_q.prefill(feats, TEST_LANG_IDS[0])
    # Prefill itself is bf16 in both engines: probes must match closely.
    assert abs(
        float(s_ref["no_speech_prob"][0]) - float(s_q["no_speech_prob"][0])
    ) < 1e-5
    dr = e_q.run_loop(s_q, 0.0, seed=0)[0]
    assert dr.tokens[0] == TEST_ST.sot

    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(10)
    win1 = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=n_frames,
    )
    # Speculative path (B=1) and sequential path (B=4 > rows max / R).
    out1, _ = e_q.transcribe_window(
        jnp.asarray(win1)[None], [TEST_LANG_IDS[0]], seed=0
    )
    assert out1[0] is None or out1[0].tokens[0] == TEST_ST.sot
    win4 = jnp.asarray(np.stack([win1] * 4))
    out4, _ = e_q.transcribe_window(win4, [TEST_LANG_IDS[0]] * 4, seed=0)
    assert len(out4) == 4


def test_quantize_decoder_honors_int4_head():
    """quantize_decoder(logits='int4') composes the blockwise-int4 head with
    the int8 layers — an explicit int4 request must not be downgraded."""
    import jax.numpy as jnp

    from norma_tpu.model import fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder
    from helpers import tiny_config

    params = fuse_qkv(init_params(tiny_config(), seed=0, dtype=jnp.bfloat16))
    q = quantize_decoder(params, logits="int4")
    dec = q["decoder"]
    # int4 head present, int8 head absent (int4 takes precedence).
    assert "tok_emb_q4" in dec and "tok_emb_q8" not in dec, sorted(
        k for k in dec if k != "layers"
    )
    # Layers still int8-quantized.
    assert any(k.endswith("_q") for k in dec["layers"])

    with __import__("pytest").raises(ValueError):
        quantize_decoder(params, logits="nope")


def test_int8_head_pops_existing_int4_head():
    """Symmetric precedence: applying the int8 head to params that already
    carry an int4 head must remove it — logits_head dispatches q4 first, so
    a leftover int4 head would silently override the explicit int8 request
    (and keep both [D, V] copies resident)."""
    import jax.numpy as jnp

    from norma_tpu.model import init_params
    from norma_tpu.model.quant import (
        quantize_logits_head,
        quantize_logits_head_int4,
    )
    from helpers import tiny_config

    params = init_params(tiny_config(), seed=0, dtype=jnp.bfloat16)
    q = quantize_logits_head(quantize_logits_head_int4(params))
    dec = q["decoder"]
    assert "tok_emb_q8" in dec and "tok_emb_q4" not in dec, sorted(
        k for k in dec if k != "layers"
    )


# ---- int8 self-attention KV cache (quantize_self_kv) ----------------------


def test_self_kv_quantization_roundtrip():
    from norma_tpu.model.whisper import quantize_self_kv_cache

    rng = np.random.default_rng(11)
    cache = jnp.asarray(rng.standard_normal((2, 3, 10, 32)), jnp.float32)
    cq = quantize_self_kv_cache(cache)
    assert cq["q"].dtype == jnp.int8 and cq["q"].shape == cache.shape
    assert cq["s"].shape == (2, 3, 10, 1)
    deq = np.asarray(cq["q"], np.float32) * np.asarray(cq["s"])
    # Per-row grid error: <= amax/254 per row.
    amax = np.abs(np.asarray(cache)).max(axis=-1, keepdims=True)
    assert (np.abs(deq - np.asarray(cache)) <= amax / 254 + 1e-7).all()


def test_self_q8_attention_matches_dequantized_reference():
    """The folded per-row-scale int8 self-attention must equal attention()
    over the explicitly dequantized cache (scales commute exactly)."""
    from norma_tpu.model.whisper import (
        attention,
        attention_self_q8,
        quantize_self_kv_cache,
    )

    rng = np.random.default_rng(12)
    B, Tk, D, H = 3, 9, 32, 4
    q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((1, B, Tk, D)), jnp.float32)
    kq = quantize_self_kv_cache(ck)
    vq = quantize_self_kv_cache(cv)
    k_deq = (kq["q"].astype(jnp.float32) * kq["s"])[0]
    v_deq = (vq["q"].astype(jnp.float32) * vq["s"])[0]
    # Mask out the last two positions (the unwritten-cache-rows case).
    mask = jnp.where(jnp.arange(Tk) < Tk - 2, 0.0, -jnp.inf)[None, None, None, :]

    want = np.asarray(attention(q, k_deq, v_deq, H, mask))
    got = np.asarray(
        attention_self_q8(
            q, {"q": kq["q"][0], "s": kq["s"][0]},
            {"q": vq["q"][0], "s": vq["s"][0]}, H, mask,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_engine_quantize_self_kv_decodes_both_ladders():
    """quantize_self_kv engines run the loop and the full fused window on
    both ladder arms; on a peaked (confident) model the int8 cache rounding
    is far inside the greedy margins, so transcripts equal the bf16
    engine's."""
    from helpers import confident_params, texty_config
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio

    cfg = texty_config()
    params = confident_params(cfg)
    e_ref = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    e_q = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS,
        quantize_self_kv=True,
    )
    assert e_q.quantize_self_kv

    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(13)
    win1 = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=n_frames,
    )
    # Speculative-rung arm (B=1) and sequential arm (B=4).
    out_q1, _ = e_q.transcribe_window(
        jnp.asarray(win1)[None], [TEST_LANG_IDS[0]], seed=0
    )
    out_r1, _ = e_ref.transcribe_window(
        jnp.asarray(win1)[None], [TEST_LANG_IDS[0]], seed=0
    )
    assert out_q1[0] is not None and out_r1[0] is not None
    assert out_q1[0].tokens == out_r1[0].tokens

    win4 = jnp.asarray(np.stack([win1] * 4))
    out_q4, _ = e_q.transcribe_window(win4, [TEST_LANG_IDS[0]] * 4, seed=0)
    out_r4, _ = e_ref.transcribe_window(win4, [TEST_LANG_IDS[0]] * 4, seed=0)
    for a, b in zip(out_q4, out_r4):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.tokens == b.tokens

    # Composes with int8 cross-KV.
    e_qq = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS,
        quantize_self_kv=True, quantize_cross_kv=True,
    )
    out_qq, _ = e_qq.transcribe_window(
        jnp.asarray(win1)[None], [TEST_LANG_IDS[0]], seed=0
    )
    assert out_qq[0] is not None and out_qq[0].tokens[0] == TEST_ST.sot


def test_cross_kernel_stacked_matches_per_layer():
    """The stacked-layer kernel (scalar-prefetched layer index; r4 —
    removes the scan's per-layer slice copies) must match the per-layer
    kernel for every layer index, plain and grouped."""
    from norma_tpu.model.whisper import quantize_cross_kv
    from norma_tpu.ops.paged_cross import (
        cross_attention_q8_kernel,
        cross_attention_q8_kernel_stacked,
        prep_cross_kv_kernel,
    )

    rng = np.random.default_rng(23)
    L, B, Ta, D, H = 3, 2, 16, 32, 4
    xk = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    kq, vq = quantize_cross_kv(xk, xv)
    kp, vp = prep_cross_kv_kernel(kq, vq, H)

    q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    G = 3
    qg = jnp.asarray(rng.standard_normal((G * B, 1, D)), jnp.float32)
    for li in range(L):
        kp1 = {k: v[li] for k, v in kp.items()}
        vp1 = {k: v[li] for k, v in vp.items()}
        ref = np.asarray(
            cross_attention_q8_kernel(q, kp1, vp1, H, interpret=True)
        )
        got = np.asarray(
            cross_attention_q8_kernel_stacked(
                q, kp, vp, jnp.int32(li), H, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
        ref_g = np.asarray(
            cross_attention_q8_kernel(
                qg, kp1, vp1, H, n_groups=G, interpret=True
            )
        )
        got_g = np.asarray(
            cross_attention_q8_kernel_stacked(
                qg, kp, vp, jnp.int32(li), H, n_groups=G, interpret=True
            )
        )
        np.testing.assert_allclose(got_g, ref_g, rtol=1e-6, atol=1e-6)


def test_cross_kernel_int4_interpret_matches_dequant():
    """The int4 nibble-packed cross kernel (r4) must match exact
    attention over the DEQUANTIZED int4 codes (same codes, so the only
    difference is the kernel's bf16-operand math), and the pack must
    round-trip bit-exactly."""
    from norma_tpu.model.whisper import quantize_cross_kv4
    from norma_tpu.ops.paged_cross import (
        cross_attention_q8_kernel_stacked,
        prep_cross_kv_kernel4,
    )

    rng = np.random.default_rng(31)
    L, B, Ta, D, H = 2, 2, 16, 32, 4
    dh = D // H
    xk = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((L, B, Ta, D)), jnp.float32)
    kq, vq = quantize_cross_kv4(xk, xv)
    assert int(jnp.max(jnp.abs(kq["q"]))) <= 7  # int4 code range
    kp, vp = prep_cross_kv_kernel4(kq, vq, H)
    assert kp["kT4"].shape == (L, H, B, dh, Ta // 2)

    # Pack round-trip: unpacking the bytes recovers the codes (permuted
    # low-half/high-half order).
    pk = np.asarray(kp["kT4"], np.int32)
    lo = (pk << 28) >> 28
    hi = pk >> 4
    codes_t = np.asarray(
        jnp.transpose(
            kq["q"].reshape(L, B, Ta, H, dh), (0, 3, 1, 4, 2)
        )
    )
    np.testing.assert_array_equal(lo, codes_t[..., : Ta // 2])
    np.testing.assert_array_equal(hi, codes_t[..., Ta // 2:])

    for li in range(L):
        q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
        out = np.asarray(
            cross_attention_q8_kernel_stacked(
                q, kp, vp, jnp.int32(li), H, interpret=True
            )
        )
        kf = (
            np.asarray(kq["q"][li], np.float32)
            * np.asarray(kq["s"][li])[:, None, :]
        ).reshape(B, Ta, H, dh)
        vf = (
            np.asarray(vq["q"][li], np.float32)
            * np.asarray(vq["s"][li])[:, None, :]
        ).reshape(B, Ta, H, dh)
        qf = np.asarray(q, np.float32).reshape(B, H, dh)
        ref = np.zeros((B, 1, D), np.float32)
        for b in range(B):
            for h in range(H):
                lg = (qf[b, h] * dh ** -0.5) @ kf[b, :, h].T
                p = np.exp(lg - lg.max())
                p /= p.sum()
                ref[b, 0, h * dh:(h + 1) * dh] = p @ vf[b, :, h]
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_engine_int4_xkv_falls_back_without_kernel():
    """quantize_cross_kv='int4' off the kernel impl (or off TPU) must
    fall back to the int8 tier with a warning, and reject junk values."""
    import logging

    from norma_tpu.decode.engine import DecodeEngine

    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    with pytest.raises(ValueError, match="int4"):
        DecodeEngine(
            params, cfg, TEST_ST, quantize_cross_kv="int2"
        )
    eng = DecodeEngine(params, cfg, TEST_ST, quantize_cross_kv="int4")
    assert eng.quantize_cross_kv is True  # int8 fallback (CPU backend)


def test_engine_int4_xkv_kernel_interpret_decodes(monkeypatch):
    """Engine-level int4 cross-KV through the stacked kernel (Pallas
    interpret escape, off-TPU): on a peaked model the 4-bit rounding is
    mostly inside the greedy margins, so the fused window transcribes
    with a long shared prefix vs the bf16 engine on both ladder arms
    (late knife-edge tokens may flip — the tier's documented accuracy
    rung, PERF.md flip-rate table)."""
    from helpers import confident_params, texty_config
    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.frontend.mel import prepare_audio

    monkeypatch.setenv("NORMA_XKV_KERNEL_INTERPRET", "1")
    cfg = texty_config().with_(cross_kv_impl="kernel")
    params = confident_params(cfg)
    e_ref = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    e_q4 = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS,
        quantize_cross_kv="int4",
    )
    assert e_q4.quantize_cross_kv == "int4"  # escape kept the tier

    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(41)
    win = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=n_frames,
    )
    # Speculative-rung arm (B=1) and sequential arm (B=4).
    for B in (1, 4):
        wj = jnp.asarray(np.stack([win] * B))
        langs = [TEST_LANG_IDS[0]] * B
        out_q, _ = e_q4.transcribe_window(wj, langs, seed=0)
        out_r, _ = e_ref.transcribe_window(wj, langs, seed=0)
        for rq, rr in zip(out_q, out_r):
            assert rq is not None and rr is not None
            n = min(len(rq.tokens), len(rr.tokens))
            agree = next(
                (i for i in range(n) if rq.tokens[i] != rr.tokens[i]), n
            )
            assert agree >= int(0.75 * n), (
                f"B={B}: int4 diverged at {agree}/{n}"
            )
