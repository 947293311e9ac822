"""Speculative decoding tests: draft/verify greedy must be token-for-token
the target's own greedy decode (decode/speculative.py), and decoder_chunk
must equal sequential decoder_step forwards.

The reference has no speculative path — it decodes one token per target
forward (/root/reference/src/models/whisper/model.rs:317-371) — so the
correctness bar here is EXACT equivalence with our own (oracle-pinned)
non-speculative engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, tiny_config
from norma_tpu.constants import LOGPROB_THRESHOLD
from norma_tpu.decode.engine import DecodeEngine
from norma_tpu.decode.speculative import SpeculativeEngine
from norma_tpu.frontend.mel import prepare_audio
from norma_tpu.model import init_params
from norma_tpu.model.whisper import (
    cross_kv,
    decoder_chunk,
    decoder_prefill,
    decoder_step,
)


def _draft_cfg():
    # Distil-style draft: same d_model/vocab/positions, shallow decoder.
    return tiny_config(decoder_layers=1, encoder_layers=1)


def _window(seed: int, cfg, b: int = 1):
    n_frames = 2 * cfg.max_source_positions
    rng = np.random.default_rng(seed)
    win = prepare_audio(
        (0.1 * rng.standard_normal(12_000)).astype(np.float32),
        n_frames=n_frames,
    )
    return jnp.asarray(np.stack([win] * b))


# ---- decoder_chunk ---------------------------------------------------------


def test_decoder_chunk_matches_sequential_steps():
    """A C-token chunk forward == C sequential decoder_step forwards (same
    logits, same cache rows).  conftest pins matmul precision to 'highest';
    at default CPU precision the backend's bf16-grade GEMMs give ~1e-2
    shape-dependent drift that is NOT a chunk bug."""
    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(11)
    B = 2
    feats = jnp.asarray(
        rng.standard_normal((B, 16, cfg.d_model)), jnp.float32
    )
    xk, xv = cross_kv(params, cfg, feats)
    prefix = jnp.asarray([[901, 902], [901, 903]], jnp.int32)
    _, ck0, cv0 = decoder_prefill(params, cfg, prefix, xk, xv)
    toks = jnp.asarray([[905, 10, 20], [905, 11, 21]], jnp.int32)

    ck, cv = ck0, cv0
    seq = []
    for j in range(3):
        lg, ck, cv = decoder_step(
            params, cfg, toks[:, j], jnp.int32(2 + j), ck, cv, xk, xv
        )
        seq.append(lg)
    seq = jnp.stack(seq, axis=1)  # [B, 3, V]

    for C in (1, 2, 3):
        lg_c, ck_c, cv_c = decoder_chunk(
            params, cfg, toks[:, :C], jnp.full((B,), 2, jnp.int32),
            ck0, cv0, xk, xv,
        )
        np.testing.assert_allclose(
            np.asarray(lg_c), np.asarray(seq[:, :C]), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(ck_c[:, :, 2 : 2 + C]),
            np.asarray(ck[:, :, 2 : 2 + C]),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(cv_c[:, :, 2 : 2 + C]),
            np.asarray(cv[:, :, 2 : 2 + C]),
            rtol=2e-5, atol=2e-5,
        )


def test_decoder_chunk_per_row_positions():
    """Rows of one chunk call may sit at different depths (streams accept
    different proposal counts per round and drift apart)."""
    cfg = tiny_config()
    params = init_params(cfg, seed=4)
    rng = np.random.default_rng(12)
    B = 2
    feats = jnp.asarray(
        rng.standard_normal((B, 16, cfg.d_model)), jnp.float32
    )
    xk, xv = cross_kv(params, cfg, feats)
    prefix = jnp.asarray([[901, 902, 905], [901, 903, 905]], jnp.int32)
    _, ck0, cv0 = decoder_prefill(params, cfg, prefix, xk, xv)

    # Row 0 decodes at positions 3,4; row 1 first advances to position 4
    # via a plain step, then decodes at positions 4,5.
    lg_a, ck_a, cv_a = decoder_step(
        params, cfg, jnp.asarray([30, 31]), jnp.int32(3), ck0, cv0, xk, xv
    )
    toks = jnp.asarray([[10, 20], [40, 41]], jnp.int32)
    pos = jnp.asarray([3, 4], jnp.int32)
    # Per-row reference: row 0 chunk over base cache, row 1 over stepped.
    ref_rows = []
    for b, (base_k, base_v, p) in enumerate(
        [(ck0, cv0, 3), (ck_a, cv_a, 4)]
    ):
        ck, cv = base_k, base_v
        row = []
        for j in range(2):
            lg, ck, cv = decoder_step(
                params, cfg, toks[:, j], jnp.int32(p + j), ck, cv, xk, xv
            )
            row.append(lg[b])
        ref_rows.append(jnp.stack(row))
    ref = jnp.stack(ref_rows)  # [B, 2, V]

    base_k = ck0.at[:, 1].set(ck_a[:, 1])
    base_v = cv0.at[:, 1].set(cv_a[:, 1])
    lg_c, _, _ = decoder_chunk(params, cfg, toks, pos, base_k, base_v, xk, xv)
    np.testing.assert_allclose(
        np.asarray(lg_c), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


# ---- SpeculativeEngine -----------------------------------------------------


def _engines(seed: int, **spec_kw):
    cfg = tiny_config()
    params = init_params(cfg, seed=seed)
    dcfg = _draft_cfg()
    dparams = init_params(dcfg, seed=seed + 100)
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, dparams, dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, **spec_kw,
    )
    return cfg, plain, spec


def _cmp_results(a, b, *, tol=1e-4):
    assert (a is None) == (b is None)
    if a is None:
        return
    assert a.tokens == b.tokens
    assert a.avg_logprob == pytest.approx(
        b.avg_logprob, abs=tol, nan_ok=True
    )
    assert a.no_speech_prob == pytest.approx(b.no_speech_prob, abs=tol)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_window_matches_plain_sequential_ladder(seed):
    """Full outcome parity at B=3 (the plain engine's SEQUENTIAL ladder
    arm): the speculative rung 0 commits the target's own greedy tokens,
    and the fallback rungs reuse the sequential arm's per-rung seeds
    (fold_in(seed, r)), so every window must match result-for-result."""
    cfg, plain, spec = _engines(seed)
    B = 3
    audio = _window(50 + seed, cfg, b=B)
    langs = [TEST_LANG_IDS[0]] * B
    out_p, info_p = plain.transcribe_window(audio, langs, seed=7)
    out_s, info_s = spec.transcribe_window(audio, langs, seed=7)
    assert len(out_p) == len(out_s) == B
    for a, b in zip(out_p, out_s):
        _cmp_results(a, b)
    np.testing.assert_array_equal(info_p["langs"], info_s["langs"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_window_b1_greedy_parity(seed):
    """B=1 (the streaming case): when the plain engine accepts rung 0,
    the speculative engine must produce the identical result.  (Rung>0
    acceptances draw from different PRNG streams between the plain
    engine's concurrent-rungs arm and the spec fallback, so only the
    deterministic rung-0 outcome is comparable here; B=3 covers full
    ladder parity.)"""
    cfg, plain, spec = _engines(seed)
    audio = _window(80 + seed, cfg)
    out_p, _ = plain.transcribe_window(audio, [TEST_LANG_IDS[1]], seed=3)
    out_s, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[1]], seed=3)
    r = out_p[0]
    accepted_rung0 = (
        r is not None
        and (np.isnan(r.avg_logprob) or r.avg_logprob >= LOGPROB_THRESHOLD)
    )
    if not accepted_rung0:
        pytest.skip("rung 0 rejected for this seed; B=3 test covers it")
    _cmp_results(r, out_s[0])


@pytest.mark.parametrize("spec_k", [1, 4])
def test_spec_selfdraft_accepts_everything(spec_k):
    """draft == target: every proposal is the target's own greedy choice,
    so all K are accepted each round (exercising multi-token commits and
    the stale-row overwrite invariant) and the result still equals the
    plain engine's greedy decode."""
    cfg = tiny_config()
    params = init_params(cfg, seed=5)
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, params, cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, spec_k=spec_k,
    )
    audio = _window(60, cfg)
    out_p, _ = plain.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    out_s, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    r = out_p[0]
    if r is None or (
        not np.isnan(r.avg_logprob) and r.avg_logprob < LOGPROB_THRESHOLD
    ):
        pytest.skip("rung 0 rejected for this seed")
    _cmp_results(r, out_s[0])


def test_spec_fallback_path_writeback():
    """A window whose greedy rung fails the logprob gate must take the
    t>0 fallback dispatch and write the fallback rows back into the host
    buffer (regression: the zero-copy device view is read-only).  Seed 3
    with a sine window produces a finite below-threshold avg_logprob."""
    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    dcfg = _draft_cfg()
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, init_params(dcfg, seed=33), dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    sr = 16_000
    sine = (
        0.1 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)
    ).astype(np.float32)
    win = prepare_audio(sine, n_frames=2 * cfg.max_source_positions)
    B = 3  # plain sequential arm => rung>0 seeds match the spec fallback
    audio = jnp.asarray(np.stack([win] * B))
    out_p, _ = plain.transcribe_window(audio, [TEST_LANG_IDS[0]] * B, seed=4)
    out_s, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]] * B, seed=4)
    for a, b in zip(out_p, out_s):
        _cmp_results(a, b)


def test_spec_language_detection():
    cfg, plain, spec = _engines(1)
    audio = _window(70, cfg)
    out_p, info_p = plain.transcribe_window(audio, [-1], seed=2)
    out_s, info_s = spec.transcribe_window(audio, [-1], seed=2)
    np.testing.assert_array_equal(info_p["langs"], info_s["langs"])
    np.testing.assert_allclose(
        np.asarray(info_p["lang_probs"]),
        np.asarray(info_s["lang_probs"]),
        rtol=1e-4, atol=1e-5,
    )


def test_spec_pad_rows_inert():
    cfg, plain, spec = _engines(2)
    B = 2
    audio = _window(90, cfg, b=B)
    out, _ = spec.transcribe_window(
        audio, [TEST_LANG_IDS[0]] * B, seed=0, n_active=1
    )
    assert out[1] is None


def test_spec_constructor_validation():
    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    bad_width = tiny_config(d_model=32, decoder_layers=1)
    with pytest.raises(ValueError, match="d_model"):
        SpeculativeEngine(
            params, cfg, init_params(bad_width, seed=1), bad_width, TEST_ST
        )
    bad_pos = tiny_config(max_target_positions=32, decoder_layers=1)
    with pytest.raises(ValueError, match="max_target_positions"):
        SpeculativeEngine(
            params, cfg, init_params(bad_pos, seed=1), bad_pos, TEST_ST
        )
    dcfg = _draft_cfg()
    with pytest.raises(ValueError, match="spec_k"):
        SpeculativeEngine(
            params, cfg, init_params(dcfg, seed=1), dcfg, TEST_ST, spec_k=0
        )


def test_spec_quantize_cross_kv_runs():
    cfg, plain, spec = _engines(0, quantize_cross_kv=True)
    assert spec.quantize_cross_kv
    audio = _window(95, cfg)
    out, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    assert out[0] is None or out[0].tokens[0] == TEST_ST.sot


def test_spec_cross_kv_impls_match_einsum():
    """SpeculativeEngine under cross_kv_impl="chunked" must commit the
    SAME tokens as the einsum form (identical int8 rounding, only the
    softmax reduction reassociated — decoder_chunk's verify pass and the
    draft loop both route through cross_q8_attn); "a8" must run the full
    draft/verify window."""
    from norma_tpu.decode import SpeculativeEngine
    from norma_tpu.model import init_params

    cfg0 = tiny_config()
    params = init_params(cfg0, seed=4)
    dcfg0 = _draft_cfg()
    dparams = init_params(dcfg0, seed=104)
    audio = _window(96, cfg0)

    outs = {}
    for impl in ("einsum", "chunked", "a8"):
        cfg = cfg0.with_(cross_kv_impl=impl, cross_kv_chunk=5)
        dcfg = dcfg0.with_(cross_kv_impl=impl, cross_kv_chunk=5)
        spec = SpeculativeEngine(
            params, cfg, dparams, dcfg, TEST_ST,
            language_token_ids=TEST_LANG_IDS, quantize_cross_kv=True,
        )
        out, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
        outs[impl] = out[0]
        assert out[0] is None or out[0].tokens[0] == TEST_ST.sot
    _cmp_results(outs["chunked"], outs["einsum"])


def test_spec_quantized_draft():
    """An int8-quantized draft works (the draft streams the same-size
    logits head as the target on every sequential step — quantizing it
    is a measured serving knob, tools/perf_spec_ab.py knobs), and the
    committed output is STILL the exact bf16/f32 target's greedy decode:
    the draft only proposes; acceptance is judged by the target alone.
    """
    from norma_tpu.model import fuse_qkv
    from norma_tpu.model.quant import quantize_decoder

    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    dcfg = _draft_cfg()
    dparams = quantize_decoder(fuse_qkv(init_params(dcfg, seed=100)))
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, dparams, dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    audio = _window(7, cfg)
    out_p, _ = plain.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    out_s, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    _cmp_results(out_p[0], out_s[0])


def test_spec_telemetry_per_row_rounds():
    """Acceptance telemetry uses PER-ROW live round counts: a slow stream
    in the batch must not dilute other streams' tokens-per-round ratio
    (the auto-K de-escalation signal), and born-finished pad rows count
    zero rounds and are excluded."""
    from norma_tpu.decode.engine import NO_SPEECH_THRESHOLD

    cfg, plain, spec = _engines(0)
    B = 3
    # Different audio per row so rows finish at different rounds.
    audio = jnp.concatenate(
        [_window(200 + i, cfg) for i in range(B)], axis=0
    )
    langs = np.full(B, TEST_LANG_IDS[0], np.int32)

    fn = spec._spec_program(False)
    packed, _ = fn(
        spec.params, spec.draft_params, audio,
        jnp.asarray(langs), jnp.asarray(np.ones(B, bool)),
    )
    packed = np.array(packed)
    Tmax = cfg.max_target_positions
    bn = packed[:, Tmax].astype(np.int32)
    nsp = packed[:, Tmax + 3]
    lr = packed[:, -1].astype(np.int32)
    live = ~(nsp > NO_SPEECH_THRESHOLD)
    # Live rows ran at least one round; a row can never out-round the max.
    assert (lr[live] >= 1).all()

    out, _ = spec.transcribe_window(audio, langs, seed=0)
    assert spec.last_spec_rounds == int(lr.max())
    live_r = live & (lr > 0)
    if live_r.any():
        expected = float(((bn[live_r] - 3) / lr[live_r]).mean())
        assert spec.last_tokens_per_round == pytest.approx(expected)

    # Pad rows (n_active) are born finished: zero live rounds, and the
    # telemetry over the remaining live rows is unaffected by them.
    packed_p, _ = fn(
        spec.params, spec.draft_params, audio,
        jnp.asarray(langs), jnp.asarray(np.array([True, False, False])),
    )
    packed_p = np.array(packed_p)
    assert (packed_p[1:, -1] == 0).all()
    assert packed_p[0, -1] >= 1


def test_spec_w8a8_encoder_target_stays_exact():
    """quantize_encoder on the TARGET: both engines share the (now w8a8)
    encoder features, so speculative output must STILL equal the plain
    target's decode result-for-result — the encoder numerics change, the
    draft/verify invariant does not.  B=3 covers the sequential-ladder
    arm's full parity (per-rung seeds match)."""
    from norma_tpu.model import fuse_qkv
    from norma_tpu.model.quant import quantize_encoder

    cfg = tiny_config()
    params = quantize_encoder(fuse_qkv(init_params(cfg, seed=0)))
    dcfg = _draft_cfg()
    dparams = fuse_qkv(init_params(dcfg, seed=100))
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, dparams, dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    B = 3
    audio = _window(31, cfg, b=B)
    langs = [TEST_LANG_IDS[0]] * B
    out_p, info_p = plain.transcribe_window(audio, langs, seed=7)
    out_s, info_s = spec.transcribe_window(audio, langs, seed=7)
    for a, b in zip(out_p, out_s):
        _cmp_results(a, b)
    np.testing.assert_array_equal(info_p["langs"], info_s["langs"])


def test_spec_engine_in_batched_transcriber():
    """A speculative-engine model drops into the multi-stream scheduler
    unchanged (same transcribe_window contract incl. n_active pads and
    in-graph detection)."""
    import time

    from helpers import ToyTokenizer
    from norma_tpu.audio.sources import SyntheticSource
    from norma_tpu.decode import LanguageState
    from norma_tpu.input import Settings
    from norma_tpu.models.whisper.model import WhisperModel
    from norma_tpu.runtime.batching import BatchedTranscriber

    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    dcfg = _draft_cfg()
    engine = SpeculativeEngine(
        params, cfg, init_params(dcfg, seed=103), dcfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS,
    )
    model = WhisperModel(
        engine, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]),
        language_tokens=TEST_LANG_IDS,
    )
    bt = BatchedTranscriber(model, max_streams=4)
    handles = [
        bt.blocking_start(Settings(source=SyntheticSource(
            sample_rate=16_000, channels=1, dtype=np.float32,
            freq=220.0 + 110 * i, noise=0.02, duration=1.2,
            realtime=False, seed=i,
        )))
        for i in range(3)
    ]
    time.sleep(0.5)
    for h in handles:
        h.stop()
    texts = []
    for h in handles:
        texts.append(list(h.receiver))
    bt.close()
    assert all(isinstance(t, str) for ts in texts for t in ts)
    assert engine.last_spec_rounds is not None


# ---- spec_k="auto" adaptation ----------------------------------------------


def test_spec_auto_k_controller_rules():
    """The controller walks _K_CHOICES from the acceptance ratio: high
    acceptance escalates (more tokens per target weight stream), low
    acceptance de-escalates (less wasted drafting), silence (no
    telemetry) holds."""
    cfg, _, spec = _engines(0, spec_k="auto")
    assert spec.auto_k and spec.spec_k == 4

    # Full acceptance at K=4: tokens/round == K+1 => ratio 1.0 >= _K_UP.
    spec.last_tokens_per_round = 5.0
    spec._adapt_spec_k()
    assert spec.spec_k == 8
    assert spec._accept_ema is None  # ratio scale reset on switch

    # No proposals accepted at K=8: ratio 1/9 <= _K_DOWN.
    spec.last_tokens_per_round = 1.0
    spec._adapt_spec_k()
    assert spec.spec_k == 4

    # Mid acceptance holds (ratio 0.6 between the thresholds).
    spec.last_tokens_per_round = 3.0
    spec._adapt_spec_k()
    assert spec.spec_k == 4

    # Silence / inactive windows (no telemetry) hold.
    spec.last_tokens_per_round = None
    spec._adapt_spec_k()
    assert spec.spec_k == 4

    # Clamped at the ladder ends.
    spec.spec_k = spec._K_CHOICES[-1]
    spec._accept_ema = None
    spec.last_tokens_per_round = float(spec._K_CHOICES[-1] + 1)
    spec._adapt_spec_k()
    assert spec.spec_k == spec._K_CHOICES[-1]
    spec.spec_k = spec._K_CHOICES[0]
    spec._accept_ema = None
    spec.last_tokens_per_round = 1.0
    spec._adapt_spec_k()
    assert spec.spec_k == spec._K_CHOICES[0]


def test_spec_auto_k_ema_smoothing():
    """One noisy low-acceptance window must NOT flip K down when the
    running EMA is healthy (the EMA halves the step toward the new
    ratio, so 0.5*0.96 + 0.5*0.2 = 0.58 > _K_DOWN)."""
    cfg, _, spec = _engines(0, spec_k="auto")
    spec.spec_k = 8
    spec._accept_ema = 0.96
    spec.last_tokens_per_round = 1.8  # ratio 0.2, transiently bad
    spec._adapt_spec_k()
    assert spec.spec_k == 8  # held
    spec._adapt_spec_k()  # persistently bad: EMA decays below _K_DOWN
    spec._adapt_spec_k()
    assert spec.spec_k == 4


def test_spec_auto_k_fixed_engine_never_adapts():
    cfg, _, spec = _engines(0)  # default fixed spec_k=4
    assert not spec.auto_k
    audio = _window(60, cfg)
    spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
    assert spec.spec_k == 4


def test_spec_auto_k_escalates_and_stays_exact():
    """End to end: a self-draft (100% acceptance) escalates K across
    windows, and every window's committed output — across the K switch
    and its program recompile — still equals the plain engine's greedy
    decode (K is a pure performance knob)."""
    cfg = tiny_config()
    params = init_params(cfg, seed=5)
    plain = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS
    )
    spec = SpeculativeEngine(
        params, cfg, params, cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, spec_k="auto",
    )
    k_seen = set()
    for i in range(3):
        audio = _window(60 + i, cfg)
        out_p, _ = plain.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
        out_s, _ = spec.transcribe_window(audio, [TEST_LANG_IDS[0]], seed=0)
        k_seen.add(spec.last_spec_k)
        r = out_p[0]
        if r is None or (
            not np.isnan(r.avg_logprob) and r.avg_logprob < LOGPROB_THRESHOLD
        ):
            continue
        _cmp_results(r, out_s[0])
    # Self-draft acceptance is ~full, so at least one escalation fired.
    assert len(k_seen) >= 2, k_seen
    assert spec.spec_k > 4


def test_warmup_compiles_fallback_program():
    """WhisperModel.warmup must also trace the speculative engine's t>0
    fallback program: silence never reaches it (no-speech gate), so without
    warmup_fallback the first live window failing the logprob gate would
    stall on a mid-utterance compile."""
    from helpers import ToyTokenizer
    from norma_tpu.decode import LanguageState
    from norma_tpu.models.whisper.model import WhisperModel

    cfg = tiny_config()
    params = init_params(cfg, seed=5)
    spec = SpeculativeEngine(
        params, cfg, params, cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, spec_k=2,
    )
    # Direct call executes the program end to end (shape/dtype sanity).
    spec.warmup_fallback()

    called = []
    orig = spec.warmup_fallback
    spec.warmup_fallback = lambda *a, **k: (called.append(1), orig(*a, **k))[1]
    model = WhisperModel(
        spec, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0])
    )
    model.warmup()
    assert called, "warmup() did not invoke warmup_fallback()"


@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_bucketed_matches_unbucketed(spec_k):
    """A decode_buckets config on a SPECULATIVE engine must stay
    result-identical to the unbucketed one: the greedy loop ignores the
    buckets by design (the bucketed chain measured +9.5% on chip and was
    removed — PERF.md "Bucketed decode"), and the t>0 fallback rungs,
    which do inherit them through _token_loop, are bitwise-identical by
    the plain-loop bucket tests."""
    cfg = tiny_config()
    params = init_params(cfg, seed=4)
    dcfg = _draft_cfg()
    dparams = init_params(dcfg, seed=104)
    kw = dict(language_token_ids=TEST_LANG_IDS, spec_k=spec_k)
    spec = SpeculativeEngine(params, cfg, dparams, dcfg, TEST_ST, **kw)
    spec_b = SpeculativeEngine(
        params, cfg.with_(decode_buckets=(16, 32)), dparams, dcfg,
        TEST_ST, **kw,
    )
    B = 2
    audio = _window(91, cfg, b=B)
    langs = [TEST_LANG_IDS[0]] * B
    out, _ = spec.transcribe_window(audio, langs, seed=5)
    out_b, _ = spec_b.transcribe_window(audio, langs, seed=5)
    for a, b in zip(out, out_b):
        _cmp_results(a, b)
