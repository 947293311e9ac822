"""Decode-engine tests: branchless on-device loop vs branchy numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, random_feats, tiny_config
from norma_tpu.decode.engine import DecodeEngine
from norma_tpu.model import init_params
from oracle import OracleDecoder


@pytest.fixture(scope="module", params=[0, 1, 2])
def setup(request):
    cfg = tiny_config()
    params = init_params(cfg, seed=request.param)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    oracle = OracleDecoder(params, cfg, TEST_ST)
    return cfg, params, engine, oracle, request.param


def test_greedy_matches_oracle(setup):
    cfg, params, engine, oracle, seed = setup
    feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=seed + 10))
    lang = TEST_LANG_IDS[0]

    ref_tokens, ref_alp, ref_nsp = oracle.decode(feats, lang, temperature=0.0)

    state = engine.prefill(feats, lang)
    nsp = float(state["no_speech_prob"][0])
    assert nsp == pytest.approx(ref_nsp, abs=1e-5)

    if ref_nsp > 0.6:
        pytest.skip("probe fired for this seed; covered elsewhere")

    dr = engine.run_loop(state, 0.0, seed=0)[0]
    assert dr.tokens == ref_tokens
    # NaN avg_logprob is possible with degenerate random models (grammar can
    # mask out the whole vocab); the reference produces NaN there too.
    assert dr.avg_logprob == pytest.approx(ref_alp, abs=1e-4, nan_ok=True)


def test_greedy_deterministic(setup):
    cfg, params, engine, oracle, seed = setup
    feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=seed + 20))
    state = engine.prefill(feats, TEST_LANG_IDS[0])
    a = engine.run_loop(state, 0.0, seed=1)[0]
    b = engine.run_loop(state, 0.0, seed=2)[0]
    assert a.tokens == b.tokens  # greedy ignores the seed


def test_grammar_invariants_greedy(setup):
    """Structural invariants of the timestamp grammar on the decoded tokens."""
    cfg, params, engine, oracle, seed = setup
    st = TEST_ST
    for fseed in range(4):
        feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=100 + fseed))
        state = engine.prefill(feats, TEST_LANG_IDS[0])
        if float(state["no_speech_prob"][0]) > 0.6:
            continue
        dr = engine.run_loop(state, 0.0, seed=0)[0]
        if np.isnan(dr.avg_logprob):
            # Degenerate random-model case: grammar masked the whole vocab
            # at some step (argmax over all -inf); invariants don't apply.
            continue
        toks = dr.tokens
        assert toks[0] == st.sot and toks[-1] == st.eot
        assert len(toks) <= cfg.max_target_positions
        sampled = toks[3:]
        # First sampled token forced into [<|0.00|> ..= <|1.00|>] — unless
        # the trailing double-timestamp cleanup removed it (a decode ending
        # [.., ts, eot] comes back [.., eot], so toks[3] can be EOT).
        assert sampled[0] == st.eot or st.zero_sec <= sampled[0] <= st.one_sec
        # Monotonic non-decreasing timestamps.
        ts = [t for t in sampled if t > st.no_timestamps]
        assert ts == sorted(ts)
        # Suppressed ids never sampled.
        for t in sampled:
            assert t not in cfg.suppress_tokens or t == st.eot
        # After a single timestamp, the next token is never a timestamp,
        # except timestamp pairs which are allowed (ts, ts) transitions only
        # after text... (pair structure): a timestamp following a
        # NON-special token may be followed by another timestamp.
        for i in range(1, len(sampled) - 1):
            if sampled[i] > st.no_timestamps and sampled[i - 1] <= st.no_timestamps:
                # close-timestamp: next must open a new segment (ts) or eot
                nxt = sampled[i + 1]
                assert nxt > st.no_timestamps or nxt == st.eot


def _first_token_expected(engine, state, temp: float) -> np.ndarray:
    """The oracle's first-token law: WeightedIndex over softmax(masked/t),
    masked = softmax(logits) + first_token_mask (model.rs:331-348)."""
    logits = np.asarray(state["next_logits"])[0].astype(np.float64)
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    masked = probs + np.asarray(engine._m_first)
    z = masked / temp
    e = np.exp(z - np.nanmax(np.where(np.isfinite(z), z, -np.inf)))
    e[~np.isfinite(z)] = 0.0
    return e / e.sum()


def _chisq_pvalue(counts: np.ndarray, expected_p: np.ndarray) -> float:
    """Chi-square GOF p-value, merging bins with expected count < 5."""
    scipy_stats = pytest.importorskip("scipy.stats")
    chisquare = scipy_stats.chisquare

    n = counts.sum()
    exp = expected_p * n
    big = exp >= 5
    obs = np.append(counts[big], counts[~big].sum())
    exp = np.append(exp[big], exp[~big].sum())
    keep = exp > 0
    return chisquare(obs[keep], exp[keep] * (obs[keep].sum() / exp[keep].sum())).pvalue


def test_sampling_matches_oracle_distributionally(setup):
    """t>0 sampling law (VERDICT r1 item 8): the engine's first sampled
    token must be distributed as WeightedIndex over softmax(masked/t) —
    chi-square over 500 independent draws, plus a power check proving the
    test rejects a wrong law (different temperature)."""
    cfg, params, engine, oracle, seed = setup
    feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=seed + 30))
    state = engine.prefill(feats, TEST_LANG_IDS[0])
    if float(state["no_speech_prob"][0]) > 0.6:
        pytest.skip("probe fired")
    temp = 0.2  # a real ladder rung; low t maximizes power (see below)
    n_draws = 500
    counts = np.zeros(cfg.vocab_size, np.int64)
    for s in range(n_draws):
        dr = engine.run_loop(state, temp, seed=1_000_000 + s)[0]
        first = dr.tokens[3]
        if first == TEST_ST.eot:
            # The trailing cleanup can delete the forced first timestamp
            # when the decode is [prefix, ts, eot]; such a draw carries no
            # first-token information — skip it (rare: ~1/900 per draw).
            continue
        # Sampled tokens respect the first-token mask.
        assert TEST_ST.zero_sec <= first <= TEST_ST.one_sec
        counts[first] += 1

    expected = _first_token_expected(engine, state, temp)
    assert _chisq_pvalue(counts, expected) > 1e-3

    # Power: the same draws must REJECT the plausible wrong law — sampling
    # in LOGIT space (softmax(logits/t)) instead of the reference's prob
    # space (softmax(softmax(logits)/t), model.rs:331-348).  Note t/2 in
    # prob space is NOT rejectable: dividing near-zero probabilities by t
    # barely moves the law — a faithful quirk of the reference's design.
    logits = np.asarray(state["next_logits"])[0].astype(np.float64)
    z = (logits + np.asarray(engine._m_first)) / temp
    e = np.exp(z - np.max(z[np.isfinite(z)]))
    e[~np.isfinite(z)] = 0.0
    wrong = e / e.sum()
    assert _chisq_pvalue(counts, wrong) < 1e-6


def test_detect_language(setup):
    cfg, params, engine, oracle, seed = setup
    feats = jnp.asarray(random_feats(cfg, B=2, T=16, seed=seed + 40))
    probs = engine.detect_language(feats)
    assert probs.shape == (2, len(TEST_LANG_IDS))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_batched_matches_single(setup):
    """B=2 lockstep decode == two independent B=1 decodes (greedy)."""
    cfg, params, engine, oracle, seed = setup
    f1 = random_feats(cfg, B=1, T=16, seed=seed + 50)
    f2 = random_feats(cfg, B=1, T=16, seed=seed + 60)
    both = jnp.asarray(np.concatenate([f1, f2], axis=0))
    lang = TEST_LANG_IDS[1]

    state = engine.prefill(both, lang)
    drs = engine.run_loop(state, 0.0, seed=0)

    for i, f in enumerate([f1, f2]):
        s = engine.prefill(jnp.asarray(f), lang)
        if float(s["no_speech_prob"][0]) > 0.6:
            continue
        single = engine.run_loop(s, 0.0, seed=0)[0]
        if float(state["no_speech_prob"][i]) > 0.6:
            continue
        assert drs[i].tokens == single.tokens


def test_fallback_ladder_returns(setup):
    cfg, params, engine, oracle, seed = setup
    feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=seed + 70))
    dr = engine.decode_with_fallback(feats, TEST_LANG_IDS[0], seed=0)
    # Random models may fail all gates (None) or return a result.
    if dr is not None:
        assert dr.tokens[0] == TEST_ST.sot
        assert np.isnan(dr.compression_ratio)


def test_sampler_gate_follows_params_platform(monkeypatch):
    """Mixed-backend process regression: the TPU-only fused sampler must be
    gated on the PARAMS' platform, not jax.default_backend().

    In a process whose default backend is TPU, tracing a CPU-placed
    program (exactly what the multi-chip dryrun does after entry() has
    initialized the TPU client) would otherwise select the Pallas sampler
    in a CPU lowering and fail with "Only interpret mode is supported on
    CPU backend"."""
    import jax

    cfg = tiny_config()
    params = init_params(cfg, seed=3)
    engine = DecodeEngine(params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS)
    assert engine._platform == "cpu"  # conftest forces the CPU platform

    # Simulate the mixed-backend process: global default claims "tpu"
    # while every array in the program lives on CPU.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    feats = jnp.asarray(random_feats(cfg, B=1, T=16, seed=99))
    state = engine.prefill(feats, TEST_LANG_IDS[0])
    dr = engine.run_loop(state, 0.0, seed=0)[0]  # crashes without the fix
    assert dr.tokens[0] == TEST_ST.sot
