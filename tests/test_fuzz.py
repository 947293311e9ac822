"""Property-based fuzzing.

The round-1 hunt found three distinct decode-output shapes on which the
reference's drain loop never terminates.  These properties pin the fix
class wholesale: for ARBITRARY decoder output, the long-form state machine
must terminate, never grow the buffer, and keep the time offset consistent
with consumed audio.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from helpers import TEST_LANG_IDS, TEST_ST, ToyTokenizer, tiny_config
from norma_tpu.decode.engine import DecodingResult
from norma_tpu.decode.longform import LanguageState, LongFormDecoder
from norma_tpu.utils import inclusive_segments

S = TEST_ST
PREFIX = [S.sot, TEST_LANG_IDS[0], S.task]


# --- arbitrary (even invalid) decoder outputs ------------------------------

token_strat = st.one_of(
    st.integers(0, 899),  # text
    st.just(S.eot),
    st.integers(S.zero_sec, 999),  # timestamps
    st.just(S.no_timestamps),
)
tokens_strat = st.lists(token_strat, min_size=0, max_size=24)


class ScriptedEngine:
    def __init__(self, results):
        self.cfg = tiny_config()
        self.st = S
        self.results = list(results)
        self.calls = 0

    def decode_with_fallback_windowed(self, audio, lang, seed):
        self.calls += 1
        if not self.results:
            return None  # quality-gate everything once the script runs out
        return self.results.pop(0)

    def transcribe_window(self, audio, langs, seed):
        """Fused-path surface: one scripted result per window."""
        dr = self.decode_with_fallback_windowed(audio, langs[0], seed)
        import numpy as np

        return [dr], {"langs": np.asarray(langs), "lang_probs": None}


@settings(max_examples=150, deadline=None)
@given(
    data=st.data(),
    n_results=st.integers(0, 6),
    buf_samples=st.integers(1, 30_000),
    final=st.booleans(),
)
def test_transcribe_always_terminates(data, n_results, buf_samples, final):
    results = []
    for _ in range(n_results):
        toks = data.draw(tokens_strat)
        results.append(
            DecodingResult(
                tokens=PREFIX + toks,
                avg_logprob=data.draw(st.floats(-5, 1)),
                no_speech_prob=data.draw(st.floats(0, 1)),
            )
        )
    eng = ScriptedEngine(results)
    lf = LongFormDecoder(eng, ToyTokenizer(), LanguageState(const=TEST_LANG_IDS[0]))
    audio = np.zeros(buf_samples, np.float32)

    out = lf.transcribe(audio, final_chunk=final)

    assert isinstance(out, str)
    # Termination bound: every decode must consume audio or pause, so the
    # engine can never be called more than ceil(buf/min_drain) + len(script).
    assert eng.calls <= buf_samples // 320 + len(results) + 2
    # Audio conservation: consumed + retained == fed.
    consumed = round(lf.time_offset_s * 16_000)
    assert consumed + lf.buf.size == buf_samples
    if final and eng.calls > 0 and not (lf.buf.size and eng.results == []):
        pass  # final chunks drain unless the decode paused legitimately


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=0, max_size=40))
def test_inclusive_segments_properties(xs):
    pred = lambda v: v >= 20
    segs = list(inclusive_segments(xs, pred))
    flat = [v for s in segs for v in s]
    # each segment opens and closes on a boundary
    for s in segs:
        assert pred(s[0]) and pred(s[-1]) and len(s) >= 2
    # segments are non-overlapping, in-order slices of xs
    i = 0
    for s in segs:
        # find s within xs starting at i
        for j in range(i, len(xs) - len(s) + 1):
            if list(xs[j : j + len(s)]) == list(s):
                i = j + len(s)
                break
        else:
            raise AssertionError("segment is not an in-order slice")
    # boundary count bound: each segment consumes exactly 2 boundaries
    n_bounds = sum(1 for v in xs if pred(v))
    assert len(segs) <= n_bounds // 2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(1, 5_000), min_size=1, max_size=20),
    st.integers(100, 4_000),
)
def test_packer_conserves_samples(block_sizes, chunk_len):
    from norma_tpu.audio.pipeline import Packer
    from norma_tpu.runtime.channels import RecycledRing

    ring = RecycledRing(10_000, chunk_len)
    p = Packer(ring)
    total = 0
    val = 0.0
    for n in block_sizes:
        p.append(np.full(n, val, np.float32))
        total += n
        val += 1.0
    p.close()
    ring.close()
    got = 0
    finals = 0
    while (c := ring.recv()) is not None:
        got += c.length
        finals += int(c.is_final)
        ring.release(c)
    # close() pops exactly one sample; every other sample is delivered
    # (ring is big enough that nothing is dropped), and exactly the last
    # chunk is short.
    assert got == total - 1
    assert finals >= 1
    assert ring.dropped == 0


# --- differential grammar fuzz: Pallas kernel vs jnp twin -------------------

_grammar_state = st.tuples(
    st.one_of(  # prev1: text / special / timestamp
        st.integers(0, S.eot - 1),
        st.integers(S.eot, S.no_timestamps),
        st.integers(S.no_timestamps + 1, 999),
    ),
    st.one_of(  # prev2
        st.integers(0, S.eot - 1),
        st.integers(S.eot, S.no_timestamps),
        st.integers(S.no_timestamps + 1, 999),
    ),
    st.one_of(st.just(0), st.integers(S.no_timestamps + 1, 999)),  # last_ts
    st.integers(0, 6),  # step (0 selects the first-token mask)
)


@settings(max_examples=25, deadline=None)
@given(state=_grammar_state, seed=st.integers(0, 2**31 - 1))
def test_kernel_matches_twin_on_arbitrary_grammar_states(state, seed):
    """For ARBITRARY (prev1, prev2, last_ts, step) grammar states — valid
    or not — the fused Pallas kernel's greedy token, chosen prob and
    deadlock flag must equal the jnp twin's (which the branchy oracle and
    the reference pin elsewhere).  Catches mask-algebra divergence in
    state corners the enumerated CASES never visit."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from norma_tpu.decode.masks import build_masks
    from norma_tpu.ops.sample_step import sample_step_jnp, sample_step_pallas

    cfg = tiny_config()
    masks = build_masks(cfg.vocab_size, cfg.suppress_tokens, S)
    ms, mn, mt, mf = (
        jnp.asarray(masks.suppress), jnp.asarray(masks.non_timestamps),
        jnp.asarray(masks.timestamps), jnp.asarray(masks.first_token),
    )
    p1, p2, lts, step = state
    rng = np.random.default_rng(seed)
    ll = jnp.asarray(rng.normal(0, 2, (2, cfg.vocab_size)).astype(np.float32))
    args = (
        ll, ms, mn, mt, mf,
        jnp.full((2,), p1, jnp.int32), jnp.full((2,), p2, jnp.int32),
        jnp.full((2,), lts, jnp.int32), jnp.int32(step),
        jnp.zeros((2,), jnp.float32),
    )
    nk, pk, fk = sample_step_pallas(
        *args, jnp.asarray([1, 2], jnp.uint32),
        eot=S.eot, no_timestamps=S.no_timestamps,
        interpret=pltpu.InterpretParams(),
    )
    no, po, fo = sample_step_jnp(
        *args, jax.random.PRNGKey(0), eot=S.eot, no_timestamps=S.no_timestamps
    )
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(no))
    np.testing.assert_allclose(
        np.asarray(pk), np.asarray(po), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(fk, bool), np.asarray(fo, bool)
    )
