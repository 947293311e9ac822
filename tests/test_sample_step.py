"""Fused grammar+sampling kernel vs its jnp semantics oracle.

The Pallas kernel (norma_tpu/ops/sample_step.py) runs in interpret mode
here (CPU); the hardware run is covered by tools/verify_kernels.py.  Greedy
(t=0) must be token-exact and prob-exact vs sample_step_jnp across the
grammar's regimes; t>0 draws share only the law (different PRNG), so the
sampled token must respect the mask support.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TEST_ST, tiny_config
from norma_tpu.decode.masks import build_masks
from norma_tpu.ops.sample_step import sample_step_jnp, sample_step_pallas

CFG = tiny_config()
ST = TEST_ST
MASKS = build_masks(CFG.vocab_size, CFG.suppress_tokens, ST)


def _masks():
    return (
        jnp.asarray(MASKS.suppress),
        jnp.asarray(MASKS.non_timestamps),
        jnp.asarray(MASKS.timestamps),
        jnp.asarray(MASKS.first_token),
    )


def _run(fn, ll, p1, p2, lts, step, temp, **kw):
    B = ll.shape[0]
    ms, mn, mt, mf = _masks()
    return fn(
        jnp.asarray(ll),
        ms, mn, mt, mf,
        jnp.asarray(p1, jnp.int32),
        jnp.asarray(p2, jnp.int32),
        jnp.asarray(lts, jnp.int32),
        jnp.int32(step),
        jnp.full((B,), temp, jnp.float32),
        **kw,
        eot=ST.eot,
        no_timestamps=ST.no_timestamps,
    )


def _interp():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams()


def _kernel(ll, p1, p2, lts, step, temp):
    return _run(
        sample_step_pallas, ll, p1, p2, lts, step, temp,
        seed2=jnp.asarray([1, 2], jnp.uint32), interpret=_interp(),
    )


def _oracle(ll, p1, p2, lts, step, temp):
    return _run(
        sample_step_jnp, ll, p1, p2, lts, step, temp,
        key=jax.random.PRNGKey(0),
    )


CASES = [
    # (p1, p2, last_ts, step) covering: first token, text-after-ts pair
    # rule, ts-after-special, sum-vs-max rule, past-ts monotonicity.
    (ST.task, ST.sot, 0, 0),
    (ST.zero_sec + 1, ST.eot + 5, 0, 1),      # last is ts, second text
    (ST.zero_sec + 2, ST.sot, 0, 2),          # last is ts, second special
    (100, 101, 0, 3),                          # both text
    (100, ST.zero_sec + 3, ST.zero_sec + 3, 4),  # past-ts masking active
    # GRAMMAR DEADLOCK: last is the top timestamp with text penultimate —
    # the unpaired rule demands a STRICTLY GREATER ts (none exists) and
    # masks text, so the whole vocab is -inf.  Greedy must pick V-1
    # (the reference's max_by takes the LAST equal maximum) and t>0 must
    # push EOT — both pinned vs the jnp twin by the cases loop.
    (CFG.vocab_size - 1, 100, CFG.vocab_size - 1, 5),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_greedy_token_exact(case):
    p1, p2, lts, step = CASES[case]
    rng = np.random.default_rng(case)
    for trial in range(3):
        ll = rng.normal(0, 2, (2, CFG.vocab_size)).astype(np.float32)
        nk, pk, nank = _kernel(ll, [p1] * 2, [p2] * 2, [lts] * 2, step, 0.0)
        no, po, nano = _oracle(ll, [p1] * 2, [p2] * 2, [lts] * 2, step, 0.0)
        np.testing.assert_array_equal(np.asarray(nk), np.asarray(no))
        np.testing.assert_allclose(
            np.asarray(pk), np.asarray(po), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(nank), np.asarray(nano))


def test_nan_logits_flagged():
    ll = np.full((1, CFG.vocab_size), np.nan, np.float32)
    nk, pk, nank = _kernel(ll, [100], [101], [0], 3, 0.2)
    no, po, nano = _oracle(ll, [100], [101], [0], 3, 0.2)
    assert bool(nank[0]) and bool(nano[0])
    # t>0 with NaN weights forces EOT on both paths (model.rs:343-346).
    assert int(nk[0]) == int(no[0]) == ST.eot


def test_deadlock_semantics_match_reference():
    """All--inf deadlock: greedy picks V-1 (Rust max_by's last-of-equals),
    t>0 pushes EOT with the deadlock flag set — kernel == jnp twin ==
    the reference's model.rs:342-357 behavior."""
    V = CFG.vocab_size
    rng = np.random.default_rng(9)
    ll = rng.normal(0, 2, (2, V)).astype(np.float32)
    p1, p2, lts = [V - 1] * 2, [100] * 2, [V - 1] * 2
    for fn, kw in ((sample_step_jnp, dict(key=jax.random.PRNGKey(0))),
                   (sample_step_pallas,
                    dict(seed2=jnp.asarray([1, 2], jnp.uint32),
                         interpret=_interp()))):
        nk, pk, flag = _run(fn, ll, p1, p2, lts, 5, 0.0, **kw)
        assert np.asarray(flag).all(), "deadlock not flagged"
        assert (np.asarray(nk) == V - 1).all(), np.asarray(nk)
        nk2, _, flag2 = _run(fn, ll, p1, p2, lts, 5, 0.4, **kw)
        assert np.asarray(flag2).all()
        assert (np.asarray(nk2) == ST.eot).all(), np.asarray(nk2)


def test_sampling_respects_mask_support():
    p1, p2, lts, step = ST.task, ST.sot, 0, 0  # first token: ts-only support
    rng = np.random.default_rng(7)
    ll = rng.normal(0, 2, (4, CFG.vocab_size)).astype(np.float32)
    lo = np.asarray(jnp.asarray(MASKS.first_token))
    allowed = np.where(np.isfinite(lo))[0]
    for seed in range(5):
        nk, _, _ = _run(
            sample_step_pallas, ll, [p1] * 4, [p2] * 4, [lts] * 4, step, 0.8,
            seed2=jnp.asarray([seed, 11], jnp.uint32), interpret=_interp(),
        )
        assert np.isin(np.asarray(nk), allowed).all()


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret-mode PRNG is deterministic zeros; needs real TPU",
)
def test_per_row_independent_draws():
    """Same logits in every row must not produce identical draws (the
    kernel seeds on (key, step, row))."""
    rng = np.random.default_rng(3)
    row = rng.normal(0, 1, CFG.vocab_size).astype(np.float32)
    ll = np.tile(row, (8, 1))
    nk, _, _ = _run(
        sample_step_pallas, ll, [100] * 8, [101] * 8, [0] * 8, 3, 1.0,
        seed2=jnp.asarray([5, 6], jnp.uint32),
    )
    assert len(set(np.asarray(nk).tolist())) > 1


@pytest.mark.parametrize("case", range(len(CASES)))
def test_greedy_only_variant_matches_full_pipeline(case):
    """greedy_only=True (the speculative loop's statically-greedy call)
    must be bit-identical to the full pipeline at temp=0 — in the jnp twin
    AND the Pallas kernel (whose PRNG/Gumbel section is compiled out)."""
    p1, p2, lts, step = CASES[case]
    rng = np.random.default_rng(1000 + case)
    ll = rng.normal(0, 2, (2, CFG.vocab_size)).astype(np.float32)
    for fn, kw in (
        (sample_step_jnp, dict(key=jax.random.PRNGKey(0))),
        (
            sample_step_pallas,
            dict(seed2=jnp.asarray([1, 2], jnp.uint32), interpret=_interp()),
        ),
    ):
        full = _run(fn, ll, [p1] * 2, [p2] * 2, [lts] * 2, step, 0.0, **kw)
        gonly = _run(
            fn, ll, [p1] * 2, [p2] * 2, [lts] * 2, step, 0.0,
            greedy_only=True, **kw,
        )
        for a, b in zip(full, gonly):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
