"""Bucketed decode (cfg.decode_buckets, r5 — VERDICT r4 #3).

The token loop runs as a chain of per-bucket while_loops over growing
cache crops so early tokens read fill-proportional self-KV.  Results must
be BITWISE identical to the unbucketed loop: cropped-away rows are masked
(-inf) in the unbucketed program and contribute exact zeros, so every
reduction sees the same values.
"""

import numpy as np
import pytest

from helpers import TEST_LANG_IDS, TEST_ST, tiny_config
from norma_tpu.decode import DecodeEngine
from norma_tpu.frontend.mel import prepare_audio
from norma_tpu.model import init_params


def _window(engine, B, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n_frames = 2 * engine.cfg.max_source_positions
    aud = np.stack(
        [
            prepare_audio(
                (0.2 * rng.standard_normal(12_000)).astype(np.float32),
                n_frames=n_frames,
            )
            for _ in range(B)
        ]
    )
    drs, _ = engine.transcribe_window(
        jnp.asarray(aud), [TEST_LANG_IDS[0]] * B, seed=seed
    )

    def key(d):
        if d is None:
            return None
        # repr-normalize so nan == nan compares equal (a grammar-deadlock
        # NaN avg_logprob is a legitimate pinned value).
        return (d.tokens, repr(round(d.avg_logprob, 6)))

    return [key(d) for d in drs]


def _engines(buckets, **engine_kw):
    cfg = tiny_config()  # mtp=48
    params = init_params(cfg, seed=3)
    base = DecodeEngine(
        params, cfg, TEST_ST, language_token_ids=TEST_LANG_IDS, **engine_kw
    )
    bucketed = DecodeEngine(
        params, cfg.with_(decode_buckets=buckets), TEST_ST,
        language_token_ids=TEST_LANG_IDS, **engine_kw,
    )
    return base, bucketed


@pytest.mark.parametrize("B", [1, 4])  # speculative arm / sequential arm
def test_bucketed_matches_unbucketed(B):
    base, bucketed = _engines((16, 32))
    assert _window(bucketed, B) == _window(base, B)


def test_bucketed_with_int8_self_kv():
    base, bucketed = _engines((16, 32), quantize_self_kv=True)
    assert _window(bucketed, 2) == _window(base, 2)


def test_bucketed_with_self_kernel_interpret(monkeypatch):
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")
    cfg = tiny_config(
        d_model=128, decoder_attention_heads=2, encoder_attention_heads=2
    )
    params = init_params(cfg, seed=3)
    kw = dict(language_token_ids=TEST_LANG_IDS)
    base = DecodeEngine(
        params, cfg.with_(self_kv_impl="kernel"), TEST_ST, **kw
    )
    bucketed = DecodeEngine(
        params, cfg.with_(self_kv_impl="kernel", decode_buckets=(16, 32)),
        TEST_ST, **kw,
    )
    assert _window(bucketed, 2) == _window(base, 2)


def test_degenerate_buckets_ignored():
    # Buckets at/above mtp are filtered (one config can serve several
    # mtp variants); the chain degrades to the plain loop rather than
    # tracing an empty span.  Nonsense values (<= 0, non-int) raise at
    # engine construction.
    base, bucketed = _engines((48, 96))
    assert _window(bucketed, 1) == _window(base, 1)
    with pytest.raises(ValueError):
        _engines((0, 16))


def test_run_loop_compositional_path():
    import jax.numpy as jnp

    base, bucketed = _engines((16, 32))
    rng = np.random.default_rng(7)
    n_frames = 2 * base.cfg.max_source_positions
    aud = jnp.asarray(
        prepare_audio(
            (0.2 * rng.standard_normal(12_000)).astype(np.float32),
            n_frames=n_frames,
        )
    )[None]
    s1 = base.prefill_window(aud, TEST_LANG_IDS[0])
    s2 = bucketed.prefill_window(aud, TEST_LANG_IDS[0])
    r1 = base.run_loop(s1, 0.0, seed=0)[0]
    r2 = bucketed.run_loop(s2, 0.0, seed=0)[0]
    assert r1.tokens == r2.tokens
    assert abs(r1.avg_logprob - r2.avg_logprob) < 1e-6
