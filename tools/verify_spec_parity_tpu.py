"""Hardware verification: speculative decoding commits the TARGET's own
greedy tokens.

The SpeculativeEngine's contract (decode/speculative.py) is exact greedy
equivalence: every committed token equals what the plain DecodeEngine's
t=0 rung would have chosen.  CPU f32 oracle tests pin this at B=1 and
B=3 (tests/test_speculative.py); this tool re-checks it on the real TPU
in BOTH dtypes, because the two engines score positions through
different matmul shapes (one chunked (K+1)-wide verify forward vs one
position per step) and accumulation order differs on hardware:

  - f32: expect EXACT token parity (the chunked/step difference is far
    below f32 noise) — a logic bug would show here.
  - bf16: on RANDOM weights expect mid-sequence divergence — near-
    uniform logits flip argmax under ~1e-3 accumulation noise (the same
    knife-edge the encoder_scores_bf16 gate measured).  The tool prints
    the divergence point; a common prefix of only 3 (the forced prefix)
    or a f32 mismatch would indicate a real bug.  On real (peaked)
    checkpoints bf16 parity is expected in practice.

Measured (2026-08-17, v5e, lv3+distil dims @ mtp=40): f32 40/40 exact;
bf16 diverges at token 6 on a text token.  PERF.md "token parity on
hardware".

Run ON TPU:  python tools/verify_spec_parity_tpu.py [max_positions=40]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine, SpeculativeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, init_params

    mtp = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    tcfg = PRESETS["large-v3"].with_(max_target_positions=mtp)
    dcfg = PRESETS["distil-large-v3"].with_(max_target_positions=mtp)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    mel1 = jnp.asarray(
        prepare_audio(
            (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
        )
    )[None]

    ok = True
    for dtype in (jnp.bfloat16, jnp.float32):
        tgt = jax.device_put(init_params(tcfg, seed=0, dtype=dtype), dev)
        draft = jax.device_put(init_params(dcfg, seed=7, dtype=dtype), dev)
        plain = DecodeEngine(tgt, tcfg, st)
        out_p, _ = plain.transcribe_window(mel1, [50259], seed=0)
        spec = SpeculativeEngine(tgt, tcfg, draft, dcfg, st, spec_k=4)
        out_s, _ = spec.transcribe_window(mel1, [50259], seed=0)
        if out_p[0] is None or out_s[0] is None:
            # No-result window (every rung rejected): print a verdict
            # instead of crashing on .tokens, and fail only on asymmetry
            # (one engine produced a result, the other didn't).
            sym = (out_p[0] is None) == (out_s[0] is None)
            print(json.dumps({
                "dtype": dtype.__name__,
                "no_result": True,
                "symmetric": sym,
            }), flush=True)
            if not sym:
                ok = False
            continue
        pt, stoks = out_p[0].tokens, out_s[0].tokens
        npfx = 0
        for a, b in zip(pt, stoks):
            if a != b:
                break
            npfx += 1
        parity = pt == stoks
        print(
            json.dumps(
                {
                    "dtype": dtype.__name__,
                    "parity": parity,
                    "n_plain": len(pt),
                    "n_spec": len(stoks),
                    "common_prefix": npfx,
                    "plain_at_div": pt[npfx:npfx + 3],
                    "spec_at_div": stoks[npfx:npfx + 3],
                }
            ),
            flush=True,
        )
        if dtype == jnp.float32 and not parity:
            ok = False  # logic bug: f32 must match exactly
        if npfx <= 3:
            ok = False  # diverging inside the forced prefix is a bug
        del plain, spec, tgt, draft

    print("VERIFY-SPEC-PARITY " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
