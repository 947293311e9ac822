"""Benchmark: distil-large-v3 streaming real-time factor on one TPU chip.

Measures the per-30s-window compute of the flagship model (distil-large-v3
dimensions, bf16, random weights — checkpoints are not downloadable in this
environment and RTF is weight-independent):

  window = log-mel + encoder forward + cross-KV + 3-token prefill
  step   = one grammar-masked sampling step + incremental decoder step

RTF = (t_window + TOKENS_PER_WINDOW * t_step) / 30s, with a conservative
100 tokens per 30s window (real speech decodes 60-100 incl. timestamps).

Baseline (BASELINE.md): target RTF <= 0.05 (>= 20x real-time) per stream.
``vs_baseline`` reports target/actual, so > 1.0 beats the target.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_FRAMES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import log_mel_spectrogram
    from norma_tpu.model import PRESETS, init_params
    from norma_tpu.model.whisper import cross_kv, decoder_prefill, decoder_step, encode

    cfg = PRESETS["distil-large-v3"]
    dtype = jnp.bfloat16
    params = init_params(cfg, seed=0, dtype=dtype)
    params = jax.device_put(params, jax.devices()[0])

    st = SpecialTokens(
        sot=50258, eot=50257, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    engine = DecodeEngine(params, cfg, st)

    B = 1
    audio = jnp.zeros((B, (N_FRAMES - 1) * 160 + 400), jnp.float32)
    prefix = jnp.asarray(np.tile([[st.sot, 50259, st.task]], (B, 1)), jnp.int32)

    @jax.jit
    def window_fn(params, audio, prefix):
        mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
        feats = encode(params, cfg, mel)
        xk, xv = cross_kv(params, cfg, feats)
        logits, ck, cv = decoder_prefill(params, cfg, prefix, xk, xv)
        return logits[:, -1], ck, cv, xk, xv

    K = 32  # chained steps per timing call

    @jax.jit
    def steps_fn(params, ll, ck, cv, xk, xv):
        def body(i, carry):
            ll, ck, cv, key = carry
            probs = jax.nn.softmax(ll, axis=-1)
            masked = engine._grammar_mask_step(
                probs,
                jnp.full((B,), st.task, jnp.int32),
                jnp.full((B,), st.sot, jnp.int32),
                jnp.zeros((B,), jnp.int32),
                i == 0,
            )
            nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            ll2, ck, cv = decoder_step(params, cfg, nxt, 3 + i, ck, cv, xk, xv)
            return ll2, ck, cv, key

        ll, ck, cv, _ = jax.lax.fori_loop(
            0, K, body, (ll, ck, cv, jax.random.PRNGKey(0))
        )
        return ll

    # Warmup / compile.
    ll, ck, cv, xk, xv = window_fn(params, audio, prefix)
    jax.block_until_ready(ll)
    jax.block_until_ready(steps_fn(params, ll, ck, cv, xk, xv))

    def timeit(f, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        return best

    t_window = timeit(lambda: window_fn(params, audio, prefix))
    t_steps = timeit(lambda: steps_fn(params, ll, ck, cv, xk, xv))
    t_step = t_steps / K

    tokens_per_window = 100
    window_total = t_window + tokens_per_window * t_step
    rtf = window_total / 30.0
    target = 0.05

    print(
        json.dumps(
            {
                "metric": "rtf_distil_large_v3_stream",
                "value": round(rtf, 6),
                "unit": "rtf (lower is better; 30s window compute / 30s)",
                "vs_baseline": round(target / rtf, 2),
                "detail": {
                    "t_window_ms": round(t_window * 1e3, 2),
                    "t_step_ms": round(t_step * 1e3, 3),
                    "tokens_per_window": tokens_per_window,
                    "realtime_streams_per_chip": int(1.0 / rtf),
                    "device": str(jax.devices()[0]),
                    "dtype": "bfloat16",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
