"""TPU perf probe: fused vs compositional window decode, flash A/B.

Interleaved same-process measurements (the only trustworthy comparison
through the axon tunnel, PERF.md "Measured"): each round times one window
of every variant in random order; report per-variant minima and medians.

Run ON TPU (no JAX_PLATFORMS override):  python tools/perf_probe.py
"""

import json
import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine, LanguageState, LongFormDecoder
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, init_params

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    params = jax.device_put(params, jax.devices()[0])

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    engine = DecodeEngine(params, cfg, st)

    rng = np.random.default_rng(0)
    audio_np = (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
    audio = jnp.asarray(prepare_audio(audio_np))[None]
    audio8 = jnp.asarray(
        np.stack([prepare_audio(audio_np)] * 8)
    )

    class _NullTok:
        def decode(self, ids, skip_special_tokens=True):
            return ""

    def run_compositional():
        state = engine.prefill_window(audio, 50259)
        engine.run_loop(state, 0.0, seed=0)

    def run_fused():
        engine.transcribe_window(audio, [50259], seed=0)

    def run_fused8():
        engine.transcribe_window(audio8, [50259] * 8, seed=0)

    def run_production():
        LongFormDecoder(engine, _NullTok(), LanguageState(const=50259)).transcribe(
            audio_np, final_chunk=True
        )

    variants = {
        "compositional": run_compositional,
        "fused": run_fused,
        "fused_b8": run_fused8,
        "production": run_production,
    }

    # Warmup/compile all.
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s")

    times = {k: [] for k in variants}
    order = list(variants)
    for round_i in range(7):
        rng.shuffle(order)
        for name in order:
            t0 = time.perf_counter()
            variants[name]()
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        out[name] = {
            "min_ms": round(min(ts) * 1e3, 1),
            "median_ms": round(statistics.median(ts) * 1e3, 1),
            "all_ms": [round(t * 1e3, 1) for t in ts],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    main()
