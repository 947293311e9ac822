"""Batch-size scaling of the production window program: B = 8/16/32.

The decode loop's weight stream amortizes across batch rows while the
encoder is compute-bound (scales ~linearly), so per-stream device time
should keep improving past the benched B=8 until the encoder share
saturates it.  This probe measures where the knee is — i.e. whether the
serving scheduler's ``max_round_streams`` should default beyond 8 — on
the PRODUCTION program (DecodeEngine.transcribe_window, forced 132-token
decode), device time from xplanes (PERF.md methodology).

Run ON TPU:  python tools/perf_batch_scale.py [variant ...] [--b 8,16,32]
Variants: default, serving (jax_flash + w8 decoder + int8 cross-KV),
serving_e8 (serving + w8a8 encoder).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder, quantize_encoder
    from norma_tpu.tracing import profiled_device_ms

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bs = [8, 16, 32]
    for a in sys.argv[1:]:
        if a.startswith("--b"):
            bs = [int(x) for x in a.split("=", 1)[1].split(",")]

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    # Fail fast on typos BEFORE the (slow) param init burns hardware time.
    known = ("default", "serving", "serving_e8")
    pick = args or ["serving", "serving_e8"]
    unknown = [n for n in pick if n not in known]
    if unknown:
        sys.exit(f"unknown variant(s) {unknown}; known: {sorted(known)}")

    fused = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    dev0 = jax.devices()[0]

    def mk_default():
        return DecodeEngine(jax.device_put(fused, dev0), cfg, st)

    def mk_serving():
        return DecodeEngine(
            jax.device_put(quantize_decoder(fused), dev0),
            cfg.with_(encoder_attn_impl="jax_flash"), st,
            quantize_cross_kv=True,
        )

    def mk_serving_e8():
        return DecodeEngine(
            jax.device_put(quantize_encoder(quantize_decoder(fused)), dev0),
            cfg.with_(encoder_attn_impl="jax_flash"), st,
            quantize_cross_kv=True,
        )

    variants = {
        "default": mk_default,
        "serving": mk_serving,
        "serving_e8": mk_serving_e8,
    }

    rng = np.random.default_rng(0)
    a1 = jnp.asarray(
        prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
    )[None]

    results = {}
    for name in pick:
        engine = variants[name]()
        row = {}
        for B in bs:
            audio = jnp.tile(a1, (B, 1))
            langs = [50259] * B
            t0 = time.perf_counter()
            engine.transcribe_window(audio, langs, seed=0)  # compile
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                engine.transcribe_window(audio, langs, seed=0)
                walls.append(time.perf_counter() - t0)
            total_ms, _ = profiled_device_ms(
                lambda: engine.transcribe_window(audio, langs, seed=0),
                2, f"/tmp/batch_scale/{name}_B{B}",
            )
            row[f"B{B}"] = {
                "wall_ms": round(min(walls) * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "device_ms_per_window": round(total_ms, 2),
                "device_ms_per_stream": round(total_ms / B, 2),
                "rtf_per_stream_device": round(total_ms / 1e3 / 30.0 / B, 6),
                "realtime_streams_per_chip_device": int(30.0 / (total_ms / 1e3 / B)),
            }
            print(json.dumps({name: {f"B{B}": row[f"B{B}"]}}), flush=True)
        results[name] = row

    print("==== FINAL ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
