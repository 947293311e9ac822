"""In-context device-time A/B of encoder attention impls + QKV fusion.

Round-3 experiment for VERDICT item 1 (recover the flash-encoder win in
context) and item 3 (decoder GEMV fusion): profiles the PRODUCTION window
program (DecodeEngine.transcribe_window — mel -> encoder -> prefill ->
full temperature ladder, forced 132-token decode) at B=1 and B=8 for each
variant, reporting per-program DEVICE time from xplane traces (the only
trustworthy comparison on the tunneled TPU; PERF.md methodology).

Run ON TPU:  python tools/perf_encoder_ab.py [variant ...]
(w8a8* variants — the int8-MXU encoder — are opt-in by name:
 python tools/perf_encoder_ab.py xla w8a8 w8a8_jf)
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
    from norma_tpu.tracing import device_time_report, profiled_device_ms

    base_cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    raw = init_params(base_cfg, seed=0, dtype=jnp.bfloat16)
    fused = jax.device_put(fuse_qkv(raw), jax.devices()[0])
    raw = jax.device_put(raw, jax.devices()[0])

    rng = np.random.default_rng(0)
    a1 = jnp.asarray(
        prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
    )[None]
    a8 = jnp.tile(a1, (8, 1))

    VARIANTS = {
        "unfused_xla": (raw, {}),
        "xla": (fused, {}),
        "xla_bf16s": (fused, {"encoder_scores_bf16": True}),
        "chunked250": (fused, {"encoder_attn_impl": "chunked"}),
        "chunked500": (
            fused,
            {"encoder_attn_impl": "chunked", "encoder_attn_chunk": 500},
        ),
        "flash": (fused, {"encoder_attn_impl": "flash"}),
        "jax_flash512": (fused, {"encoder_attn_impl": "jax_flash"}),
        "flash_unroll4": (
            fused,
            {"encoder_attn_impl": "flash", "encoder_unroll": 4},
        ),
        # Block-size sweep around the 512x512 winner.
        "jf_q768_k768": (
            fused,
            {"encoder_attn_impl": "jax_flash", "flash_block_q": 768,
             "flash_block_k": 768},
        ),
        "jf_q1536_k512": (
            fused,
            {"encoder_attn_impl": "jax_flash", "flash_block_q": 1536,
             "flash_block_k": 512},
        ),
        "jf_q512_k1536": (
            fused,
            {"encoder_attn_impl": "jax_flash", "flash_block_q": 512,
             "flash_block_k": 1536},
        ),
        "jf_q256_k512": (
            fused,
            {"encoder_attn_impl": "jax_flash", "flash_block_q": 256,
             "flash_block_k": 512},
        ),
        "jf_q1536_k1536": (
            fused,
            {"encoder_attn_impl": "jax_flash", "flash_block_q": 1536,
             "flash_block_k": 1536},
        ),
        "jf_unroll4": (
            fused,
            {"encoder_attn_impl": "jax_flash", "encoder_unroll": 4},
        ),
    }
    pick = sys.argv[1:] or list(VARIANTS)

    # w8a8 encoder (quantize_encoder): int8-MXU projections.  Lazily built
    # (the int8 re-pack of 32 layers takes a few seconds) only when picked.
    W8A8 = {
        "w8a8": {},
        "w8a8_bf16s": {"encoder_scores_bf16": True},
        "w8a8_jf": {"encoder_attn_impl": "jax_flash"},
        "w8a8_chunked": {"encoder_attn_impl": "chunked"},
        # Same int8 storage, bf16 compute: isolates the int8-MXU effect
        # (w8a8 vs w8a16 differ ONLY by the matmul mode) and is the
        # fallback if the backend's int8 dot lowering disappoints.
        "w8a16_enc": {"encoder_q8_mode": "w8a16"},
        # Explicit Pallas int8 tiles (Plan B if XLA's s8 dot is not
        # native; tools/perf_int8_mxu.py decides which to trust).
        "w8a8_pallas": {"encoder_q8_mode": "w8a8_pallas"},
    }
    # Fail fast on typos BEFORE any variant burns scarce hardware time: a
    # KeyError after profiling half the list would lose the final table.
    unknown = [n for n in pick if n not in VARIANTS and n not in W8A8]
    if unknown:
        sys.exit(
            f"unknown variant(s) {unknown}; known: "
            f"{sorted(set(VARIANTS) | set(W8A8))}"
        )

    if any(n in W8A8 for n in pick):
        from norma_tpu.model.quant import quantize_encoder

        enc8 = jax.device_put(quantize_encoder(fused), jax.devices()[0])
        for n, over in W8A8.items():
            VARIANTS[n] = (enc8, over)

    results = {}
    for name in pick:
        params, over = VARIANTS[name]
        cfg = base_cfg.with_(**over)
        engine = DecodeEngine(params, cfg, st)
        row = {}
        for bname, audio in (("B1", a1), ("B8", a8)):
            B = audio.shape[0]
            t0 = time.perf_counter()
            engine.transcribe_window(audio, [50259] * B, seed=0)  # compile
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                engine.transcribe_window(audio, [50259] * B, seed=0)
                walls.append(time.perf_counter() - t0)
            tdir = f"/tmp/enc_ab/{name}_{bname}"
            # The headline total goes through tracing.profiled_device_ms —
            # the SAME measurement path as bench.py, so the A/B's numbers
            # and the scored artifact's are directly comparable — and the
            # per-module attribution re-reads the same trace.
            total_ms, _ = profiled_device_ms(
                lambda: engine.transcribe_window(audio, [50259] * B, seed=0),
                2,
                tdir,
            )
            mods = device_time_report(tdir, "XLA Modules")
            dev = {
                k: round(total / max(n, 1), 2)
                for k, (total, n) in mods.items()
                if total > 1.0
            }
            row[bname] = {
                "wall_ms": round(min(walls) * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "device_ms_per_window": round(total_ms, 2),
                "device_ms_per_call": dev,
            }
            print(json.dumps({name: {bname: row[bname]}}), flush=True)
        results[name] = row

    print("==== FINAL ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
