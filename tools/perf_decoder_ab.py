"""Device-time A/B of the decoder token loop: QKV fusion, int8 variants.

VERDICT r2 item 3: push the token loop toward its ~0.08-0.10 ms/step
weight-streaming roofline.  Profiles engine.run_loop (the compiled
while_loop alone — prefill state prepared outside the trace) for 132
forced tokens at B=1, reporting device ms/step and the top fused-op
attribution for each variant:

  - unfused  : separate q/k/v GEMVs (r2 baseline, 0.155 ms/step layer scan)
  - fused    : one [D,3,D] QKV matmul per layer (round-3 change)
  - fused_w8 : + int8 decoder weights (settling the w8 question at loop level)
  - fused_w8h: + int8 logits head only (r2's measured winner)
  - fused_w4h: + blockwise-int4 logits head (round-3, halves head bytes)

Run ON TPU:  python tools/perf_decoder_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Forced decode length is cfg-dependent (max_target_positions - 4).


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
    from norma_tpu.model.quant import (
        quantize_decoder,
        quantize_logits_head,
        quantize_logits_head_int4,
    )
    from norma_tpu.tracing import profiled_device_ms

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    raw = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    fused = fuse_qkv(raw)
    dev0 = jax.devices()[0]

    # name -> thunk of (params, engine kwargs, cfg). Thunks so unpicked
    # arms (especially the 1.55B-param lv3 ones) cost nothing to list.
    # The *448 arms run at the PRODUCTION max_target_positions, where the
    # per-step self-KV stream is ~3.3x the benched mtp=136 — the regime
    # quantize_self_kv targets; the lv3_448 arms measure it at 32 decoder
    # layers (16x the self-KV bytes of distil's 2).
    cfg448 = PRESETS["distil-large-v3"].with_(max_target_positions=448)
    cfg_lv3 = PRESETS["large-v3"].with_(max_target_positions=448)
    lv3_fused_cache = []

    def lv3_fused():
        if not lv3_fused_cache:
            lv3_fused_cache.append(
                fuse_qkv(init_params(cfg_lv3, seed=0, dtype=jnp.bfloat16))
            )
        return lv3_fused_cache[0]

    variants = {
        "unfused": lambda: (raw, {}, cfg),
        "fused": lambda: (fused, {}, cfg),
        "fused_w8": lambda: (quantize_decoder(fused), {}, cfg),
        "fused_w8h": lambda: (quantize_logits_head(fused), {}, cfg),
        "fused_w4h": lambda: (quantize_logits_head_int4(fused), {}, cfg),
        "fused_skv": lambda: (fused, {"quantize_self_kv": True}, cfg),
        "fused448": lambda: (fused, {}, cfg448),
        "fused448_skv": lambda: (fused, {"quantize_self_kv": True}, cfg448),
        "fused448_w8": lambda: (quantize_decoder(fused), {}, cfg448),
        "fused448_w8_skv": lambda: (
            quantize_decoder(fused), {"quantize_self_kv": True}, cfg448
        ),
        "lv3_448": lambda: (lv3_fused(), {}, cfg_lv3),
        "lv3_448_skv": lambda: (
            lv3_fused(), {"quantize_self_kv": True}, cfg_lv3
        ),
        "lv3_448_w8": lambda: (quantize_decoder(lv3_fused()), {}, cfg_lv3),
        "lv3_448_w8_skv": lambda: (
            quantize_decoder(lv3_fused()), {"quantize_self_kv": True}, cfg_lv3
        ),
        # The full lv3 single-stream quant stack: int8 weights + int8
        # self-KV + int8 cross-KV (xkv measured -2.9% on lv3 B=1 windows
        # pre-restructure; this measures the three stacked at the loop).
        "lv3_448_w8_skv_xkv": lambda: (
            quantize_decoder(lv3_fused()),
            {"quantize_self_kv": True, "quantize_cross_kv": True},
            cfg_lv3,
        ),
        # Decoder-scan unroll sweep at lv3 (cfg.decoder_scan_unroll):
        # does per-iteration scan boundary cost explain part of the
        # ~45 us/layer non-roofline step time?
        "lv3_448_w8_u4": lambda: (
            quantize_decoder(lv3_fused()), {},
            cfg_lv3.with_(decoder_scan_unroll=4),
        ),
        "lv3_448_w8_u8": lambda: (
            quantize_decoder(lv3_fused()), {},
            cfg_lv3.with_(decoder_scan_unroll=8),
        ),
    }
    pick = sys.argv[1:] or list(variants)
    unknown = [n for n in pick if n not in variants]
    if unknown:
        sys.exit(f"unknown variant(s) {unknown}; known: {sorted(variants)}")

    rng = np.random.default_rng(0)
    a1 = jnp.asarray(
        prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
    )[None]

    # Hardware numeric check of the packed-int4 Pallas kernel (interpret
    # mode hides Mosaic issues; PERF.md hardware-verification rule).
    from norma_tpu.ops.quant_matmul import (
        quantize_blockwise_int4, w4_matmul_jnp, w4_matmul_pallas,
    )

    wq = (0.02 * rng.standard_normal((1280, 51866))).astype(np.float32)
    xq = rng.standard_normal((2, 1280)).astype(np.float32)
    q4, s4 = quantize_blockwise_int4(wq)
    ref = np.asarray(w4_matmul_jnp(jnp.asarray(xq), q4, s4))
    got = np.asarray(w4_matmul_pallas(jnp.asarray(xq), q4, s4))
    rel = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
    print(json.dumps({"w4_pallas_vs_jnp_hw_max_rel": round(rel, 5)}), flush=True)
    assert rel < 0.03, "w4 pallas kernel diverges on hardware"

    for name in pick:
        vparams, ekw, vcfg = variants[name]()
        params = jax.device_put(vparams, dev0)
        engine = DecodeEngine(params, vcfg, st, **ekw)
        ntoks = vcfg.max_target_positions - 4  # forced decode length
        state = engine.prefill_window(a1, 50259)
        engine.run_loop(state, 0.0, seed=0)  # compile + warm
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            engine.run_loop(state, 0.0, seed=0)
            walls.append(time.perf_counter() - t0)
        loop_ms, top = profiled_device_ms(
            lambda: engine.run_loop(state, 0.0, seed=0),
            3, f"/tmp/dec_ab/{name}", ops=10,
        )
        print(json.dumps({
            name: {
                "device_ms_per_loop": round(loop_ms, 2),
                "device_us_per_step": round(loop_ms / ntoks * 1e3, 1),
                "wall_ms": round(min(walls) * 1e3, 1),
                "top_ops": top,
            }
        }, indent=1), flush=True)


if __name__ == "__main__":
    main()
