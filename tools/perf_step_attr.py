"""Per-op attribution of ONE decoder step, outside the while_loop.

The production token loop is a single ``lax.while_loop`` whose xplane
line is one opaque fusion, so ``tools/perf_decoder_ab.py``'s per-loop
``top_ops`` cannot say where a step's time goes.  This tool jits ONE
``decoder_step`` (caches donated, matching the loop's in-place carry),
profiles it, and prints every fused-op line plus a streaming roofline
computed from the ACTUAL array bytes the step must read:

  - decoder weights (the variant's real param bytes: bf16 or int8+scales)
  - cross-attention K/V (bf16 or int8 codes+scales)
  - self-attention KV cache rows up to the probed fill position

Caveat (PERF.md methodology): a lone step is NOT the in-loop step — the
while_loop amortizes dispatch and may schedule differently — so treat
the per-op SHARES and the roofline gap as the signal, and the per-loop
numbers from perf_decoder_ab.py as the ground truth totals.

Run ON TPU:  python tools/perf_step_attr.py [variant ...]
Variants: lv3_bf16 lv3_w8 lv3_w8_skv_xkv distil_w8
          lv3_b8_w8 lv3_b8_w8_xkv lv3_b8_w8_xkv_kernel  (the batched
          regime where the xkv kernel wins — locates the remaining
          gap to the −15% perfect-kernel ceiling)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILL = 224  # probe position: half of the production mtp=448 (avg fill)


def tree_bytes(t) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))


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
    from norma_tpu.model.quant import quantize_decoder
    from norma_tpu.model.whisper import (
        decoder_step,
        quantize_cross_kv,
        quantize_self_kv_cache,
    )
    from norma_tpu.tracing import profiled_device_ms

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    cfg_lv3 = PRESETS["large-v3"].with_(max_target_positions=448)
    cfg_d = PRESETS["distil-large-v3"].with_(max_target_positions=448)

    variants = {
        # name -> (cfg, quantize_params, skv, xkv, B)
        # xkv: False | "einsum" | "kernel" (the Pallas cross-decode
        # kernel layout, ops/paged_cross.py — the B=8 winner)
        "lv3_bf16": (cfg_lv3, False, False, False, 1),
        "lv3_w8": (cfg_lv3, True, False, False, 1),
        "lv3_w8_skv_xkv": (cfg_lv3, True, True, "einsum", 1),
        "distil_w8": (cfg_d, True, False, False, 1),
        "lv3_b8_w8": (cfg_lv3, True, False, False, 8),
        "lv3_b8_w8_xkv": (cfg_lv3, True, False, "einsum", 8),
        "lv3_b8_w8_xkv_kernel": (cfg_lv3, True, False, "kernel", 8),
        # + the Pallas self-decode kernel (ops/self_decode.py): locates
        # whether the ~3.3 ms/step of XLA self-KV handling actually
        # disappears from the per-op lines.
        "lv3_b8_w8_xkvk_selfk": (
            cfg_lv3.with_(self_kv_impl="kernel"), True, False, "kernel", 8
        ),
    }
    pick = sys.argv[1:] or ["lv3_w8_skv_xkv", "lv3_w8"]
    unknown = [n for n in pick if n not in variants]
    if unknown:
        sys.exit(f"unknown variant(s) {unknown}; known: {sorted(variants)}")

    rng = np.random.default_rng(0)
    aud = jnp.asarray(
        np.stack(
            [
                prepare_audio(
                    (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
                )
                for _ in range(8)
            ]
        )
    )
    dev0 = jax.devices()[0]

    # v5e HBM streaming bandwidth (datasheet ~819 GB/s); the roofline is
    # bytes_read / BW — compute-side cost of GEMVs at B=1 is negligible.
    HBM_GBPS = 819.0

    params_cache = {}
    for name in pick:
        cfg, w8, skv, xkv, B = variants[name]
        key = (cfg.d_model, cfg.decoder_layers, w8)
        if key not in params_cache:
            p = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
            params_cache[key] = jax.device_put(
                quantize_decoder(p) if w8 else p, dev0
            )
        params = params_cache[key]
        engine = DecodeEngine(params, cfg, st)
        state = engine.prefill_window(aud[:B], 50259)
        xk, xv = state["xk"], state["xv"]
        ck, cv = state["cache_k"], state["cache_v"]
        if xkv:
            xk, xv = quantize_cross_kv(xk, xv)
            if xkv == "kernel":
                from norma_tpu.ops.paged_cross import prep_cross_kv_kernel

                xk, xv = prep_cross_kv_kernel(
                    xk, xv, cfg.decoder_attention_heads
                )
        if skv:
            ck, cv = quantize_self_kv_cache(ck), quantize_self_kv_cache(cv)

        step = jax.jit(
            lambda prm, tok, pos, a, b, c, d: decoder_step(
                prm, cfg, tok, pos, a, b, c, d
            ),
            donate_argnums=(3, 4),
        )
        tok = jnp.full((B,), 1000, jnp.int32)
        pos = jnp.int32(FILL)

        def run(n=64):
            nonlocal ck, cv
            out = None
            for _ in range(n):
                out, ck, cv = step(params, tok, pos, ck, cv, xk, xv)
            return out.block_until_ready()

        run(2)  # compile + warm
        ms_total, top = profiled_device_ms(
            lambda: run(64), 1, f"/tmp/step_attr/{name}", ops=40
        )
        ms = ms_total / 64.0

        # Roofline from the arrays the step actually reads.
        dec_b = tree_bytes(
            {k: v for k, v in params.items() if k == "decoder"}
        )
        xkv_b = tree_bytes((xk, xv))
        # Self-KV: only rows [0, FILL] per layer are live reads.
        full = tree_bytes((ck, cv))
        skv_b = int(full * FILL / cfg.max_target_positions)
        total_b = dec_b + xkv_b + skv_b
        roof_us = total_b / (HBM_GBPS * 1e3)
        print(json.dumps({
            name: {
                "device_us_per_step_lone": round(ms * 1e3, 1),
                "roofline_us": round(roof_us, 1),
                "ratio": round(ms * 1e3 / roof_us, 2),
                "bytes_mb": {
                    "decoder_weights": round(dec_b / 1e6, 1),
                    "cross_kv": round(xkv_b / 1e6, 1),
                    "self_kv@fill": round(skv_b / 1e6, 1),
                },
                "top_ops": top,
            }
        }, indent=1), flush=True)


if __name__ == "__main__":
    main()
