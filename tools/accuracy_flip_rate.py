"""Statistical accuracy proxy for the quantization tiers (offline form).

Real checkpoints cannot be downloaded here (zero egress), so the WER
deltas the quant tiers owe (PARITY.md) get an offline stand-in: greedy
token FLIP RATES vs the bf16 baseline, across multiple seeded models
and audio kinds — a measure of how often each tier's numeric
perturbation actually crosses an argmax boundary, with binomial CIs.

Method: for each seed x audio cell, decode one 6 s window greedily
(exact-math f32 scores at decode; bf16 weights — the production tier)
with the bf16 engine, then with each quant tier built FROM THE SAME
params.  Per position, a "flip" is the first index where the token
streams diverge and everything after (once decoding diverges the tails
are incomparable, so the conservative count charges the whole tail).

The tiers measured are the pure-XLA ones a CPU can execute faithfully
(the default matmul precision mimics TPU bf16): int8 decoder weights
(quantize_decoder), int8 logits head (quantize_logits_head), int8
cross-KV (quantize_cross_kv), int8 self-KV (quantize_self_kv), w8a8
encoder (quantize_encoder).  Kernel impls (flash encoder, decode
kernels) have their own hardware parity gates (tools/verify_*_tpu.py).

Run: python tools/accuracy_flip_rate.py [--dim 512] [--seeds 3]
Prints a markdown table (paste into PERF.md) + JSON to
/tmp/norma_flip_rate.json.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def make_audio(kind: str, seconds: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    if kind == "tone":
        return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    if kind == "mix":
        return (
            0.15 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(n)
        ).astype(np.float32)
    if kind == "noise":
        return (0.1 * rng.standard_normal(n)).astype(np.float32)
    if kind == "chirp":
        f = 110 + 660 * t / t[-1]
        return (0.25 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    raise ValueError(kind)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--mtp", type=int, default=48)
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from norma_tpu.decode.engine import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import log_mel_spectrogram, prepare_audio
    from norma_tpu.model import WhisperConfig, fuse_qkv, init_params
    from norma_tpu.model.quant import (
        quantize_decoder,
        quantize_encoder,
        quantize_logits_head,
    )

    SOT, EOT, LANG, TASK = 50258, 50257, 50259, 50359
    MSP = 300  # 6 s windows
    N_FRAMES = 2 * MSP
    cfg = WhisperConfig(
        num_mel_bins=80, vocab_size=51865, d_model=args.dim,
        encoder_layers=args.layers, encoder_attention_heads=args.dim // 64,
        decoder_layers=max(2, args.layers // 2),
        decoder_attention_heads=args.dim // 64,
        max_source_positions=MSP, max_target_positions=args.mtp,
        suppress_tokens=(),
    )
    st = SpecialTokens(
        sot=SOT, eot=EOT, task=TASK, no_speech=50362,
        no_timestamps=50363, zero_sec=50364, one_sec=50414,
    )

    AUDIOS = ("tone", "mix", "noise", "chirp")

    def decode_tokens(engine, audio):
        mel = log_mel_spectrogram(
            jnp.asarray(prepare_audio(audio, n_frames=N_FRAMES))[None],
            n_mels=cfg.num_mel_bins, n_frames=N_FRAMES,
        )
        feats = engine.encode(mel)
        state = engine.prefill(feats, LANG)
        return engine.run_loop(state, 0.0, seed=0)[0].tokens

    # tier name -> engine builder(params)
    def tiers(params):
        t = {}
        if jax.default_backend() == "tpu":
            # int4 cross-KV is kernel-only (TPU): one accuracy rung
            # below int8 — measure it whenever the chip is available.
            t["xkv_int4"] = lambda: DecodeEngine(
                params, cfg.with_(cross_kv_impl="kernel"), st,
                quantize_cross_kv="int4",
            )
        t |= {
            "w8_decoder": lambda: DecodeEngine(
                quantize_decoder(params), cfg, st
            ),
            "w8_head": lambda: DecodeEngine(
                quantize_logits_head(params), cfg, st
            ),
            "xkv_int8": lambda: DecodeEngine(
                params, cfg, st, quantize_cross_kv=True
            ),
            "skv_int8": lambda: DecodeEngine(
                params, cfg, st, quantize_self_kv=True
            ),
            "e8_w8a8": lambda: DecodeEngine(
                quantize_encoder(params), cfg, st
            ),
            "serving_stack": lambda: DecodeEngine(
                quantize_encoder(quantize_decoder(params)), cfg, st,
                quantize_cross_kv=True,
            ),
        }
        return t

    # flips/positions + window-exact counts per tier
    stats = {}
    t0 = time.time()
    for seed in range(args.seeds):
        params = fuse_qkv(init_params(cfg, seed=seed, dtype=jnp.bfloat16))
        base = DecodeEngine(params, cfg, st)
        tier_engines = {k: b() for k, b in tiers(params).items()}
        for kind in AUDIOS:
            audio = make_audio(kind, 6.0, seed=100 + seed)
            ref = decode_tokens(base, audio)
            for name, eng in tier_engines.items():
                got = decode_tokens(eng, audio)
                n = max(len(ref), len(got))
                first_div = next(
                    (
                        i
                        for i in range(n)
                        if i >= len(ref)
                        or i >= len(got)
                        or ref[i] != got[i]
                    ),
                    n,
                )
                flips = n - first_div
                s = stats.setdefault(
                    name, {"flips": 0, "positions": 0, "windows": 0,
                           "exact": 0}
                )
                s["flips"] += flips
                s["positions"] += n
                s["windows"] += 1
                s["exact"] += int(flips == 0)
            print(
                f"# seed {seed} {kind}: ref {len(ref)} toks "
                f"(+{time.time()-t0:.0f}s)",
                flush=True,
            )

    rows = []
    for name, s in sorted(stats.items()):
        lo, hi = wilson_ci(s["flips"], s["positions"])
        rows.append({
            "tier": name,
            "windows": s["windows"],
            "exact_windows": s["exact"],
            "positions": s["positions"],
            "flipped": s["flips"],
            "flip_rate": round(s["flips"] / max(1, s["positions"]), 4),
            "ci95": [round(lo, 4), round(hi, 4)],
        })

    print("\n| tier | exact windows | flip rate (95% CI) |")
    print("|---|---|---|")
    for r in rows:
        print(
            f"| {r['tier']} | {r['exact_windows']}/{r['windows']} | "
            f"{r['flip_rate']:.3f} ({r['ci95'][0]:.3f}-{r['ci95'][1]:.3f}) |"
        )
    out = {
        "config": f"d{args.dim} L{args.layers} vocab 51865 bf16, "
                  f"{args.seeds} seeds x {len(AUDIOS)} audios, "
                  f"greedy mtp={args.mtp}",
        "backend": jax.default_backend(),
        "note": (
            "flip = all positions from the first divergence (conservative "
            "tail charge); random seeded weights are a knife-edge "
            "worst-case vs trained checkpoints (PARITY.md)"
        ),
        "rows": rows,
        "measured_at_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
    }
    print(json.dumps(out))
    with open("/tmp/norma_flip_rate.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
