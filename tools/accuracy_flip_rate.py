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

r5 (VERDICT r4 #5): random seeded weights are a KNIFE-EDGE worst case —
their top-2 logit gaps sit near zero, so any perturbation flips tokens.
The tool now measures TWO regimes per run and prints both tables:

  - "knife-edge": plain seeded params (the r4 worst-case ceiling)
  - "trained": the same dims actually FIT (Adam, teacher-forced CE
    through the production encode/prefill graph) on a synthetic
    audio->token-sequence task until the margins are real — the
    TYPICAL-case bracket.  Genuinely peaked posteriors, not a rescaling:
    an LN-gain-scaled construction was tried first and discarded
    because it multiplies signal and perturbation equally (flip rates
    came back regime-invariant up to trajectory noise).  The measured
    median top-2 logit gap is reported per regime so the "realistic
    margins" claim is checkable against real checkpoints (~5-15 on
    clear speech).

Run: python tools/accuracy_flip_rate.py [--dim 512] [--seeds 3]
Prints markdown tables (paste into PERF.md) + JSON to
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
    ap.add_argument("--train-steps", type=int, default=350,
                    help="Adam steps for the 'trained' regime "
                         "(0 = knife-edge only)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the chip free)")
    args = ap.parse_args()

    import jax

    if args.cpu or jax.default_backend() not in ("tpu",):
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

    from norma_tpu.model.whisper import cross_kv, decoder_prefill, encode

    def target_tokens(seed: int, kind_idx: int) -> np.ndarray:
        """Deterministic per-(seed, audio-kind) token sequence to fit:
        [sot, lang, task, 20 text tokens, eot] — the shape real windows
        decode, with text ids kept below the special range."""
        rng = np.random.default_rng(7_000 + 17 * seed + kind_idx)
        body = rng.integers(100, 40_000, size=20, dtype=np.int64)
        return np.concatenate(
            [[SOT, LANG, TASK], body, [EOT]]
        ).astype(np.int32)

    def train(params_f32, seed: int, mels, targets):
        """Teacher-forced CE fit through the PRODUCTION graph
        (encode -> cross_kv -> decoder_prefill), so the trained weights
        are confident on exactly the windows the flip measurement
        decodes."""
        import optax

        toks = jnp.asarray(np.stack(targets))  # [K, T]

        def loss_fn(p):
            feats = encode(p, cfg, mels)
            xk, xv = cross_kv(p, cfg, feats)
            logits, _, _ = decoder_prefill(p, cfg, toks[:, :-1], xk, xv)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = toks[:, 1:]
            return -jnp.take_along_axis(lp, tgt[..., None], -1).mean()

        opt = optax.adam(1e-3)
        state = opt.init(params_f32)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, l

        p = params_f32
        for i in range(args.train_steps):
            p, state, l = step(p, state)
            if i % 100 == 0 or i == args.train_steps - 1:
                print(f"# train seed {seed} step {i}: loss {float(l):.4f}",
                      flush=True)
        return p

    def top2_gap(engine, audio):
        """Median top-2 logit gap over the first decode position."""
        mel = log_mel_spectrogram(
            jnp.asarray(prepare_audio(audio, n_frames=N_FRAMES))[None],
            n_mels=cfg.num_mel_bins, n_frames=N_FRAMES,
        )
        state = engine.prefill(engine.encode(mel), LANG)
        nl = np.asarray(state["next_logits"][0], np.float32)
        top2 = np.partition(nl, -2)[-2:]
        return float(top2[1] - top2[0])

    regimes = [("knife-edge", False)]
    if args.train_steps > 0:
        regimes.append(("trained", True))

    # (regime, tier) -> flips/positions + window-exact counts
    stats = {}
    gaps = {name: [] for name, _ in regimes}
    t0 = time.time()
    for regime, do_train in regimes:
        for seed in range(args.seeds):
            if do_train:
                audios = [
                    make_audio(kind, 6.0, seed=100 + seed)
                    for kind in AUDIOS
                ]
                mels = log_mel_spectrogram(
                    jnp.asarray(
                        np.stack(
                            [prepare_audio(a, n_frames=N_FRAMES)
                             for a in audios]
                        )
                    ),
                    n_mels=cfg.num_mel_bins, n_frames=N_FRAMES,
                )
                targets = [
                    target_tokens(seed, i) for i in range(len(AUDIOS))
                ]
                trained = train(
                    init_params(cfg, seed=seed, dtype=jnp.float32),
                    seed, mels, targets,
                )
                params = fuse_qkv(
                    jax.tree.map(
                        lambda a: a.astype(jnp.bfloat16), trained
                    )
                )
            else:
                params = fuse_qkv(
                    init_params(cfg, seed=seed, dtype=jnp.bfloat16)
                )
            base = DecodeEngine(params, cfg, st)
            tier_engines = {k: b() for k, b in tiers(params).items()}
            for kind in AUDIOS:
                audio = make_audio(kind, 6.0, seed=100 + seed)
                ref = decode_tokens(base, audio)
                gaps[regime].append(top2_gap(base, audio))
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
                        (regime, name),
                        {"flips": 0, "positions": 0, "windows": 0,
                         "exact": 0},
                    )
                    s["flips"] += flips
                    s["positions"] += n
                    s["windows"] += 1
                    s["exact"] += int(flips == 0)
                print(
                    f"# {regime} seed {seed} {kind}: ref {len(ref)} toks "
                    f"(+{time.time()-t0:.0f}s)",
                    flush=True,
                )

    rows = []
    for (regime, name), s in sorted(stats.items()):
        lo, hi = wilson_ci(s["flips"], s["positions"])
        rows.append({
            "regime": regime,
            "tier": name,
            "windows": s["windows"],
            "exact_windows": s["exact"],
            "positions": s["positions"],
            "flipped": s["flips"],
            "flip_rate": round(s["flips"] / max(1, s["positions"]), 4),
            "ci95": [round(lo, 4), round(hi, 4)],
        })

    gap_stats = {
        regime: round(float(np.median(g)), 2) for regime, g in gaps.items()
    }
    for regime, _ in regimes:
        print(
            f"\n### {regime} (median top-2 logit gap "
            f"{gap_stats[regime]})"
        )
        print("| tier | exact windows | flip rate (95% CI) |")
        print("|---|---|---|")
        for r in rows:
            if r["regime"] != regime:
                continue
            print(
                f"| {r['tier']} | {r['exact_windows']}/{r['windows']} | "
                f"{r['flip_rate']:.3f} "
                f"({r['ci95'][0]:.3f}-{r['ci95'][1]:.3f}) |"
            )
    out = {
        "config": f"d{args.dim} L{args.layers} vocab 51865 bf16, "
                  f"{args.seeds} seeds x {len(AUDIOS)} audios, "
                  f"greedy mtp={args.mtp}, train_steps={args.train_steps}",
        "backend": jax.default_backend(),
        "median_top2_gap": gap_stats,
        "note": (
            "flip = all positions from the first divergence (conservative "
            "tail charge); knife-edge = plain seeded weights (worst-case "
            "ceiling), trained = same dims Adam-fit on a synthetic "
            "audio->tokens task (genuine margins: the typical-side "
            "bracket, PARITY.md)"
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
