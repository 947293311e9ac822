"""Produce a golden-token artifact from a REAL Whisper checkpoint.

This is the network-enabled counterpart of the committed engine goldens
(``tests/golden/engine_small.json``): given a real checkpoint — an HF repo
id (downloads config.json / tokenizer.json / model.safetensors at a pinned
revision, as the reference loaders do, monolingual.rs:189-211) or a local
directory — it transcribes fixed audio and writes token ids + text suitable
for committing as ``tests/golden/<name>.json`` and cross-checking against
HF ``WhisperForConditionalGeneration`` or the reference binary.

Usage:
  python tools/make_golden.py --local-dir /path/to/ckpt --lang en out.json
  python tools/make_golden.py --repo distil-whisper/distil-large-v3 out.json
  python tools/make_golden.py --local-dir ckpt --wav a.wav --wav b.wav out.json

Without --wav, three deterministic synthetic signals are used.  WAVs must be
16 kHz mono PCM (use ffmpeg/sox to convert); they are read with the stdlib
``wave`` module to stay dependency-free.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import wave

import numpy as np


def read_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        assert w.getframerate() == 16_000, f"{path}: need 16 kHz"
        assert w.getnchannels() == 1, f"{path}: need mono"
        assert w.getsampwidth() == 2, f"{path}: need 16-bit PCM"
        raw = w.readframes(w.getnframes())
    return (np.frombuffer(raw, np.int16).astype(np.float32)) / 32768.0


def synthetic_cases():
    t = np.arange(6 * 16000) / 16000.0
    rng = np.random.default_rng(1)
    return {
        "tone220": (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
        "noise": (0.1 * rng.standard_normal(t.size)).astype(np.float32),
        "mix440": (
            0.15 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.size)
        ).astype(np.float32),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--repo", help="HF repo id (needs network)")
    ap.add_argument("--revision", default="main")
    ap.add_argument("--local-dir", help="local checkpoint dir (offline)")
    ap.add_argument("--lang", help="constant language code, e.g. en (else detect)")
    ap.add_argument("--wav", action="append", default=[], help="16kHz mono wav")
    args = ap.parse_args()
    if not args.repo and not args.local_dir:
        sys.exit("need --repo or --local-dir")

    from norma_tpu.decode.longform import LongFormDecoder
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper.loader import build_model

    model = build_model(
        repo_id=args.repo or "",
        revision=args.revision,
        quantized_ext=None,
        device=SelectedDevice.auto(),
        const_language_token_str=(f"<|{args.lang}|>" if args.lang else None),
        local_dir=args.local_dir,
    )
    engine, tokenizer = model.engine, model.tokenizer

    cases = (
        {p: read_wav(p) for p in args.wav} if args.wav else synthetic_cases()
    )
    out = {"source": args.repo or args.local_dir, "revision": args.revision,
           "cases": {}}
    for name, audio in cases.items():
        lf = LongFormDecoder(
            engine, tokenizer, model.longform.lang,
            language_tokens=model.longform.language_tokens, seed=0,
        )
        text = lf.transcribe(audio, final_chunk=True)
        # Raw greedy window tokens for bit-level cross-checks.
        import jax.numpy as jnp

        from norma_tpu.frontend.mel import log_mel_spectrogram, prepare_audio

        n_frames = 2 * engine.cfg.max_source_positions
        mel = log_mel_spectrogram(
            jnp.asarray(prepare_audio(audio, n_frames=n_frames))[None],
            n_mels=engine.cfg.num_mel_bins,
            n_frames=n_frames,
        )
        feats = engine.encode(mel)
        lang_tok = model.longform.lang.token
        if lang_tok is None:
            probs = engine.detect_language(feats)
            lang_tok = model.longform.language_tokens[int(np.argmax(probs[0]))]
        dr = engine.run_loop(engine.prefill(feats, lang_tok), 0.0, seed=0)[0]
        out["cases"][name] = {
            "text": text,
            "greedy_tokens": dr.tokens,
            "avg_logprob": dr.avg_logprob,
            "no_speech_prob": dr.no_speech_prob,
        }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
