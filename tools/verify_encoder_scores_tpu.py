"""Hardware accuracy gate for ``encoder_scores_bf16`` (run on a real TPU).

The flag rounds encoder QK attention scores to bf16 before the f32 softmax
(model/whisper.py:attention) — a TPU-only numeric change the CPU parity
suite cannot exercise, since the flag is gated off on non-TPU backends.
This tool is the accuracy gate the flag's default answers to (ADVICE r2):
on the real chip it decodes the same windows with the flag ON and OFF and
checks

  1. token-level parity of the full production greedy transcripts
     (fused-window ladder path), and
  2. encoder-feature drift (relative RMS) stays at bf16-rounding scale.

Across seeded checkpoints x multiple synthetic audio windows (real speech
is unreachable in this environment — zero egress; PARITY.md).  Exits
non-zero if any window's token sequence differs — which is exactly what
round 3 measured (4/16 windows flipped, ~0.5-1% feature rel-RMS), hence
the flag now defaults OFF (config.py) until a real-audio WER check clears
it.  Caveat on sensitivity: random-weight models have near-uniform logits,
so their argmax is knife-edge; real checkpoints are more robust — but
"more robust" is not evidence, and the reference computes f32 scores.

Usage:  python tools/verify_encoder_scores_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend (flag is inert elsewhere)")
        return 0

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, init_params
    from norma_tpu.model.whisper import encode

    st = SpecialTokens(
        sot=50258, eot=50257, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )

    n_windows = 4
    failures = 0
    compared = 0  # real (non-vacuous) token comparisons
    for preset in ("distil-large-v3", "tiny"):
        cfg_on = PRESETS[preset].with_(encoder_scores_bf16=True)
        cfg_off = PRESETS[preset].with_(encoder_scores_bf16=False)
        for seed in (0, 1):
            params = jax.device_put(
                init_params(cfg_on, seed=seed, dtype=jnp.bfloat16),
                jax.devices()[0],
            )
            e_on = DecodeEngine(params, cfg_on, st)
            e_off = DecodeEngine(params, cfg_off, st)
            rng = np.random.default_rng(1000 + seed)
            for w in range(n_windows):
                audio = prepare_audio(
                    (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32),
                    n_frames=2 * cfg_on.max_source_positions,
                )
                drs_on, _ = e_on.transcribe_window(
                    audio[None], [50259], seed=w
                )
                drs_off, _ = e_off.transcribe_window(
                    audio[None], [50259], seed=w
                )
                t_on = drs_on[0].tokens if drs_on[0] else None
                t_off = drs_off[0].tokens if drs_off[0] else None
                if t_on is None and t_off is None:
                    # No result on either engine: comparing nothing must
                    # not count as parity (same fix as
                    # verify_encoder_q8_tpu, commit 0c81d17).
                    print(
                        f"{preset} seed={seed} window={w}: NO RESULT on "
                        "both engines (excluded from parity)"
                    )
                    continue
                ok = t_on == t_off
                compared += 1
                failures += 0 if ok else 1
                print(
                    f"{preset} seed={seed} window={w}: "
                    f"tokens {'MATCH' if ok else 'DIFFER'} "
                    f"({len(t_on or [])} vs {len(t_off or [])})"
                )
                if not ok:
                    print(f"  on:  {t_on}\n  off: {t_off}")

            # Feature drift on one window (bf16 rounding scale ~= 0.4%).
            from norma_tpu.frontend.mel import log_mel_spectrogram

            mel = log_mel_spectrogram(
                jnp.asarray(audio[None]),
                n_mels=cfg_on.num_mel_bins,
                n_frames=2 * cfg_on.max_source_positions,
            )
            f_on = np.asarray(
                jax.jit(lambda p, m: encode(p, cfg_on, m))(params, mel),
                np.float32,
            )
            f_off = np.asarray(
                jax.jit(lambda p, m: encode(p, cfg_off, m))(params, mel),
                np.float32,
            )
            rel = float(
                np.sqrt(np.mean((f_on - f_off) ** 2))
                / (np.sqrt(np.mean(f_off**2)) + 1e-12)
            )
            print(f"{preset} seed={seed}: encoder feature rel-RMS {rel:.2e}")
            if rel > 0.02:
                failures += 1
                print("  FAIL: drift above 2% rel-RMS")

    if compared == 0:
        print("FAIL (no real token comparisons — gate is vacuous)")
        return 1
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
