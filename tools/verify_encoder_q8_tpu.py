"""Hardware accuracy report for ``quantize_encoder`` (run on a real TPU).

The w8a8 encoder (model/quant.py:quantize_encoder) runs the six projection
matmuls of every encoder layer on the MXU's native int8 path with
dynamically quantized activations.  Unlike ``encoder_scores_bf16`` the
math is backend-independent (the CPU suite bounds the grid error,
tests/test_quant.py), so this tool's job on the real chip is:

  1. confirm the int8 dot_general path actually compiles and runs on TPU
     (the MXU int8 mode, not an emulation detour), and
  2. report greedy-token parity + encoder-feature drift of the production
     fused-window program vs the bf16 encoder on seeded checkpoints, so
     the opt-in's accuracy cost is measured where it will be paid.

Token flips are EXPECTED at some rate on random-weight models (near-
uniform logits; the activation grid is a real ~0.4%-per-matmul change) —
the tool fails only if feature drift exceeds the int8 budget (3% rel-RMS)
or the path fails to execute.  Gate production use on real-audio WER, as
with encoder_scores_bf16 (PARITY.md).

Usage:  python tools/verify_encoder_q8_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend (CPU tests already bound the math)")
        return 0

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import log_mel_spectrogram, prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_encoder
    from norma_tpu.model.whisper import encode

    st = SpecialTokens(
        sot=50258, eot=50257, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )

    n_windows = 4
    failures = 0
    flips = 0
    total = 0
    for preset in ("distil-large-v3", "tiny"):
        cfg = PRESETS[preset]
        for seed in (0, 1):
            params = jax.device_put(
                fuse_qkv(init_params(cfg, seed=seed, dtype=jnp.bfloat16)),
                jax.devices()[0],
            )
            params_q8 = jax.device_put(
                quantize_encoder(params), jax.devices()[0]
            )
            e_ref = DecodeEngine(params, cfg, st)
            e_q8 = DecodeEngine(params_q8, cfg, st)
            rng = np.random.default_rng(2000 + seed)
            for w in range(n_windows):
                audio = prepare_audio(
                    (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32),
                    n_frames=2 * cfg.max_source_positions,
                )
                drs_r, _ = e_ref.transcribe_window(audio[None], [50259], seed=w)
                drs_q, _ = e_q8.transcribe_window(audio[None], [50259], seed=w)
                t_r = drs_r[0].tokens if drs_r[0] else None
                t_q = drs_q[0].tokens if drs_q[0] else None
                if t_r is None and t_q is None:
                    # Nothing was compared; do not inflate the parity score.
                    print(
                        f"{preset} seed={seed} window={w}: both no-result "
                        "(not counted)"
                    )
                    continue
                ok = t_r == t_q
                total += 1
                flips += 0 if ok else 1
                print(
                    f"{preset} seed={seed} window={w}: "
                    f"tokens {'MATCH' if ok else 'DIFFER'} "
                    f"({len(t_r or [])} vs {len(t_q or [])})"
                )

            # Feature drift (int8 activation+weight grids; budget 3%).
            mel = log_mel_spectrogram(
                jnp.asarray(audio[None]),
                n_mels=cfg.num_mel_bins,
                n_frames=2 * cfg.max_source_positions,
            )
            f_r = np.asarray(
                jax.jit(lambda p, m: encode(p, cfg, m))(params, mel),
                np.float32,
            )
            f_q = np.asarray(
                jax.jit(lambda p, m: encode(p, cfg, m))(params_q8, mel),
                np.float32,
            )
            rel = float(
                np.sqrt(np.mean((f_q - f_r) ** 2))
                / (np.sqrt(np.mean(f_r**2)) + 1e-12)
            )
            print(f"{preset} seed={seed}: encoder feature rel-RMS {rel:.2e}")
            if rel > 0.03:
                failures += 1
                print("  FAIL: drift above 3% rel-RMS")

    print(f"token parity: {total - flips}/{total} windows")
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
