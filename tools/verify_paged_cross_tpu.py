"""Hardware gate for cross_kv_impl="kernel" (ops/paged_cross.py).

Pallas kernels MUST be verified on hardware (interpret mode has hidden
Mosaic issues every time — PERF.md methodology).  Three checks:

1. op-level: cross_attention_q8_kernel vs the einsum form on random
   tensors at production dims (same int8 codes, so the only difference
   is the kernel's bf16-operand/f32-accum math vs XLA's einsum — expect
   ~1e-2 rel-RMS, the flash-encoder tier), plain and grouped.
2. engine-level: transcribe_window under cross_kv_impl="kernel" vs
   "einsum" on a seeded checkpoint — B=4 sequential ladder and B=1
   grouped ladder (the page-sharing path).
3. divergence triage: on knife-edge random weights token flips mid-
   sequence are rounding; a flip in the first tokens is a layout bug.

Run ON TPU:  python tools/verify_paged_cross_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.model.whisper import attention_cross_q8, quantize_cross_kv
    from norma_tpu.ops.paged_cross import (
        cross_attention_q8_kernel,
        prep_cross_kv_kernel,
    )

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    rng = np.random.default_rng(0)
    fails = 0

    # --- 1. op-level, production dims (distil/lv3 decoder: D=1280 H=20) ---
    B, Ta, D, H = 8, 1500, 1280, 20
    q = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((1, B, Ta, D)) * 0.5, jnp.bfloat16)
    xv = jnp.asarray(rng.standard_normal((1, B, Ta, D)) * 0.5, jnp.bfloat16)
    kq, vq = quantize_cross_kv(xk, xv)
    kq1 = {"q": kq["q"][0], "s": kq["s"][0]}
    vq1 = {"q": vq["q"][0], "s": vq["s"][0]}
    kp, vp = prep_cross_kv_kernel(kq, vq, H)
    kp1 = {k: v[0] for k, v in kp.items()}
    vp1 = {k: v[0] for k, v in vp.items()}

    ref = np.asarray(
        jax.jit(lambda *a: attention_cross_q8(*a, H))(q, kq1, vq1),
        np.float32,
    )
    got = np.asarray(
        cross_attention_q8_kernel(q, kp1, vp1, H), np.float32
    )
    rel = float(
        np.sqrt(((got - ref) ** 2).mean()) / (np.sqrt((ref**2).mean()) + 1e-9)
    )
    print(f"op-level rel-RMS kernel vs einsum (B=8): {rel:.2e}")
    if rel > 3e-2:
        print("FAIL: op-level drift above the bf16-operand tier")
        fails += 1

    # Grouped (speculative temperature ladder: G rungs share B'=1 stream).
    G, Bp = 6, 1
    qg = jnp.asarray(rng.standard_normal((G * Bp, 1, D)) * 0.1, jnp.bfloat16)
    kqg = {"q": kq["q"][0, :Bp], "s": kq["s"][0, :Bp]}
    vqg = {"q": vq["q"][0, :Bp], "s": vq["s"][0, :Bp]}
    kpg = {"kT": kp["kT"][0][:, :Bp], "s": kp["s"][0, :Bp]}
    vpg = {"kT": vp["kT"][0][:, :Bp], "s": vp["s"][0, :Bp]}
    ref_g = np.asarray(
        jax.jit(lambda *a: attention_cross_q8(*a, H, n_groups=G))(
            qg, kqg, vqg
        ),
        np.float32,
    )
    got_g = np.asarray(
        cross_attention_q8_kernel(qg, kpg, vpg, H, n_groups=G), np.float32
    )
    rel_g = float(
        np.sqrt(((got_g - ref_g) ** 2).mean())
        / (np.sqrt((ref_g**2).mean()) + 1e-9)
    )
    print(f"op-level rel-RMS grouped G=6: {rel_g:.2e}")
    if rel_g > 3e-2:
        print("FAIL: grouped drift above tier")
        fails += 1

    # --- 2./3. engine-level transcript parity + B=1 ladder ---
    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=48)
    params = jax.device_put(
        fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16)), dev
    )
    wins = jnp.asarray(
        np.stack(
            [
                prepare_audio(
                    (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
                )
                for _ in range(4)
            ]
        )
    )
    toks = {}
    for impl in ("einsum", "kernel"):
        e = DecodeEngine(
            params, cfg.with_(cross_kv_impl=impl), st,
            quantize_cross_kv=True,
        )
        out4, _ = e.transcribe_window(wins, [50259] * 4, seed=0)
        out1, _ = e.transcribe_window(wins[:1], [50259], seed=0)  # B=1 ladder
        toks[impl] = (
            [None if r is None else r.tokens for r in out4],
            None if out1[0] is None else out1[0].tokens,
        )
    same4 = toks["kernel"][0] == toks["einsum"][0]
    same1 = toks["kernel"][1] == toks["einsum"][1]
    print(f"engine token parity: B=4 {same4}, B=1-ladder {same1}")
    for name, same, a, b in (
        ("B=4", same4, toks["kernel"][0], toks["einsum"][0]),
        ("B=1", same1, [toks["kernel"][1]], [toks["einsum"][1]]),
    ):
        if same:
            continue
        # Random-weight models are knife-edge; only fail when sequences
        # diverge from the first tokens (layout bug, not rounding).
        for ra, rb in zip(a, b):
            ra, rb = ra or [], rb or []
            pre = 0
            while pre < min(len(ra), len(rb)) and ra[pre] == rb[pre]:
                pre += 1
            if pre < 4 and (ra or rb):
                print(
                    f"FAIL: {name} diverges at prefix {pre}: "
                    f"{ra[:6]} vs {rb[:6]}"
                )
                fails += 1
            elif ra != rb:
                print(f"  {name} mid-sequence flip at {pre} (rounding tier)")

    print("CROSS KERNEL GATE:", "FAIL" if fails else "PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
