"""Hardware gate for cross_kv_impl="paged" (ops/paged_cross.py).

Pallas kernels MUST be verified on hardware (interpret mode has hidden
Mosaic issues every time — PERF.md methodology).  Three checks:

1. op-level: paged_cross_attention vs the einsum form on random tensors
   at production dims (same int8 codes, so the only difference is the
   kernel's f32 online softmax vs XLA's bf16-operand einsum — expect
   ~1e-2 rel-RMS, the bf16-vs-f32 tier), plain and grouped.
2. engine-level: transcribe_window under cross_kv_impl="paged" vs
   "einsum" on a seeded checkpoint — token parity expected on peaked
   models (both read identical int8 codes).
3. the B=1 speculative-ladder path (grouped page sharing) runs.

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
        paged_cross_attention,
        paginate_cross_kv,
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
    kp, vp = paginate_cross_kv(kq, vq, H, page_size=500)
    kp1 = {k: v[0] for k, v in kp.items()}
    vp1 = {k: v[0] for k, v in vp.items()}

    ref = np.asarray(
        jax.jit(lambda *a: attention_cross_q8(*a, H))(q, kq1, vq1),
        np.float32,
    )
    got = np.asarray(
        jax.jit(lambda *a: paged_cross_attention(*a, H))(q, kp1, vp1),
        np.float32,
    )
    rel = float(
        np.sqrt(((got - ref) ** 2).mean()) / (np.sqrt((ref**2).mean()) + 1e-9)
    )
    print(f"op-level rel-RMS paged vs einsum (B=8): {rel:.2e}")
    if rel > 3e-2:
        print("FAIL: op-level drift above the bf16-vs-f32 tier")
        fails += 1

    # Grouped (speculative temperature ladder: G rungs share B' streams).
    G, Bp = 6, 1
    qg = jnp.asarray(rng.standard_normal((G * Bp, 1, D)) * 0.1, jnp.bfloat16)
    kqg = {"q": kq["q"][0, :Bp], "s": kq["s"][0, :Bp]}
    vqg = {"q": vq["q"][0, :Bp], "s": vq["s"][0, :Bp]}
    kpg = {k: (v[0, :, : Bp * 3] if k == "pages" else v[0, :Bp])
           for k, v in kp.items()}
    vpg = {k: (v[0, :, : Bp * 3] if k == "pages" else v[0, :Bp])
           for k, v in vp.items()}
    ref_g = np.asarray(
        jax.jit(lambda *a: attention_cross_q8(*a, H, n_groups=G))(
            qg, kqg, vqg
        ),
        np.float32,
    )
    got_g = np.asarray(
        jax.jit(lambda *a: paged_cross_attention(*a, H, n_groups=G))(
            qg, kpg, vpg
        ),
        np.float32,
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
    from norma_tpu.constants import N_SAMPLES

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
    for impl in ("einsum", "paged"):
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
    same4 = toks["paged"][0] == toks["einsum"][0]
    same1 = toks["paged"][1] == toks["einsum"][1]
    print(f"engine token parity: B=4 {same4}, B=1-ladder {same1}")
    if not same1:
        # Random-weight models are knife-edge; report but only fail if the
        # sequences diverge from the first token (layout bug, not rounding).
        a, b = toks["paged"][1], toks["einsum"][1]
        pre = 0
        if a and b:
            while pre < min(len(a), len(b)) and a[pre] == b[pre]:
                pre += 1
        print(f"  common prefix {pre} ({a and a[:6]} vs {b and b[:6]})")
        if pre < 4:
            print("FAIL: divergence at the prefix — not a rounding artifact")
            fails += 1

    print("PAGED CROSS GATE:", "FAIL" if fails else "PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
