"""Hardware gate for self_kv_impl="kernel" (ops/self_decode.py).

Pallas kernels MUST be verified on hardware (interpret mode has hidden
Mosaic issues every time — PERF.md methodology).  This kernel adds a new
risk beyond math: it writes the step's K/V row into the STACKED cache
via input/output aliasing with a one-row output block — if Mosaic or XLA
mishandles the partial-output-block aliasing, rows OTHER than ``pos``
would corrupt silently.  Checks:

1. op-level at production dims: attention output vs the XLA path's
   semantics (bf16-operand tier), the written row bit-equal, and every
   OTHER cache element bit-untouched (the aliasing contract).
2. multi-step: 8 sequential kernel steps vs 8 XLA steps — the cache
   must accumulate identically (tolerance on attention, equality on
   untouched rows each step).
3. engine-level: transcribe_window under self_kv_impl="kernel" vs "xla"
   on a seeded checkpoint — B=4 sequential ladder and B=1 grouped
   ladder.  Knife-edge mid-sequence flips are rounding; early
   divergence is a layout/aliasing bug.

Run ON TPU:  python tools/verify_self_decode_tpu.py
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

    from norma_tpu.model.whisper import attention
    from norma_tpu.ops.self_decode import self_attention_decode

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    rng = np.random.default_rng(0)
    fails = 0

    # --- 1. op-level, production dims (lv3 decoder: D=1280 H=20), with
    # a modest L so the aliased pair fits comfortably. ---
    L, B, T, D, H = 4, 8, 448, 1280, 20
    bf = jnp.bfloat16
    ck = jnp.asarray(rng.standard_normal((L, B, T, D)) * 0.5, bf)
    cv = jnp.asarray(rng.standard_normal((L, B, T, D)) * 0.5, bf)
    q = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.3, bf)
    kn = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.5, bf)
    vn = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.5, bf)
    li, pos = 2, 224
    ck_host, cv_host = np.asarray(ck, np.float32), np.asarray(cv, np.float32)

    a, ck2, cv2 = self_attention_decode(
        q, kn, vn, ck, cv, jnp.int32(li), jnp.int32(pos), H
    )
    # XLA-path reference on the same inputs (fresh arrays — ck/cv were
    # donated to the kernel call).
    ckr = jnp.asarray(ck_host, bf).at[li, :, pos, :].set(kn[:, 0, :])
    cvr = jnp.asarray(cv_host, bf).at[li, :, pos, :].set(vn[:, 0, :])
    mask = jnp.where(jnp.arange(T) <= pos, 0.0, -jnp.inf)[None, None, None, :]
    a_ref = np.asarray(attention(q, ckr[li], cvr[li], H, mask), np.float32)
    got = np.asarray(a, np.float32)
    rel = float(
        np.sqrt(((got - a_ref) ** 2).mean())
        / (np.sqrt((a_ref**2).mean()) + 1e-9)
    )
    print(f"op-level rel-RMS kernel vs XLA (B=8, fill 224): {rel:.2e}")
    if rel > 1e-2:
        print("FAIL: op-level drift above the bf16-operand tier")
        fails += 1

    ck2h, cv2h = np.asarray(ck2, np.float32), np.asarray(cv2, np.float32)
    row_ok = np.array_equal(
        ck2h[li, :, pos, :], np.asarray(kn[:, 0, :], np.float32)
    ) and np.array_equal(
        cv2h[li, :, pos, :], np.asarray(vn[:, 0, :], np.float32)
    )
    ck2h[li, :, pos, :] = ck_host[li, :, pos, :]
    cv2h[li, :, pos, :] = cv_host[li, :, pos, :]
    rest_ok = np.array_equal(ck2h, ck_host) and np.array_equal(
        cv2h, cv_host
    )
    print(f"in-place row write: row {row_ok}, rest untouched {rest_ok}")
    if not (row_ok and rest_ok):
        print("FAIL: aliasing contract broken (partial-block output)")
        fails += 1

    # --- 2. multi-step accumulation: 8 kernel steps == 8 XLA steps ---
    ckk = jnp.asarray(ck_host, bf)
    cvk = jnp.asarray(cv_host, bf)
    ckx, cvx = jnp.asarray(ck_host, bf), jnp.asarray(cv_host, bf)
    max_rel = 0.0
    for step in range(8):
        r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.4, bf)
        qs, kns, vns = r(B, 1, D), r(B, 1, D), r(B, 1, D)
        p = jnp.int32(4 + step)
        ak, ckk, cvk = self_attention_decode(
            qs, kns, vns, ckk, cvk, jnp.int32(1), p, H
        )
        ckx = ckx.at[1, :, 4 + step, :].set(kns[:, 0, :])
        cvx = cvx.at[1, :, 4 + step, :].set(vns[:, 0, :])
        m = jnp.where(jnp.arange(T) <= 4 + step, 0.0, -jnp.inf)[
            None, None, None, :
        ]
        ax = np.asarray(attention(qs, ckx[1], cvx[1], H, m), np.float32)
        g = np.asarray(ak, np.float32)
        max_rel = max(
            max_rel,
            float(
                np.sqrt(((g - ax) ** 2).mean())
                / (np.sqrt((ax**2).mean()) + 1e-9)
            ),
        )
    caches_eq = np.array_equal(
        np.asarray(ckk, np.float32), np.asarray(ckx, np.float32)
    ) and np.array_equal(
        np.asarray(cvk, np.float32), np.asarray(cvx, np.float32)
    )
    print(f"multi-step: max rel-RMS {max_rel:.2e}, caches equal {caches_eq}")
    if max_rel > 1e-2 or not caches_eq:
        print("FAIL: multi-step accumulation diverged")
        fails += 1

    # --- 3. engine-level transcript parity ---
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
    for impl in ("xla", "kernel"):
        e = DecodeEngine(params, cfg.with_(self_kv_impl=impl), st)
        out4, _ = e.transcribe_window(wins, [50259] * 4, seed=0)
        out1, _ = e.transcribe_window(wins[:1], [50259], seed=0)  # B=1 ladder
        toks[impl] = (
            [None if r is None else r.tokens for r in out4],
            None if out1[0] is None else out1[0].tokens,
        )
    same4 = toks["kernel"][0] == toks["xla"][0]
    same1 = toks["kernel"][1] == toks["xla"][1]
    print(f"engine token parity: B=4 {same4}, B=1-ladder {same1}")
    for name, same, a, b in (
        ("B=4", same4, toks["kernel"][0], toks["xla"][0]),
        ("B=1", same1, [toks["kernel"][1]], [toks["xla"][1]]),
    ):
        if same:
            continue
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

    print("SELF-DECODE KERNEL GATE:", "FAIL" if fails else "PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
