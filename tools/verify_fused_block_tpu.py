"""Hardware gate for self_kv_impl="fused" (ops/fused_self_block.py).

Pallas kernels MUST be verified on hardware (interpret mode has hidden
Mosaic issues every time — PERF.md methodology).  Beyond the self-decode
kernel's aliasing risk, this kernel computes the QKV and out-proj GEMVs
in-cell from weight blocks indexed off the STACKED parameter arrays, so
a wrong index map would read another layer's weights silently.  Checks:

1. op-level at production dims (lv3 decoder), BOTH weight forms (bf16
   and int8/quantize_decoder): block output vs the XLA path's exact math
   (bf16-operand tier), the written cache row within projection
   tolerance, every OTHER cache element bit-untouched.
2. multi-step: 8 sequential fused steps vs 8 XLA steps on the same
   weights — residual stream and caches must track (tolerance on the
   stream, equality on untouched rows).
3. engine-level: transcribe_window under self_kv_impl="fused" vs "xla"
   on a seeded checkpoint — B=4 sequential ladder and B=1 grouped
   ladder, bf16 and w8 params.  Knife-edge mid-sequence flips are
   rounding; early divergence is a layout/index-map bug.

Run ON TPU:  python tools/verify_fused_block_tpu.py
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

    from norma_tpu.model.whisper import attention, layer_norm, ldense, qkv_proj
    from norma_tpu.ops.fused_self_block import fused_self_attention_block

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    rng = np.random.default_rng(0)
    fails = 0
    bf = jnp.bfloat16

    L, B, T, D, H = 4, 8, 448, 1280, 20

    def mk_params(quantized):
        r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, bf)
        p = {
            "attn_ln_g": r(L, D) + 1.0,
            "attn_ln_b": r(L, D),
            "qkv_b": r(L, 3, D),
            "o_b": r(L, D),
        }
        if quantized:
            p["qkv_w_q"] = jnp.asarray(
                rng.integers(-127, 128, (L, D, 3, D)), jnp.int8
            )
            p["qkv_w_s"] = r(L, 3, D) * 0.003 + 0.004
            p["o_w_q"] = jnp.asarray(
                rng.integers(-127, 128, (L, D, D)), jnp.int8
            )
            p["o_w_s"] = r(L, D) * 0.003 + 0.004
        else:
            p["qkv_w"] = r(L, D, 3, D) * 0.05
            p["o_w"] = r(L, D, D) * 0.05
        return p

    def ref_block(p, x, ck, cv, li, pos):
        lp = {k: v[li] for k, v in p.items()}
        h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
        q, k, v = qkv_proj(lp, h)
        ck2 = ck.at[li, :, pos, :].set(k[:, 0, :].astype(ck.dtype))
        cv2 = cv.at[li, :, pos, :].set(v[:, 0, :].astype(cv.dtype))
        mask = jnp.where(jnp.arange(T) <= pos, 0.0, -jnp.inf)[
            None, None, None, :
        ]
        a = attention(q, ck2[li], cv2[li], H, mask)
        return x + ldense(lp, "o_w", a, lp["o_b"]), ck2, cv2

    def call(p, x, ck, cv, li, pos):
        return fused_self_attention_block(
            x, ck, cv, jnp.int32(li), jnp.int32(pos), H,
            ln_g=p["attn_ln_g"], ln_b=p["attn_ln_b"],
            qkv_b=p["qkv_b"], o_b=p["o_b"],
            qkv_w=p.get("qkv_w"), qkv_w_q=p.get("qkv_w_q"),
            qkv_w_s=p.get("qkv_w_s"),
            o_w=p.get("o_w"), o_w_q=p.get("o_w_q"), o_w_s=p.get("o_w_s"),
        )

    # --- 1. op-level, both weight forms ---
    for quantized in (False, True):
        p = mk_params(quantized)
        ck = jnp.asarray(rng.standard_normal((L, B, T, D)) * 0.5, bf)
        cv = jnp.asarray(rng.standard_normal((L, B, T, D)) * 0.5, bf)
        x = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.3, bf)
        li, pos = 2, 224
        ckh = np.asarray(ck, np.float32)
        cvh = np.asarray(cv, np.float32)

        xo, ck2, cv2 = call(p, x, ck, cv, li, pos)
        xr, ckr, cvr = ref_block(
            p, x, jnp.asarray(ckh, bf), jnp.asarray(cvh, bf), li, pos
        )
        got, want = np.asarray(xo, np.float32), np.asarray(xr, np.float32)
        rel = float(
            np.sqrt(((got - want) ** 2).mean())
            / (np.sqrt((want**2).mean()) + 1e-9)
        )
        tag = "int8" if quantized else "bf16"
        print(f"op-level rel-RMS fused vs XLA ({tag}, B=8): {rel:.2e}")
        if rel > 1e-2:
            print("FAIL: op-level drift above the bf16-operand tier")
            fails += 1

        ck2h = np.asarray(ck2, np.float32)
        cv2h = np.asarray(cv2, np.float32)
        ckrh = np.asarray(ckr, np.float32)
        cvrh = np.asarray(cvr, np.float32)
        row_close = np.allclose(
            ck2h[li, :, pos, :], ckrh[li, :, pos, :], rtol=0.1, atol=0.05
        ) and np.allclose(
            cv2h[li, :, pos, :], cvrh[li, :, pos, :], rtol=0.1, atol=0.05
        )
        ck2h[li, :, pos, :] = ckh[li, :, pos, :]
        cv2h[li, :, pos, :] = cvh[li, :, pos, :]
        rest_ok = np.array_equal(ck2h, ckh) and np.array_equal(cv2h, cvh)
        print(f"  in-place row write: row {row_close}, rest untouched {rest_ok}")
        if not (row_close and rest_ok):
            print("FAIL: aliasing contract broken (partial-block output)")
            fails += 1

    # --- 2. multi-step accumulation (int8 form, the serving stack) ---
    p = mk_params(True)
    ckh = np.asarray(
        rng.standard_normal((L, B, T, D)) * 0.5, np.float32
    )
    cvh = np.asarray(rng.standard_normal((L, B, T, D)) * 0.5, np.float32)
    ckk, cvk = jnp.asarray(ckh, bf), jnp.asarray(cvh, bf)
    ckx, cvx = jnp.asarray(ckh, bf), jnp.asarray(cvh, bf)
    max_rel = 0.0
    for step in range(8):
        xs = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.3, bf)
        posn = 4 + step
        xk_, ckk, cvk = call(p, xs, ckk, cvk, 1, posn)
        xr_, ckx, cvx = ref_block(p, xs, ckx, cvx, 1, posn)
        g, w = np.asarray(xk_, np.float32), np.asarray(xr_, np.float32)
        max_rel = max(
            max_rel,
            float(
                np.sqrt(((g - w) ** 2).mean())
                / (np.sqrt((w**2).mean()) + 1e-9)
            ),
        )
    # Untouched rows must stay bit-equal between the two cache trails.
    kk, kx = np.asarray(ckk, np.float32), np.asarray(ckx, np.float32)
    vk, vx = np.asarray(cvk, np.float32), np.asarray(cvx, np.float32)
    sel = np.ones(T, bool)
    sel[4:12] = False
    rest_eq = np.array_equal(kk[:, :, sel], kx[:, :, sel]) and np.array_equal(
        vk[:, :, sel], vx[:, :, sel]
    )
    rows_close = np.allclose(
        kk[1, :, 4:12], kx[1, :, 4:12], rtol=0.1, atol=0.05
    ) and np.allclose(vk[1, :, 4:12], vx[1, :, 4:12], rtol=0.1, atol=0.05)
    print(
        f"multi-step: max rel-RMS {max_rel:.2e}, rest equal {rest_eq}, "
        f"written rows close {rows_close}"
    )
    if max_rel > 2e-2 or not rest_eq or not rows_close:
        print("FAIL: multi-step accumulation diverged")
        fails += 1

    # --- 3. engine-level transcript parity (bf16 and w8 params) ---
    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=48)
    base = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
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
    for tag, params in (
        ("bf16", jax.device_put(base, dev)),
        ("w8", jax.device_put(quantize_decoder(base), dev)),
    ):
        toks = {}
        for impl in ("xla", "fused"):
            e = DecodeEngine(params, cfg.with_(self_kv_impl=impl), st)
            out4, _ = e.transcribe_window(wins, [50259] * 4, seed=0)
            out1, _ = e.transcribe_window(wins[:1], [50259], seed=0)
            toks[impl] = (
                [None if r is None else r.tokens for r in out4],
                None if out1[0] is None else out1[0].tokens,
            )
        same4 = toks["fused"][0] == toks["xla"][0]
        same1 = toks["fused"][1] == toks["xla"][1]
        print(f"engine token parity ({tag}): B=4 {same4}, B=1-ladder {same1}")
        for name, same, a, b in (
            ("B=4", same4, toks["fused"][0], toks["xla"][0]),
            ("B=1", same1, [toks["fused"][1]], [toks["xla"][1]]),
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
                        f"FAIL: {tag} {name} diverges at prefix {pre}: "
                        f"{ra[:6]} vs {rb[:6]}"
                    )
                    fails += 1
                elif ra != rb:
                    print(
                        f"  {tag} {name} mid-sequence flip at {pre} "
                        f"(rounding tier)"
                    )

    print("FUSED SELF-BLOCK GATE:", "FAIL" if fails else "PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
