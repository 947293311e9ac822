"""The fused self-attention block kernel (norma_tpu/ops/fused_self_block.py).

Interpret mode pins the MATH (LayerNorm, fused-QKV GEMV with int8 scale
folding, masked attention with the new-row fold, in-place cache row
write, out projection + residual); the Mosaic lowering and the aliasing
behavior inside the real token loop are gated on hardware by
tools/verify_fused_block_tpu.py (PERF.md methodology: interpret mode has
hidden Mosaic issues every time).

Reference behavioral contract: one decoder layer of the reference's
token hot loop (candle whisper model.rs:317-329) — the kernel is a
serving-path acceleration and must be outcome-identical to the XLA path
up to bf16 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from norma_tpu.model.whisper import attention, layer_norm, ldense, qkv_proj
from norma_tpu.ops.fused_self_block import fused_self_attention_block

L, B, T, D, H = 3, 4, 32, 256, 4
DH = D // H


def _params(seed, quantized):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.bfloat16)
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
        p["qkv_w_s"] = r(L, 3, D) * 0.01 + 0.02
        p["o_w_q"] = jnp.asarray(rng.integers(-127, 128, (L, D, D)), jnp.int8)
        p["o_w_s"] = r(L, D) * 0.01 + 0.02
    else:
        p["qkv_w"] = r(L, D, 3, D) * 0.2
        p["o_w"] = r(L, D, D) * 0.2
    return p


def _mk(seed):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.bfloat16)
    return r(L, B, T, D), r(L, B, T, D), r(B, 1, D)


def _lp(p, li):
    return {k: v[li] for k, v in p.items()}


def _ref(p, x, ck, cv, li, pos):
    """The XLA path's exact math for the block (whisper.py decoder_step
    self path with self_kv_impl="xla")."""
    lp = _lp(p, li)
    h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
    q, k, v = qkv_proj(lp, h)
    ck2 = ck.at[li, :, pos, :].set(k[:, 0, :].astype(ck.dtype))
    cv2 = cv.at[li, :, pos, :].set(v[:, 0, :].astype(cv.dtype))
    mask = jnp.where(jnp.arange(T) <= pos, 0.0, -jnp.inf)[None, None, None, :]
    a = attention(q, ck2[li], cv2[li], H, mask)
    return x + ldense(lp, "o_w", a, lp["o_b"]), ck2, cv2


def _call(p, x, ck, cv, li, pos):
    return fused_self_attention_block(
        x, ck, cv, jnp.int32(li), jnp.int32(pos), H,
        ln_g=p["attn_ln_g"], ln_b=p["attn_ln_b"],
        qkv_b=p["qkv_b"], o_b=p["o_b"],
        qkv_w=p.get("qkv_w"), qkv_w_q=p.get("qkv_w_q"),
        qkv_w_s=p.get("qkv_w_s"),
        o_w=p.get("o_w"), o_w_q=p.get("o_w_q"), o_w_s=p.get("o_w_s"),
        interpret=True,
    )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("pos", [0, 7, 31])
def test_block_matches_xla_semantics(pos, quantized):
    p = _params(0, quantized)
    ck, cv, x = _mk(1)
    xo, ck2, cv2 = _call(p, x, ck, cv, 1, pos)
    xr, ckr, cvr = _ref(p, x, ck, cv, 1, pos)

    rel = np.linalg.norm(
        np.asarray(xo, np.float32) - np.asarray(xr, np.float32)
    ) / max(np.linalg.norm(np.asarray(xr, np.float32)), 1e-9)
    assert rel < 5e-3, rel  # bf16-operand tier

    # Caches: row (li, :, pos) holds the kernel's K/V (bf16 tolerance vs
    # the XLA projection), EVERYTHING else bit-untouched.
    for got, want in ((ck2, ckr), (cv2, cvr)):
        g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
        np.testing.assert_array_equal(
            np.delete(g, pos, axis=2), np.delete(w, pos, axis=2)
        )
        np.testing.assert_allclose(
            g[1, :, pos, :], w[1, :, pos, :], rtol=0.1, atol=0.05
        )


def test_stale_rows_beyond_pos_are_masked():
    p = _params(2, True)
    ck, cv, x = _mk(3)
    pos = 4
    pk = ck.at[0, :, pos + 1:, :].set(50.0)
    pv = cv.at[0, :, pos + 1:, :].set(-50.0)
    a, *_ = _call(p, x, pk, pv, 0, pos)
    clean, *_ = _call(p, x, ck, cv, 0, pos)
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(clean, np.float32)
    )


def test_rejects_mixed_weight_forms():
    p = _params(4, False)
    ck, cv, x = _mk(5)
    with pytest.raises(ValueError, match="not a mix"):
        fused_self_attention_block(
            x, ck, cv, jnp.int32(0), jnp.int32(1), H,
            ln_g=p["attn_ln_g"], ln_b=p["attn_ln_b"],
            qkv_b=p["qkv_b"], o_b=p["o_b"],
            qkv_w=p["qkv_w"],  # bf16 qkv but no o_w
            interpret=True,
        )


@pytest.mark.parametrize("quantized", [False, True])
def test_decoder_step_fused_impl_parity(monkeypatch, quantized):
    """decoder_step under self_kv_impl="fused" (interpret escape) must
    match the XLA impl: logits to bf16 tolerance, same argmax, caches
    updated the same way."""
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder
    from norma_tpu.model.whisper import decoder_step

    cfg = PRESETS["tiny"].with_(max_target_positions=16)
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    if quantized:
        params = quantize_decoder(params)
    Ld, Bd, Dd = cfg.decoder_layers, 2, cfg.d_model
    rng = np.random.default_rng(11)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.bfloat16)
    ck, cv = r(Ld, Bd, 16, Dd), r(Ld, Bd, 16, Dd)
    xk, xv = r(Ld, Bd, 8, Dd), r(Ld, Bd, 8, Dd)
    tok = jnp.asarray([5, 9], jnp.int32)

    fcfg = cfg.with_(self_kv_impl="fused")
    lx, kx, vx = decoder_step(params, cfg, tok, jnp.int32(3), ck, cv, xk, xv)
    lf, kf, vf = decoder_step(params, fcfg, tok, jnp.int32(3), ck, cv, xk, xv)

    rel = np.linalg.norm(np.asarray(lf - lx)) / np.linalg.norm(np.asarray(lx))
    assert rel < 2e-2, rel
    assert (
        np.asarray(jnp.argmax(lf, -1)) == np.asarray(jnp.argmax(lx, -1))
    ).all()
    for got, want in ((kf, kx), (vf, vx)):
        g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
        np.testing.assert_array_equal(
            np.delete(g, 3, axis=2), np.delete(w, 3, axis=2)
        )
        np.testing.assert_allclose(
            g[:, :, 3, :], w[:, :, 3, :], rtol=0.1, atol=0.05
        )


def test_fused_impl_falls_back_off_tpu_and_without_fused_params(monkeypatch):
    """Off-TPU without the interpret escape, and whenever the params lack
    the fused-QKV form or the caches are int8 dicts, self_kv_impl="fused"
    must silently use the XLA path — bit-identical results."""
    monkeypatch.delenv("NORMA_SELF_KERNEL_INTERPRET", raising=False)
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.whisper import decoder_step, quantize_self_kv_cache

    cfg = PRESETS["tiny"].with_(max_target_positions=16)
    fused = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    unfused = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    Ld, Bd, Dd = cfg.decoder_layers, 2, cfg.d_model
    rng = np.random.default_rng(13)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.bfloat16)
    ck, cv = r(Ld, Bd, 16, Dd), r(Ld, Bd, 16, Dd)
    xk, xv = r(Ld, Bd, 8, Dd), r(Ld, Bd, 8, Dd)
    tok = jnp.asarray([5, 9], jnp.int32)

    fcfg = cfg.with_(self_kv_impl="fused")
    lx, *_ = decoder_step(fused, cfg, tok, jnp.int32(3), ck, cv, xk, xv)
    lf, *_ = decoder_step(fused, fcfg, tok, jnp.int32(3), ck, cv, xk, xv)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lx))

    # Unfused params: even with the escape on, "fused" needs qkv_w.
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")
    lux, *_ = decoder_step(unfused, cfg, tok, jnp.int32(3), ck, cv, xk, xv)
    luf, *_ = decoder_step(unfused, fcfg, tok, jnp.int32(3), ck, cv, xk, xv)
    np.testing.assert_array_equal(np.asarray(luf), np.asarray(lux))

    # int8 self-KV caches: dicts -> the fused gate must not take them.
    ckq, cvq = quantize_self_kv_cache(ck), quantize_self_kv_cache(cv)
    l8x, *_ = decoder_step(fused, cfg, tok, jnp.int32(3), ckq, cvq, xk, xv)
    l8f, *_ = decoder_step(fused, fcfg, tok, jnp.int32(3), ckq, cvq, xk, xv)
    np.testing.assert_array_equal(np.asarray(l8f), np.asarray(l8x))
