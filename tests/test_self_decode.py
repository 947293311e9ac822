"""The Pallas self-attention decode kernel (norma_tpu/ops/self_decode.py).

Interpret mode pins the MATH (masking, new-row folding, in-place row
write-back, head tiling); the Mosaic lowering and the aliasing behavior
inside the real token loop are gated on hardware by
tools/verify_self_decode_tpu.py (PERF.md methodology: interpret mode has
hidden Mosaic issues every time).

Reference behavioral contract: the per-step self-attention of the
reference's token loop (candle whisper model.rs:317-329) — the kernel is
a serving-path acceleration and must be outcome-identical to the XLA
path up to bf16 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from norma_tpu.model.whisper import attention
from norma_tpu.ops.self_decode import self_attention_decode

F32 = jnp.float32


def _mk(seed, L=3, B=4, T=32, D=256):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.bfloat16)
    return r(L, B, T, D), r(L, B, T, D), r(B, 1, D), r(B, 1, D), r(B, 1, D)


def _ref(q, kn, vn, ck, cv, li, pos, H):
    """The XLA path's semantics: write row, then attend over rows <= pos."""
    T = ck.shape[2]
    ck2 = ck.at[li, :, pos, :].set(kn[:, 0, :])
    cv2 = cv.at[li, :, pos, :].set(vn[:, 0, :])
    mask = jnp.where(jnp.arange(T) <= pos, 0.0, -jnp.inf)[None, None, None, :]
    return attention(q, ck2[li], cv2[li], H, mask), ck2, cv2


@pytest.mark.parametrize("pos", [0, 7, 31])
def test_kernel_matches_xla_semantics(pos):
    H = 4  # dh=64 -> auto hpc=4 (full head tile), lane width 256
    ck, cv, q, kn, vn = _mk(0)
    li = jnp.int32(1)
    a, ck2, cv2 = self_attention_decode(
        q, kn, vn, ck, cv, li, jnp.int32(pos), H, interpret=True
    )
    a_ref, ck_ref, cv_ref = _ref(q, kn, vn, ck, cv, 1, pos, H)

    rel = np.linalg.norm(
        np.asarray(a, np.float32) - np.asarray(a_ref, np.float32)
    ) / max(np.linalg.norm(np.asarray(a_ref, np.float32)), 1e-9)
    assert rel < 5e-3, rel  # bf16-operand tier (scale-folding differs)

    # The caches: row (li, :, pos) updated, EVERYTHING else bit-untouched.
    np.testing.assert_array_equal(
        np.asarray(ck2, np.float32), np.asarray(ck_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(cv2, np.float32), np.asarray(cv_ref, np.float32)
    )


def test_stale_rows_beyond_pos_are_masked():
    """Rows >= pos may hold stale data from a longer earlier window; they
    must not leak into the output (the XLA path masks them the same way)."""
    H = 4
    ck, cv, q, kn, vn = _mk(3)
    li, pos = jnp.int32(0), jnp.int32(4)
    poisoned_k = ck.at[0, :, 5:, :].set(50.0)  # huge stale logits if read
    poisoned_v = cv.at[0, :, 5:, :].set(-50.0)
    a, *_ = self_attention_decode(
        q, kn, vn, poisoned_k, poisoned_v, li, pos, H, interpret=True
    )
    clean, *_ = self_attention_decode(
        q, kn, vn, ck, cv, li, pos, H, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(clean, np.float32)
    )


def test_head_tiling_identical():
    H = 8  # dh=32 at D=256 -> need hpc*32 % 128 == 0 -> hpc in {4, 8}
    ck, cv, q, kn, vn = _mk(5, D=512)  # dh=64: hpc in {2, 4, 8}
    li, pos = jnp.int32(2), jnp.int32(9)
    base, bk, bv = self_attention_decode(
        q, kn, vn, ck, cv, li, pos, H, heads_per_cell=2, interpret=True
    )
    for hpc in (0, 4, 8):
        a, k2, v2 = self_attention_decode(
            q, kn, vn, ck, cv, li, pos, H, heads_per_cell=hpc, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(base, np.float32),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(k2, np.float32), np.asarray(bk, np.float32)
        )
    with pytest.raises(ValueError, match="divide|multiple"):
        self_attention_decode(
            q, kn, vn, ck, cv, li, pos, H, heads_per_cell=3, interpret=True
        )
    with pytest.raises(ValueError, match="divide|multiple"):
        # hpc=1 keeps the lane width at dh=64 — not a multiple of 128.
        self_attention_decode(
            q, kn, vn, ck, cv, li, pos, H, heads_per_cell=1, interpret=True
        )


def test_decoder_step_kernel_impl_parity(monkeypatch):
    """decoder_step under self_kv_impl="kernel" (interpret escape) must
    match the XLA impl: logits to bf16 tolerance, caches updated the
    same (the kernel writes in place via aliasing; the XLA path via
    dynamic_update_slice on the scan carry)."""
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.whisper import decoder_step

    cfg = PRESETS["tiny"].with_(max_target_positions=16)
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    L, B, D = cfg.decoder_layers, 2, cfg.d_model
    rng = np.random.default_rng(11)
    ck = jnp.asarray(
        rng.standard_normal((L, B, 16, D)) * 0.3, jnp.bfloat16
    )
    cv = jnp.asarray(rng.standard_normal((L, B, 16, D)) * 0.3, jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((L, B, 8, D)) * 0.3, jnp.bfloat16)
    xv = jnp.asarray(rng.standard_normal((L, B, 8, D)) * 0.3, jnp.bfloat16)
    tok = jnp.asarray([5, 9], jnp.int32)

    kcfg = cfg.with_(self_kv_impl="kernel")
    lx, kx, vx = decoder_step(params, cfg, tok, jnp.int32(3), ck, cv, xk, xv)
    lk, kk, vk = decoder_step(params, kcfg, tok, jnp.int32(3), ck, cv, xk, xv)

    # Per-row logits correlate (softmax-scale tolerance): same argmax and
    # small relative error — bf16 scale folding differs between impls.
    rel = np.linalg.norm(np.asarray(lk - lx)) / np.linalg.norm(np.asarray(lx))
    assert rel < 2e-2, rel
    assert (
        np.asarray(jnp.argmax(lk, -1)) == np.asarray(jnp.argmax(lx, -1))
    ).all()
    # Caches: rows other than pos=3 bit-untouched by BOTH impls; the
    # written row agrees to bf16 tolerance (layers > 0 see slightly
    # different inputs between impls, so bit-equality only holds for
    # layer 0's row).
    for got, want in ((kk, kx), (vk, vx)):
        g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
        np.testing.assert_array_equal(
            np.delete(g, 3, axis=2), np.delete(w, 3, axis=2)
        )
        np.testing.assert_allclose(
            g[:, :, 3, :], w[:, :, 3, :], rtol=0.1, atol=0.05
        )
    np.testing.assert_array_equal(
        np.asarray(kk[0, :, 3, :]), np.asarray(kx[0, :, 3, :])
    )


def test_kernel_impl_falls_back_off_tpu_and_for_int8_caches(monkeypatch):
    """Off-TPU without the interpret escape, and whenever the caches are
    int8 dicts (quantize_self_kv), self_kv_impl="kernel" must silently
    use the XLA path — bit-identical results."""
    monkeypatch.delenv("NORMA_SELF_KERNEL_INTERPRET", raising=False)
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.whisper import decoder_step

    cfg = PRESETS["tiny"].with_(max_target_positions=16)
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    L, B, D = cfg.decoder_layers, 2, cfg.d_model
    rng = np.random.default_rng(13)
    ck = jnp.asarray(rng.standard_normal((L, B, 16, D)) * 0.3, jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, B, 16, D)) * 0.3, jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((L, B, 8, D)) * 0.3, jnp.bfloat16)
    xv = jnp.asarray(rng.standard_normal((L, B, 8, D)) * 0.3, jnp.bfloat16)
    tok = jnp.asarray([5, 9], jnp.int32)

    kcfg = cfg.with_(self_kv_impl="kernel")
    lx, kx, vx = decoder_step(params, cfg, tok, jnp.int32(3), ck, cv, xk, xv)
    lk, kk, vk = decoder_step(params, kcfg, tok, jnp.int32(3), ck, cv, xk, xv)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))

    # int8 self-KV caches: dicts -> the kernel gate must not take them
    # even with the escape on.
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")
    from norma_tpu.model.whisper import quantize_self_kv_cache

    ckq, cvq = quantize_self_kv_cache(ck), quantize_self_kv_cache(cv)
    l8x, *_ = decoder_step(params, cfg, tok, jnp.int32(3), ckq, cvq, xk, xv)
    l8k, *_ = decoder_step(params, kcfg, tok, jnp.int32(3), ckq, cvq, xk, xv)
    np.testing.assert_array_equal(np.asarray(l8k), np.asarray(l8x))
