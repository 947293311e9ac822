"""Whisper encoder/decoder as functional JAX.

TPU-first re-creation of the network the reference gets from
``candle_transformers::models::whisper::{model, quantized_model}``
(used via the ``Type`` dispatch in
``/root/reference/src/models/whisper/model.rs:442-491``).  Design choices:

- Pure pytree params; per-layer params are STACKED along a leading axis and
  iterated with ``lax.scan`` so a 32-layer encoder compiles as one loop.
- True incremental KV caching for decoder self-attention.  (candle caches
  only cross-attention K/V and recomputes self-attention over the whole
  prefix every step; causal self-attention makes the incremental form
  mathematically identical.)
- Static shapes everywhere: the self-attn cache is preallocated at
  ``max_target_positions`` and masked by position, so the autoregressive
  loop runs entirely inside one compiled ``lax.while_loop``.
- Matmuls accumulate in f32 (``preferred_element_type``) so bf16 weights
  keep f32 logits for sampling parity.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

Params = Dict[str, Any]

LN_EPS = 1e-5


def sinusoids(length: int, channels: int, max_timescale: float = 10_000) -> np.ndarray:
    """Fixed sinusoidal encoder position embedding (whisper convention)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def dense(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def ldense(lp: Params, name: str, x: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Layer-param dense with int8 dispatch: if ``name_q``/``name_s`` exist
    (quantize_decoder), the weight streams from HBM as int8 and dequantizes
    in-graph; otherwise the full-precision ``name`` weight is used."""
    qk = name + "_q"
    if qk in lp:
        w = lp[qk].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        y = y * lp[name + "_s"].astype(jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)
    return dense(x, lp[name], bias)


def qkv_proj(lp: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Self-attention Q/K/V projection with fused-weight dispatch.

    When the params carry a fused ``qkv_w`` [D, 3, D] (built by
    :func:`~norma_tpu.model.load.fuse_qkv`; int8 variant ``qkv_w_q`` +
    ``qkv_w_s``), the three projections run as ONE matmul — one weight
    stream from HBM and one MXU dispatch instead of three back-to-back
    GEMVs, which matters in the per-token decode hot path (the decoder
    step is weight-bandwidth-bound; see PERF.md).  Falls back to the
    separate ``q_w``/``k_w``/``v_w`` form (identical math: whisper's
    k_proj has no bias, so the fused bias carries zeros for K).
    """
    if "qkv_w_q" in lp:  # int8 fused (quantize_decoder after fuse_qkv)
        w = lp["qkv_w_q"].astype(x.dtype)
        y = jnp.einsum("...d,dce->...ce", x, w, preferred_element_type=jnp.float32)
        y = y * lp["qkv_w_s"].astype(jnp.float32)
        y = (y + lp["qkv_b"].astype(jnp.float32)).astype(x.dtype)
    elif "qkv_w" in lp:
        y = jnp.einsum(
            "...d,dce->...ce", x, lp["qkv_w"], preferred_element_type=jnp.float32
        )
        y = (y + lp["qkv_b"].astype(jnp.float32)).astype(x.dtype)
    else:
        q = ldense(lp, "q_w", x, lp["q_b"])
        k = ldense(lp, "k_w", x)  # whisper k_proj has no bias
        v = ldense(lp, "v_w", x, lp["v_b"])
        return q, k, v
    return y[..., 0, :], y[..., 1, :], y[..., 2, :]


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    # [B, T, D] -> [B, T, H, Dh]
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_heads: int,
    mask: jax.Array | None = None,
    scores_bf16: bool = False,
) -> jax.Array:
    """Multi-head attention core.  q/k/v: [B, T, D] projected inputs.

    Whisper scales q and k each by (D/H)**-0.25 before the dot product.
    ``scores_bf16`` stores the materialized [B, H, Tq, Tk] score matrix in
    bf16 between the QK matmul and the softmax — for the encoder's
    1500x1500 scores that buffer is the dominant HBM traffic of the whole
    layer (~180 MB/layer f32), so halving it is a large bandwidth win; the
    softmax itself still reduces in f32.
    """
    dh = q.shape[-1] // n_heads
    scale = dh**-0.25
    qh = _split_heads(q, n_heads) * scale
    kh = _split_heads(k, n_heads) * scale
    vh = _split_heads(v, n_heads)
    pet = jnp.bfloat16 if scores_bf16 else jnp.float32
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=pet)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh, preferred_element_type=jnp.float32)
    return _merge_heads(out.astype(q.dtype))


def attention_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_heads: int,
    chunk: int,
    scores_bf16: bool = False,
) -> jax.Array:
    """Query-chunked attention in pure XLA (no pallas_call barrier).

    Mathematically identical to :func:`attention` with no mask: the softmax
    normalizes over the FULL key axis for every query row, so chunking the
    query axis is exact (no online-softmax needed).  The win is the
    materialized score buffer: [B,H,chunk,Tk] per scan step instead of
    [B,H,Tq,Tk] — small enough (~16 MB VMEM/core) for XLA to schedule the
    QK->softmax->PV chain without round-tripping a [20,1500,1500] tensor
    through HBM, while staying inside XLA's fusion/DMA pipeline (the
    failure mode of the pallas kernel in the fused window program;
    PERF.md "Flash attention: the context-dependence finding").
    """
    b, t, d = q.shape
    if t % chunk != 0:  # fall back rather than pad (encoder T is 1500)
        return attention(q, k, v, n_heads, None, scores_bf16=scores_bf16)
    dh = d // n_heads
    scale = dh**-0.25
    kh = _split_heads(k, n_heads) * scale
    vh = _split_heads(v, n_heads)
    nc = t // chunk
    qh = (_split_heads(q, n_heads) * scale).reshape(b, nc, chunk, n_heads, dh)
    qh = qh.transpose(1, 0, 2, 3, 4)  # [nc, B, C, H, dh]
    pet = jnp.bfloat16 if scores_bf16 else jnp.float32

    def body(_, qc):
        logits = jnp.einsum("bchd,bkhd->bhck", qc, kh, preferred_element_type=pet)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhck,bkhd->bchd", w, vh, preferred_element_type=jnp.float32)
        return None, o.astype(q.dtype)

    _, out = jax.lax.scan(body, None, qh)  # [nc, B, C, H, dh]
    return out.transpose(1, 0, 2, 3, 4).reshape(b, t, n_heads * dh)


def attention_grouped(
    q: jax.Array, k: jax.Array, v: jax.Array, n_heads: int, n_groups: int
) -> jax.Array:
    """Cross-attention where ``n_groups`` query rows share one K/V stream.

    q: [G*B, Tq, D] with row ``g*B + b`` attending to k/v row ``b``;
    k, v: [B, Tk, D].  Used by the speculative temperature ladder: the G
    temperature rungs of one audio window reuse the SAME encoder cross-K/V,
    so K/V streams from HBM once per step regardless of G (tiling it G times
    would multiply the dominant per-step HBM traffic and, for large-v3's
    32-layer decoder, exceed chip memory).
    """
    gb, tq, d = q.shape
    b = k.shape[0]
    g = n_groups
    dh = d // n_heads
    scale = dh**-0.25
    qh = q.reshape(g, b, tq, n_heads, dh) * scale
    kh = _split_heads(k, n_heads) * scale
    vh = _split_heads(v, n_heads)
    logits = jnp.einsum(
        "gbqhd,bkhd->gbhqk", qh, kh, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("gbhqk,bkhd->gbqhd", w, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(gb, tq, n_heads * dh)


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    h = ldense(p, "fc1_w", x, p["fc1_b"])
    h = jax.nn.gelu(h, approximate=False)
    return ldense(p, "fc2_w", h, p["fc2_b"])


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x: [B, T, Cin]; w: [W, Cin, Cout] ('same' padding for W=3)."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _q8a8_apply(xq, xs, wq, ws, bias, pallas: bool):
    if pallas:
        from ..ops.quant_matmul import q8a8_dense_pallas

        return q8a8_dense_pallas(xq, xs, wq, ws, bias)
    from ..ops.quant_matmul import q8a8_dense

    return q8a8_dense(xq, xs, wq, ws, bias)


def _q8_dense(
    lp: Params, name: str, x: jax.Array, bias=None, pallas: bool = False
) -> jax.Array:
    """w8a8 dense (quantize_encoder): dynamic per-row int8 activations x
    stored int8 weights, int32 MXU accumulation."""
    from ..ops.quant_matmul import quantize_activations

    xq, xs = quantize_activations(x)
    return _q8a8_apply(
        xq, xs, lp[name + "_q"], lp[name + "_s"], bias, pallas
    ).astype(x.dtype)


def _qkv_proj_q8(lp: Params, x: jax.Array, pallas: bool = False):
    """Self-attention Q/K/V projection on the int8 MXU path (w8a8).

    Mirrors :func:`qkv_proj`'s fused/unfused dispatch over the
    ``quantize_encoder`` key layout; the activation row is quantized ONCE
    and shared by all three projections.
    """
    from ..ops.quant_matmul import q8a8_qkv, quantize_activations

    xq, xs = quantize_activations(x)
    if "qkv_w_q" in lp:
        if pallas:
            # Flatten the fused [in, 3, out] to one [in, 3*out] kernel
            # call (one tile grid for all three projections).
            wq3 = lp["qkv_w_q"]
            K, _, O = wq3.shape
            y = _q8a8_apply(
                xq, xs, wq3.reshape(K, 3 * O),
                lp["qkv_w_s"].reshape(3 * O),
                lp["qkv_b"].reshape(3 * O), True,
            ).reshape(*x.shape[:-1], 3, O)
            q, k, v = y[..., 0, :], y[..., 1, :], y[..., 2, :]
        else:
            q, k, v = q8a8_qkv(
                xq, xs, lp["qkv_w_q"], lp["qkv_w_s"], lp["qkv_b"]
            )
    else:
        q = _q8a8_apply(xq, xs, lp["q_w_q"], lp["q_w_s"], lp["q_b"], pallas)
        k = _q8a8_apply(xq, xs, lp["k_w_q"], lp["k_w_s"], None, pallas)
        v = _q8a8_apply(xq, xs, lp["v_w_q"], lp["v_w_s"], lp["v_b"], pallas)
    return q.astype(x.dtype), k.astype(x.dtype), v.astype(x.dtype)


def _mlp_q8(lp: Params, x: jax.Array, pallas: bool = False) -> jax.Array:
    from ..ops.quant_matmul import quantize_activations

    xq, xs = quantize_activations(x)
    h = jax.nn.gelu(
        _q8a8_apply(xq, xs, lp["fc1_w_q"], lp["fc1_w_s"], lp["fc1_b"], pallas),
        approximate=False,
    ).astype(x.dtype)
    hq, hs = quantize_activations(h)
    return _q8a8_apply(
        hq, hs, lp["fc2_w_q"], lp["fc2_w_s"], lp["fc2_b"], pallas
    ).astype(x.dtype)


def encoder_layer(
    p: Params,
    x: jax.Array,
    n_heads: int,
    attn_impl: str = "xla",
    scores_bf16: bool = False,
    chunk: int = 250,
    flash_bq: int = 512,
    flash_bk: int = 512,
    q8_mode: str = "w8a8",
) -> jax.Array:
    # quantize_encoder stacks carry fc1_w_q etc.; presence selects the
    # int8-MXU (w8a8) compute path.  The attention core (scores/softmax/PV)
    # stays bf16/f32 under every impl — only the six projection matmuls,
    # where the encoder's FLOPs are, run int8.  q8_mode="w8a16" keeps the
    # int8 storage but computes bf16 (ldense/qkv_proj dequant dispatch —
    # the fallback/ablation arm); "w8a8_pallas" issues the int8 dots as
    # explicit Pallas tiles (Plan B if XLA's s8 lowering is not native on
    # a backend; see config.encoder_q8_mode).
    w8a8 = "fc1_w_q" in p and q8_mode in ("w8a8", "w8a8_pallas")
    pallas = q8_mode == "w8a8_pallas"
    h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"])
    q, k, v = _qkv_proj_q8(p, h, pallas) if w8a8 else qkv_proj(p, h)
    if attn_impl == "xla":
        a = attention(q, k, v, n_heads, None, scores_bf16=scores_bf16)
    elif attn_impl == "chunked":
        a = attention_chunked(q, k, v, n_heads, chunk, scores_bf16=scores_bf16)
    elif attn_impl == "flash":
        from ..ops.flash_encoder import flash_self_attention

        a = flash_self_attention(q, k, v, n_heads)
    elif attn_impl == "jax_flash":
        from ..ops.flash_encoder import jax_flash_self_attention

        a = jax_flash_self_attention(
            q, k, v, n_heads, block_q=flash_bq, block_k=flash_bk
        )
    else:
        raise ValueError(f"unknown encoder_attn_impl {attn_impl!r}")
    if w8a8:
        x = x + _q8_dense(p, "o_w", a, p["o_b"], pallas)
    else:
        x = x + ldense(p, "o_w", a, p["o_b"])
    h = layer_norm(x, p["mlp_ln_g"], p["mlp_ln_b"])
    return x + (_mlp_q8(p, h, pallas) if w8a8 else _mlp(p, h))


def encode(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel: [B, n_mels, T_frames] -> audio features [B, T_frames//2, D]."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # [B, T, n_mels]
    x = x.astype(enc["conv1_w"].dtype)
    x = jax.nn.gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], 2), approximate=False)
    x = x + enc["pos"][: x.shape[1]].astype(x.dtype)

    n_heads = cfg.encoder_attention_heads
    # Non-"auto" attention impls are opt-in and TPU-only (trace-time
    # backend check keeps CPU tests and the virtual-device mesh on the
    # exact XLA attention); the legacy flash_attention=True alias now
    # selects the TUNED-tile kernel (the winning config), not the
    # 128-tile loser it originally named.
    attn_impl = cfg.encoder_attn_impl
    if cfg.flash_attention and attn_impl in ("xla", "auto"):
        attn_impl = "jax_flash"
    if attn_impl == "auto":
        # B is static at trace time: the single-stream window program
        # takes the exact-math chunked form (in-context device win on
        # v5e), batched windows keep plain XLA (chunking regresses there;
        # see config.encoder_attn_impl for the measured numbers).
        attn_impl = "chunked" if x.shape[0] == 1 else "xla"
    if jax.default_backend() != "tpu":
        attn_impl = "xla"
    # bf16 score materialization: TPU-only so CPU parity tests keep f32.
    scores_bf16 = (
        bool(cfg.encoder_scores_bf16) and jax.default_backend() == "tpu"
    )

    # NOTE a hoisted-pad variant (pad the residual stream to 1536 once
    # before the scan, thread true_len to the kernel for masking, slice
    # after) measured device-NEUTRAL on v5e: the per-layer pad ops it
    # removes (~9 ms/B=8 window in op-attribution) were already hidden
    # under other work, and the MLP fusion grew by the same amount at
    # 1536 rows.  Reverted; see PERF.md negative results.
    if cfg.encoder_q8_mode not in ("w8a8", "w8a16", "w8a8_pallas"):
        raise ValueError(
            f"encoder_q8_mode={cfg.encoder_q8_mode!r}: expected 'w8a8',"
            " 'w8a16' or 'w8a8_pallas'"
        )
    q8_mode = cfg.encoder_q8_mode
    if q8_mode == "w8a8_pallas" and jax.default_backend() != "tpu":
        q8_mode = "w8a8"  # the kernel is TPU-only; same math via XLA

    def body(carry, layer_p):
        return (
            encoder_layer(
                layer_p, carry, n_heads, attn_impl, scores_bf16,
                cfg.encoder_attn_chunk, cfg.flash_block_q, cfg.flash_block_k,
                q8_mode,
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, enc["layers"], unroll=cfg.encoder_unroll)
    return layer_norm(x, enc["ln_g"], enc["ln_b"])


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def logits_head(dec: Params, x: jax.Array) -> jax.Array:
    """Tied-embedding logits head: [..., D] -> [..., V] f32.

    Uses the int8 weight-quantized path (ops/quant_matmul) when the params
    carry a ``tok_emb_q8`` entry.  The XLA form wins on v5e: isolated
    device profiles measure it at ~90 us/step for distil-large-v3's
    [1280, 51866] head — essentially the 73 MB int8 streaming roofline —
    vs 136 us for the Pallas kernel and 177 us for the bf16 head (XLA
    fuses the int8->bf16 dequant into the matmul's weight fetch).
    """
    if "tok_emb_q4" in dec:
        # Packed-nibble int4: on TPU the Pallas kernel streams the packed
        # bytes and unpacks in VMEM (XLA would materialize the unpacked
        # weights, forfeiting the bandwidth win — unlike the w8 case,
        # where XLA fuses the plain widening convert into the fetch).
        q4 = dec["tok_emb_q4"]
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        if jax.default_backend() == "tpu":
            from ..ops.quant_matmul import w4_matmul_pallas

            y = w4_matmul_pallas(flat, q4["q"], q4["s"])
        else:
            from ..ops.quant_matmul import w4_matmul_jnp

            y = w4_matmul_jnp(flat, q4["q"], q4["s"])
        return y.reshape(*lead, y.shape[-1])
    if "tok_emb_q8" in dec:
        from ..ops.quant_matmul import w8_matmul_jnp

        q8 = dec["tok_emb_q8"]
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        y = w8_matmul_jnp(flat, q8["q"], q8["s"])
        return y.reshape(*lead, y.shape[-1])
    return jnp.dot(x, dec["tok_emb"].T, preferred_element_type=jnp.float32)


def cross_kv(params: Params, cfg: WhisperConfig, xa: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Precompute cross-attention K/V for all decoder layers.

    xa: [B, Ta, D] audio features -> (xk, xv) each [L, B, Ta, D].
    (candle's only KV cache is exactly this tensor pair; reference
    ``reset_kv_cache`` clears it — here it is simply recomputed per window.)

    Computed as ONE batched einsum over the stacked [L, D, D] projection
    weights instead of a 32-iteration scan: same per-layer contraction,
    but a single MXU dispatch (the scan form measured ~6x its compute
    roofline at B=8 on v5e).
    """
    layers = params["decoder"]["layers"]

    def proj(name: str, bias: jax.Array | None) -> jax.Array:
        qk = name + "_q"
        if qk in layers:  # int8 decoder weights (quantize_decoder)
            w = layers[qk].astype(xa.dtype)
            y = jnp.einsum("btd,lde->lbte", xa, w, preferred_element_type=jnp.float32)
            y = y * layers[name + "_s"].astype(jnp.float32)[:, None, None, :]
        else:
            y = jnp.einsum(
                "btd,lde->lbte", xa, layers[name].astype(xa.dtype),
                preferred_element_type=jnp.float32,
            )
        if bias is not None:
            y = y + bias.astype(jnp.float32)[:, None, None, :]
        return y.astype(xa.dtype)

    return proj("xk_w", None), proj("xv_w", layers["xv_b"])


def quantize_cross_kv(
    xk: jax.Array, xv: jax.Array
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Per-channel int8 quantization of the precomputed cross-attention K/V.

    xk/xv: [L, B, Ta, D] bf16 -> {"q": int8 same shape, "s": [L, B, D] f32}.

    Why: the cross-K/V stream is the decode loop's dominant per-step HBM
    traffic at batch (B=8 distil: ~123 MB/step vs ~66 MB of weights) and,
    unlike weights, scales linearly with B.  int8 halves it.  The scales
    are folded EXACTLY into the attention math (per-channel scale factors
    commute out of both contractions — onto q for the K side and onto the
    output for the V side, see :func:`attention_cross_q8`), so the only
    approximation is the int8 rounding of K/V themselves (<=0.4% of the
    per-channel max).  Quantized per window AFTER prefill (prefill's own
    cross-attention stays bf16 — it reads K/V once, so there is nothing
    to save there).  Opt-in: ``DecodeEngine(quantize_cross_kv=True)``.
    """

    def q8(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2)  # [L,B,D]
        s = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[:, :, None, :]), -127, 127
        ).astype(jnp.int8)
        return {"q": q, "s": s}

    return q8(xk), q8(xv)


def quantize_cross_kv4(
    xk: jax.Array, xv: jax.Array
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Per-channel int4 quantization of the cross-attention K/V (r4).

    Same shape contract as :func:`quantize_cross_kv` but codes live in
    [-7, 7] with scale = absmax/7 (still STORED int8 here; the kernel
    layout packs two codes per byte, ``ops.paged_cross.
    prep_cross_kv_kernel4``).  Why: at the deep-decoder batched serving
    point the int8 cross-K/V codes are the single largest per-step HBM
    stream (lv3 B=8: ~986 MB/step vs ~1043 MB of int8 weights — PERF.md
    r4 attribution); int4 halves it again.  Scale folding stays EXACT
    (same per-channel algebra); the approximation is 4-bit rounding of
    K/V (<= ~7% of the per-channel max vs int8's ~0.4%) — an
    accuracy-gated opt-in tier one rung below int8, kernel-only
    (``cross_kv_impl="kernel"`` on TPU).
    """

    def q4(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2)  # [L,B,D]
        s = jnp.maximum(amax, 1e-8) / 7.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[:, :, None, :]), -7, 7
        ).astype(jnp.int8)
        return {"q": q, "s": s}

    return q4(xk), q4(xv)


def attention_cross_q8(
    q: jax.Array,
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
) -> jax.Array:
    """Cross-attention over int8-quantized K/V (see :func:`quantize_cross_kv`).

    q: [G*B, Tq, D] (``n_groups`` G query rows share one K/V stream, as in
    :func:`attention_grouped`; G=1 is plain batched cross-attention).
    kq/vq: {"q": [B, Tk, D] int8, "s": [B, D] f32}.

    Exact scale folding: with per-channel scales the K dequant commutes
    onto q (sum_d q[d]*(k8[t,d]*sk[d]) == sum_d (q[d]*sk[d])*k8[t,d]) and
    the V dequant onto the output row.  int8 values are integers <= 127,
    exactly representable in bf16, so the MXU contractions see the same
    operands as a dequantize-then-matmul — only the memory stream halves.
    """
    gb, tq, d = q.shape
    b = kq["q"].shape[0]
    g = n_groups
    dh = d // n_heads
    # Fold BOTH whisper dh**-0.25 factors and the per-channel K scale
    # onto q, in f32 before the bf16 cast (one tiny [B,D] elementwise).
    qf = (
        q.astype(jnp.float32).reshape(g, b, tq, d)
        * kq["s"][None, :, None, :]
        * float(dh) ** -0.5
    ).astype(q.dtype)
    qh = qf.reshape(g, b, tq, n_heads, dh)
    kh = _split_heads(kq["q"].astype(q.dtype), n_heads)
    vh = _split_heads(vq["q"].astype(q.dtype), n_heads)
    logits = jnp.einsum(
        "gbqhd,bkhd->gbhqk", qh, kh, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "gbhqk,bkhd->gbqhd", w, vh, preferred_element_type=jnp.float32
    )
    out = out.reshape(g, b, tq, d) * vq["s"][None, :, None, :]
    return out.astype(q.dtype).reshape(gb, tq, d)


def attention_cross_q8_chunked(
    q: jax.Array,
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
    key_chunk: int = 500,
) -> jax.Array:
    """Key-chunked online-softmax form of :func:`attention_cross_q8`.

    Identical folded-scale math, but the int8->bf16 dequantization of K/V
    is bounded to one ``[B, key_chunk, D]`` tile per (Python-unrolled)
    step.  Why: on deep decoders at batch the full-length form's dequant
    lands OUTSIDE the attention fusion — XLA materializes a bf16 copy of
    the ~2 GB/step large-v3 B=8 cross-K/V stream, doubling effective
    traffic (the measured +45% window regression, PERF.md
    "quantize_cross_kv").  Chunking gives XLA convert+dot chains small
    enough to fuse, so the HBM stream stays int8.

    The softmax is computed with a running (max, sum) pair across chunks
    — the standard online-softmax reassociation — so outputs differ from
    the full-length form only at float-rounding level.  Selected by
    ``WhisperConfig.cross_kv_impl = "chunked"``.
    """
    gb, tq, d = q.shape
    b = kq["q"].shape[0]
    g = n_groups
    dh = d // n_heads
    ta = kq["q"].shape[1]
    # Same q-side fold as the full-length form: both whisper dh**-0.25
    # factors and the per-channel K scale, in f32 before the bf16 cast.
    qf = (
        q.astype(jnp.float32).reshape(g, b, tq, d)
        * kq["s"][None, :, None, :]
        * float(dh) ** -0.5
    ).astype(q.dtype)
    qh = qf.reshape(g, b, tq, n_heads, dh)

    m = jnp.full((g, b, n_heads, tq), -jnp.inf, jnp.float32)
    l = jnp.zeros((g, b, n_heads, tq), jnp.float32)
    acc = jnp.zeros((g, b, tq, n_heads, dh), jnp.float32)
    for c0 in range(0, ta, key_chunk):
        ck = min(key_chunk, ta - c0)
        kh = (
            jax.lax.slice_in_dim(kq["q"], c0, c0 + ck, axis=1)
            .astype(q.dtype)
            .reshape(b, ck, n_heads, dh)
        )
        vh = (
            jax.lax.slice_in_dim(vq["q"], c0, c0 + ck, axis=1)
            .astype(q.dtype)
            .reshape(b, ck, n_heads, dh)
        )
        lc = jnp.einsum(
            "gbqhd,bkhd->gbhqk", qh, kh, preferred_element_type=jnp.float32
        )
        mn = jnp.maximum(m, jnp.max(lc, axis=-1))
        p = jnp.exp(lc - mn[..., None])
        corr = jnp.exp(m - mn)
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "gbhqk,bkhd->gbqhd",
            p.astype(q.dtype),
            vh,
            preferred_element_type=jnp.float32,
        )
        acc = acc * jnp.transpose(corr, (0, 1, 3, 2))[..., None] + pv
        m = mn
    out = acc / jnp.transpose(l, (0, 1, 3, 2))[..., None]
    out = out.reshape(g, b, tq, d) * vq["s"][None, :, None, :]
    return out.astype(q.dtype).reshape(gb, tq, d)


def attention_cross_q8_a8(
    q: jax.Array,
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
) -> jax.Array:
    """Fully-int8 cross-attention: int8×int8→int32 QK and PV on the MXU.

    Unlike :func:`attention_cross_q8` (which dequantizes K/V to bf16 and
    relies on XLA fusing the convert into the dot), here K/V are only
    ever touched as int8: q is dynamically per-row int8-quantized after
    the K-scale fold, and the softmax weights are per-row int8-quantized
    before PV, so both contractions run native s8 dots (2× the bf16 MXU
    rate on v5e+, and — the point — the HBM stream is guaranteed to stay
    at int8 width regardless of XLA's fusion choices.

    Scale algebra stays exact (per-row scalars commute out of any
    contraction; int32 accumulation cannot overflow: QK ≤ 64·127², PV ≤
    1500·127² « 2³¹).  The int8 ROUNDING of q and of the softmax weights
    adds ~0.4%-of-row-max error each on top of the K/V rounding — one
    numeric tier below "chunked"/the full-length form.  Selected by
    ``WhisperConfig.cross_kv_impl = "a8"``.
    """
    gb, tq, d = q.shape
    b = kq["q"].shape[0]
    g = n_groups
    dh = d // n_heads
    ta = kq["q"].shape[1]
    qf = (
        q.astype(jnp.float32).reshape(g, b, tq, d)
        * kq["s"][None, :, None, :]
        * float(dh) ** -0.5
    )
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8) / 127.0
    qi = (
        jnp.clip(jnp.round(qf / sq), -127, 127)
        .astype(jnp.int8)
        .reshape(g, b, tq, n_heads, dh)
    )
    ki = kq["q"].reshape(b, ta, n_heads, dh)
    vi = vq["q"].reshape(b, ta, n_heads, dh)
    logits = jnp.einsum(
        "gbqhd,bkhd->gbhqk", qi, ki, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    logits = logits * jnp.transpose(sq, (0, 1, 3, 2))[:, :, :, :, None]
    w = jax.nn.softmax(logits, axis=-1)  # f32 [g,b,h,q,k]
    # Softmax rows are in [0,1] with max 1 only when one key dominates;
    # scale per row so flat distributions keep precision.
    sw = jnp.maximum(jnp.max(w, axis=-1, keepdims=True), 1e-8) / 127.0
    wi = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    out = jnp.einsum(
        "gbhqk,bkhd->gbqhd", wi, vi, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = out * jnp.transpose(sw[..., 0], (0, 1, 3, 2))[..., None]
    out = out.reshape(g, b, tq, d) * vq["s"][None, :, None, :]
    return out.astype(q.dtype).reshape(gb, tq, d)


def cross_q8_attn(
    cfg: WhisperConfig,
    q: jax.Array,
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
) -> jax.Array:
    """Dispatch the int8 cross-attention by ``cfg.cross_kv_impl``.

    The quantized form itself selects "kernel": the engine only builds
    the transposed kernel layout (``ops.paged_cross.prep_cross_kv_kernel``)
    on TPU under ``cross_kv_impl="kernel"``; everywhere else the plain
    per-channel dict arrives and the string impls below apply.
    """
    if "kT" in kq:  # transposed kernel layout (TPU-only; engine-built)
        from ..ops.paged_cross import cross_attention_q8_kernel

        return cross_attention_q8_kernel(
            q, kq, vq, n_heads, n_groups,
            heads_per_cell=cfg.cross_kv_kernel_hpc,
        )
    impl = cfg.cross_kv_impl
    if impl == "chunked":
        return attention_cross_q8_chunked(
            q, kq, vq, n_heads, n_groups, key_chunk=cfg.cross_kv_chunk
        )
    if impl == "a8":
        return attention_cross_q8_a8(q, kq, vq, n_heads, n_groups)
    if impl not in ("einsum", "kernel"):
        raise ValueError(
            "cross_kv_impl must be 'einsum', 'chunked', 'a8' or 'kernel', "
            f"got {impl!r}"
        )
    return attention_cross_q8(q, kq, vq, n_heads, n_groups)


def quantize_self_kv_cache(cache: jax.Array) -> Dict[str, jax.Array]:
    """Per-written-row int8 quantization of a self-attention KV cache.

    cache: [L, B, Tmax, D] bf16 -> {"q": int8 same shape,
    "s": [L, B, Tmax, 1] f32} (one scale per (layer, stream, position) row
    — per-channel scales can't work here because the token loop appends
    one row per step and must not requantize history).

    Why: at production ``max_target_positions`` the decode loop re-reads
    the whole self-K/V each step (large-v3 @ 448 positions: ~73 MB/step
    bf16, scaling with batch); int8 halves that stream.  Scale folding is
    EXACT: the K scale multiplies the per-key logits after the QK
    contraction, the V scale folds into the softmax weights before PV
    (:func:`attention_self_q8`).  Unwritten rows quantize to q=0 — they
    are masked out of the attention by the position mask regardless.
    Opt-in: ``DecodeEngine(quantize_self_kv=True)``.
    """
    # Same grid as the loop's per-row writes (quantize_kv_row is
    # rank-agnostic): prefix rows and loop-written rows share one cache
    # and MUST quantize bit-identically.
    q, s = quantize_kv_row(cache)
    return {"q": q, "s": s}


def quantize_kv_row(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One step's new K or V rows [B, 1, D] -> (int8 [B,1,D], s [B,1,1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def attention_self_q8(
    q: jax.Array,
    ckq: Dict[str, jax.Array],
    cvq: Dict[str, jax.Array],
    n_heads: int,
    mask: jax.Array,
) -> jax.Array:
    """Self-attention over an int8 KV cache with per-row scales.

    q: [B, 1, D]; ckq/cvq: {"q": [B, Tmax, D] int8, "s": [B, Tmax, 1] f32};
    mask: additive position mask broadcastable to [B, H, 1, Tmax].

    Exact folding with PER-ROW scales: the K dequant commutes onto the
    per-key logits (sum_d q[d]*(k8[t,d]*s[t]) == (sum_d q[d]*k8[t,d])*s[t])
    and the V dequant onto the softmax weights (sum_t w[t]*(v8[t,d]*s[t])
    == sum_t (w[t]*s[t])*v8[t,d]).  int8 values are integers <= 127 —
    exactly representable in bf16 — so the MXU sees the same operands as
    dequantize-then-attend; only the HBM stream halves.
    """
    b, tq, d = q.shape
    dh = d // n_heads
    # Both whisper dh**-0.25 factors fold onto q (k is raw integers).
    qh = _split_heads(q, n_heads) * float(dh) ** -0.5
    kh = _split_heads(ckq["q"].astype(q.dtype), n_heads)
    vh = _split_heads(cvq["q"].astype(q.dtype), n_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * ckq["s"][:, None, :, 0][:, :, None, :]  # [B,1,1,Tk]
    logits = logits + mask.astype(logits.dtype)
    w = jax.nn.softmax(logits, axis=-1)
    w = (w * cvq["s"][:, None, :, 0][:, :, None, :]).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh, preferred_element_type=jnp.float32)
    return _merge_heads(out.astype(q.dtype))


def _decoder_layer_prefill(
    lp: Params, x: jax.Array, xk: jax.Array, xv: jax.Array, n_heads: int, causal: jax.Array
):
    h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
    q, k, v = qkv_proj(lp, h)
    a = attention(q, k, v, n_heads, causal)
    x = x + ldense(lp, "o_w", a, lp["o_b"])

    h = layer_norm(x, lp["xattn_ln_g"], lp["xattn_ln_b"])
    xq = ldense(lp, "xq_w", h, lp["xq_b"])
    a = attention(xq, xk, xv, n_heads)
    x = x + ldense(lp, "xo_w", a, lp["xo_b"])

    h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
    return x + _mlp(lp, h), k, v


def decoder_prefill(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, P] int32
    xk: jax.Array,
    xv: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Process a prompt prefix; fill the self-attn cache.

    Returns (logits [B, P, V] f32, cache_k, cache_v [L, B, Tmax, D]) where
    rows [0, P) of the caches are populated.
    """
    dec = params["decoder"]
    B, P = tokens.shape
    D = cfg.d_model
    L = cfg.decoder_layers
    Tmax = cfg.max_target_positions
    n_heads = cfg.decoder_attention_heads
    dtype = dec["tok_emb"].dtype

    x = dec["tok_emb"][tokens] + dec["pos_emb"][:P].astype(dtype)
    causal = jnp.triu(jnp.full((P, P), -jnp.inf, dtype=jnp.float32), k=1)

    def body(carry, layer_in):
        lp, lxk, lxv = layer_in
        x = carry
        x, k, v = _decoder_layer_prefill(lp, x, lxk, lxv, n_heads, causal)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, (dec["layers"], xk, xv))

    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    logits = logits_head(dec, x)  # tied embedding head

    cache_k = jnp.zeros((L, B, Tmax, D), dtype)
    cache_v = jnp.zeros((L, B, Tmax, D), dtype)
    cache_k = jax.lax.dynamic_update_slice(cache_k, ks.astype(dtype), (0, 0, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, vs.astype(dtype), (0, 0, 0, 0))
    return logits, cache_k, cache_v


def _decoder_incremental_layer(
    lp, x, cstate, lxk, lxv, self_attn, cross_attn
):
    """One decoder layer of the incremental path, shared by
    :func:`decoder_step` (single token, lockstep position) and
    :func:`decoder_chunk` (C tokens, per-row positions).  The two callers
    differ ONLY in how the self-attention K/V land in and read from the
    cache (``self_attn`` owns the cache state ``cstate``: the FULL
    [L, ...] caches + layer index for the step path, the per-layer slices
    for the chunk path) and how the cross-attention is dispatched
    (``cross_attn``) — keeping one body means a fix to either path cannot
    silently diverge the speculative verify pass from the plain token
    loop.
    """
    h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
    q, k, v = qkv_proj(lp, h)
    a, cstate = self_attn(q, k, v, cstate)
    x = x + ldense(lp, "o_w", a, lp["o_b"])
    return _decoder_layer_cross_mlp(lp, x, lxk, lxv, cross_attn), cstate


def _decoder_layer_cross_mlp(lp, x, lxk, lxv, cross_attn):
    """The cross-attention + MLP tail of one decoder layer."""
    h = layer_norm(x, lp["xattn_ln_g"], lp["xattn_ln_b"])
    xq = ldense(lp, "xq_w", h, lp["xq_b"])
    x = x + ldense(lp, "xo_w", cross_attn(xq, lxk, lxv), lp["xo_b"])

    h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
    x = x + _mlp(lp, h)
    return x


def _unroll_gate(cfg: WhisperConfig, rows: int) -> int:
    """Unroll shallow decoders (distil models have 2 layers) at small row
    counts: removes the scan's per-iteration while/slice machinery from
    the per-token hot path and lets XLA prefetch both layers' weight
    DMAs eagerly.  Profiled on v5e in the production window program:
    90.8 -> 82.2 ms device at <= 6 rows, but a REGRESSION at 8 rows
    (349 -> 438 ms; the eager double prefetch pressures VMEM), hence
    the row-count gate.  Deep decoders keep a rolled scan for compile
    time.  (``cfg.decoder_scan_unroll`` overrides this gate in
    :func:`decoder_step` ONLY — the chunked verify pass keeps its B*C
    VMEM calibration regardless of the knob.)
    """
    return cfg.decoder_layers if cfg.decoder_layers <= 4 and rows <= 6 else 1


def decoder_step(
    params: Params,
    cfg: WhisperConfig,
    tok: jax.Array,  # [B] int32 — token at position ``pos``
    pos: jax.Array,  # scalar int32
    cache_k: jax.Array,  # [L, B, Tmax, D]
    cache_v: jax.Array,
    xk: jax.Array,  # [L, B', Ta, D] with B' = B // n_rungs
    xv: jax.Array,
    n_rungs: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One incremental decode step.  Returns (logits [B, V] f32, caches).

    ``n_rungs > 1`` (speculative temperature ladder) means the batch rows
    are ``n_rungs`` decode attempts per audio stream, laid out ``r*B' + b``;
    self-attention caches are per-row, while cross-attention K/V is shared
    per stream via :func:`attention_grouped`.
    """
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    # Cache-shape-driven, NOT cfg.max_target_positions: the bucketed
    # decode chain (cfg.decode_buckets) runs early tokens against a
    # CROPPED cache so the self-KV stream scales with fill.
    Tmax = (cache_k["q"] if isinstance(cache_k, dict) else cache_k).shape[2]
    dtype = dec["tok_emb"].dtype

    x = dec["tok_emb"][tok][:, None, :] + jax.lax.dynamic_slice_in_dim(
        dec["pos_emb"], pos, 1, axis=0
    ).astype(dtype)

    # Mask out cache rows beyond the current position (static-size cache).
    key_idx = jnp.arange(Tmax)
    key_mask = jnp.where(key_idx <= pos, 0.0, -jnp.inf).astype(jnp.float32)
    key_mask = key_mask[None, None, None, :]  # [1,1,1,Tmax]

    # The FULL caches ride the layer scan as CARRY (not xs/ys): each layer
    # writes only its one new [B, 1, D] row in place and reads its own
    # slice back.  The previous xs/ys form made the scan re-materialize
    # the ENTIRE [L, B, Tmax, D] cache pair every token (stacking the ys
    # is a full copy — large-v3 at mtp=448 rewrote ~73 MB/step of K/V it
    # had only appended 160 KB to) and blocked XLA from aliasing the
    # token loop's cache carry in place.
    def write_row(c_all, row, li):
        if isinstance(c_all, dict):  # int8 self-KV: quantize the new row
            rq, rs = quantize_kv_row(row)
            return {
                "q": jax.lax.dynamic_update_slice(
                    c_all["q"], rq[None], (li, 0, pos, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    c_all["s"], rs[None], (li, 0, pos, 0)
                ),
            }
        return jax.lax.dynamic_update_slice(
            c_all, row[None].astype(dtype), (li, 0, pos, 0)
        )

    def read_layer(c_all, li):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
            c_all,
        )

    # Tests exercise the kernel path off-TPU in Pallas interpret mode via
    # this env escape (hardware gate: tools/verify_self_decode_tpu.py).
    _interp_escape = os.environ.get("NORMA_SELF_KERNEL_INTERPRET") == "1"
    use_self_kernel = (
        cfg.self_kv_impl == "kernel"
        and (jax.default_backend() == "tpu" or _interp_escape)
        and not isinstance(cache_k, dict)  # bf16 caches only
    )

    def self_attn(q, k, v, cstate):
        ck_all, cv_all, li = cstate
        if use_self_kernel:
            from ..ops.self_decode import self_attention_decode

            a, ck_all, cv_all = self_attention_decode(
                q, k, v, ck_all, cv_all, li, pos, n_heads,
                heads_per_cell=cfg.self_kv_kernel_hpc,
                interpret=jax.default_backend() != "tpu",
            )
            return a, (ck_all, cv_all, li)
        ck_all = write_row(ck_all, k, li)
        cv_all = write_row(cv_all, v, li)
        ck = read_layer(ck_all, li)
        cv = read_layer(cv_all, li)
        if isinstance(ck, dict):  # int8 self-KV (quantize_self_kv)
            a = attention_self_q8(q, ck, cv, n_heads, key_mask)
        else:
            a = attention(q, ck, cv, n_heads, key_mask)
        return a, (ck_all, cv_all, li)

    def cross_attn(xq, lxk, lxv):
        if isinstance(lxk, dict):  # int8 cross-KV (quantize_cross_kv)
            return cross_q8_attn(cfg, xq, lxk, lxv, n_heads, n_rungs)
        if n_rungs == 1:
            return attention(xq, lxk, lxv, n_heads)
        return attention_grouped(xq, lxk, lxv, n_heads, n_rungs)

    # Kernel cross-KV layout ("kT", stacked [L, H, B, dh, Ta]): keep the
    # stacked arrays OUT of the scan's xs.  Scan-slicing them would
    # materialize a per-layer copy of the int8 codes before the kernel
    # reads them — two dynamic-slice fusions worth ~¼ of the lv3 B=8
    # step at mtp=448 (r4 step attribution, PERF.md) — so the stacked
    # kernel addresses the layer's block directly via a scalar-prefetched
    # layer index instead (ops/paged_cross.py).
    use_stacked_xkv = isinstance(xk, dict) and (
        "kT" in xk or "kT4" in xk
    )

    if use_stacked_xkv:

        def cross_attn_stacked(xq, li):
            from ..ops.paged_cross import cross_attention_q8_kernel_stacked

            return cross_attention_q8_kernel_stacked(
                xq, xk, xv, li, n_heads, n_rungs,
                heads_per_cell=cfg.cross_kv_kernel_hpc,
                interpret=jax.default_backend() != "tpu",
            )

        def body(carry, layer_in):
            x, ck_all, cv_all = carry
            lp, li = layer_in
            x, (ck_all, cv_all, _) = _decoder_incremental_layer(
                lp, x, (ck_all, cv_all, li), None, None, self_attn,
                lambda xq, _k, _v, li=li: cross_attn_stacked(xq, li),
            )
            return (x, ck_all, cv_all), None

        scan_xs = (dec["layers"], jnp.arange(cfg.decoder_layers))
    else:

        def body(carry, layer_in):
            x, ck_all, cv_all = carry
            lp, li, lxk, lxv = layer_in
            x, (ck_all, cv_all, _) = _decoder_incremental_layer(
                lp, x, (ck_all, cv_all, li), lxk, lxv, self_attn, cross_attn
            )
            return (x, ck_all, cv_all), None

        scan_xs = (dec["layers"], jnp.arange(cfg.decoder_layers), xk, xv)

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, cache_k, cache_v),
        scan_xs,
        # decoder_scan_unroll overrides the gate HERE only (the token
        # loop it was built to measure); decoder_chunk keeps its B*C
        # VMEM-calibrated gate.  Measured at lv3: 4/8 REGRESS (PERF.md).
        unroll=cfg.decoder_scan_unroll or _unroll_gate(cfg, tok.shape[0]),
    )

    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    logits = logits_head(dec, x[:, 0, :])
    return logits, new_k, new_v


def decoder_chunk(
    params: Params,
    cfg: WhisperConfig,
    toks: jax.Array,  # [B, C] int32 — tokens at positions pos[b] .. pos[b]+C-1
    pos: jax.Array,  # [B] int32 per-row start position
    cache_k: jax.Array,  # [L, B, Tmax, D]
    cache_v: jax.Array,
    xk: jax.Array,  # [L, B, Ta, D] bf16, or int8 dict (quantize_cross_kv)
    xv: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-token incremental decode step with PER-ROW positions.

    The speculative-decoding verify pass (decode/speculative.py): row b's
    chunk of C proposal tokens is scored in ONE forward instead of C
    sequential :func:`decoder_step` calls, so per-chunk weight and
    cross-K/V HBM streaming is paid once for C tokens.  Positions are
    per-row because streams accept different proposal counts per round and
    drift apart.  Causal within the chunk; cache rows beyond each query's
    position are masked out (stale rows left by a rejected earlier chunk
    sit at positions >= pos[b] and are overwritten here before any read).

    Returns (logits [B, C, V] f32 — logits[:, j] predicts position
    pos+j+1, caches with rows [pos, pos+C) updated).

    The caches may be allocated LONGER than ``cfg.max_target_positions``
    (the speculative loop over-allocates by the chunk width): a finished
    row keeps being fed at its final position in the lockstep loop, and
    without the slack the ``dynamic_update_slice`` start would clamp and
    silently shift the whole chunk's K/V onto earlier (live) rows.
    """
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    if isinstance(cache_k, dict):
        raise NotImplementedError(
            "decoder_chunk does not support the int8 self-KV cache "
            "(quantize_self_kv): the chunked verify path keeps bf16 "
            "caches — see the loader's speculation guard"
        )
    Tmax = cache_k.shape[2]
    dtype = dec["tok_emb"].dtype
    B, C = toks.shape

    pos_idx = pos[:, None] + jnp.arange(C)[None, :]  # [B, C]
    # Clamp the embedding gather only: positions at/beyond the limit occur
    # only on rows whose results this round are discarded (fin / len-limit),
    # but the gather must stay in bounds deterministically.
    emb_idx = jnp.minimum(pos_idx, cfg.max_target_positions - 1)
    x = dec["tok_emb"][toks] + dec["pos_emb"][emb_idx].astype(dtype)

    # Query at chunk offset ci (global pos+ci) sees cache keys <= pos+ci.
    key_idx = jnp.arange(Tmax)
    key_mask = jnp.where(
        key_idx[None, None, None, :] <= pos_idx[:, None, :, None], 0.0, -jnp.inf
    ).astype(jnp.float32)  # [B, 1, C, Tmax]

    write = jax.vmap(
        lambda c, k, p: jax.lax.dynamic_update_slice(c, k, (p, 0))
    )

    def self_attn(q, k, v, cstate):
        ck, cv = cstate
        ck = write(ck, k.astype(dtype), pos)
        cv = write(cv, v.astype(dtype), pos)
        a = attention(q, ck, cv, n_heads, key_mask)
        return a, (ck, cv)

    def cross_attn(xq, lxk, lxv):
        if isinstance(lxk, dict):  # int8 cross-KV (quantize_cross_kv)
            return cross_q8_attn(cfg, xq, lxk, lxv, n_heads)
        return attention(xq, lxk, lxv, n_heads)

    def body(x, layer_in):
        lp, ck, cv, lxk, lxv = layer_in
        x, (ck, cv) = _decoder_incremental_layer(
            lp, x, (ck, cv), lxk, lxv, self_attn, cross_attn
        )
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        body,
        x,
        (dec["layers"], cache_k, cache_v, xk, xv),
        # The gate's VMEM calibration is in 1-token rows; a chunk row
        # carries C tokens of activations, so the equivalent row count
        # here is B*C (a [4, 13] verify chunk is the 8-row regression
        # regime, not the 4-row win regime).
        unroll=_unroll_gate(cfg, B * C),
    )

    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    return logits_head(dec, x), new_k, new_v


def decoder_full(
    params: Params, cfg: WhisperConfig, tokens: jax.Array, xa: jax.Array
) -> jax.Array:
    """Non-incremental full forward (reference semantics oracle for tests).

    tokens: [B, T]; xa: [B, Ta, D].  Returns logits [B, T, V] f32.
    """
    xk, xv = cross_kv(params, cfg, xa)
    logits, _, _ = decoder_prefill(params, cfg, tokens, xk, xv)
    return logits
