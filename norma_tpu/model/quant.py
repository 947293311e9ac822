"""Quantization helpers for model params.

Two tiers replacing the reference's q8_0 storage+compute path (candle
quantized_model, monolingual.rs:230-235):

  - :func:`quantize_logits_head` — int8 tied-embedding head only (the
    single largest per-token weight read).
  - :func:`quantize_decoder` — every decoder-layer matmul weight stays
    per-output-channel int8 on device (self/cross attention projections and
    both MLP matrices), halving the decode hot path's HBM bytes and
    resident size.  The encoder stays bf16/f32 (compute-bound, runs once
    per window).
"""

from __future__ import annotations

import numpy as np

from ..ops.quant_matmul import quantize_per_channel


def quantize_logits_head(params: dict) -> dict:
    """Return params with an int8 tied-embedding head added.

    The [D, V] logits matmul dominates the per-token HBM traffic; int8
    weights halve it.  The original tok_emb stays (the [tokens] embedding
    gather is cheap and stays full precision).
    """
    dec = dict(params["decoder"])
    w = np.asarray(dec["tok_emb"], np.float32).T  # [D, V]
    q, s = quantize_per_channel(w)
    dec["tok_emb_q8"] = {"q": q, "s": s}
    out = dict(params)
    out["decoder"] = dec
    return out


def quantize_logits_head_int4(params: dict, block: int = 64) -> dict:
    """Return params with a blockwise-int4 tied-embedding head added.

    Halves the int8 head's weight stream again (the head measures AT its
    int8 streaming roofline, so bytes are the only remaining lever —
    PERF.md).  Per-(input-block, output-channel) scales bound the grid
    error; opt-in via ``quantize_logits="int4"`` in the loaders.
    Takes precedence over an existing tok_emb_q8 in logits_head dispatch.
    """
    from ..ops.quant_matmul import quantize_blockwise_int4

    dec = dict(params["decoder"])
    w = np.asarray(dec["tok_emb"], np.float32).T  # [D, V]
    q, s = quantize_blockwise_int4(w, block=block)
    dec["tok_emb_q4"] = {"q": q, "s": s}
    dec.pop("tok_emb_q8", None)
    out = dict(params)
    out["decoder"] = dec
    return out


# Decoder-layer weight matrices eligible for int8 (stacked [L, in, ...out]).
# ``qkv_w`` is the fused [L, in, 3, out] form (load.fuse_qkv); unfused
# params carry the separate q_w/k_w/v_w instead.
DECODER_W8_KEYS = (
    "qkv_w", "q_w", "k_w", "v_w", "o_w",
    "xq_w", "xk_w", "xv_w", "xo_w",
    "fc1_w", "fc2_w",
)


def quantize_decoder(params: dict) -> dict:
    """Return params with all decoder-layer matmul weights as int8.

    Each stacked weight ``name`` [L, in, *out] is replaced by ``name_q``
    (int8, per-(layer, out-channel) symmetric; axis 1 is the contraction)
    + ``name_s`` (f32 [L, *out]); the logits head is quantized too.
    Works on fused (``qkv_w`` [L, in, 3, out]) and unfused layer stacks.
    """
    import jax.numpy as jnp

    out = quantize_logits_head(params)
    dec = dict(out["decoder"])
    layers = dict(dec["layers"])
    for name in DECODER_W8_KEYS:
        if name not in layers:
            continue
        w = np.asarray(layers[name], np.float32)  # [L, in, *out]
        amax = np.abs(w).max(axis=1)  # [L, *out]
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(
            np.round(w / np.expand_dims(scale, 1)), -127, 127
        ).astype(np.int8)
        del layers[name]
        layers[name + "_q"] = jnp.asarray(q)
        layers[name + "_s"] = jnp.asarray(scale)
    dec["layers"] = layers
    out["decoder"] = dec
    return out
