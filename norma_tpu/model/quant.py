"""Quantization helpers for model params.

Two tiers replacing the reference's q8_0 storage+compute path (candle
quantized_model, monolingual.rs:230-235):

  - :func:`quantize_logits_head` — int8 tied-embedding head only (the
    single largest per-token weight read).
  - :func:`quantize_decoder` — every decoder-layer matmul weight stays
    per-output-channel int8 on device (self/cross attention projections and
    both MLP matrices), halving the decode hot path's HBM bytes and
    resident size.  The decoder compute stays bf16 (w8a16): the decode
    loop is weight-BANDWIDTH-bound, so only the stored bytes matter.
  - :func:`quantize_encoder` — w8a8: encoder-layer weights stored int8 AND
    the matmuls run on the MXU's native int8 path (dynamically per-row
    quantized activations, int32 accumulation — 2x the bf16 multiplier
    rate on TPU v5e+).  The encoder is the opposite regime from the
    decoder: it runs once per window over 1500 rows, so its matmuls are
    COMPUTE-bound and weight-only int8 buys nothing — only a faster
    multiplier helps.  Changes numerics (the activation grid, ~0.4% of
    each row's max); opt-in, like ``encoder_scores_bf16``.
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
    # Symmetric with the int4 variant's pop of tok_emb_q8: logits_head
    # dispatches q4 first, so a leftover int4 head would silently override
    # this explicit int8 request (and keep both copies resident).
    dec.pop("tok_emb_q4", None)
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

# Encoder layers have no cross-attention; everything else matches.
ENCODER_W8_KEYS = (
    "qkv_w", "q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w",
)


def _quantize_layer_stack(layers: dict, keys) -> dict:
    """Per-(layer, out-channel) symmetric int8 over a stacked layer pytree.

    Each weight ``name`` [L, in, *out] present in ``keys`` is replaced by
    ``name_q`` (int8; axis 1 is the contraction) + ``name_s`` (f32
    [L, *out]).  Works on fused (``qkv_w`` [L, in, 3, out]) and unfused
    stacks.
    """
    import jax.numpy as jnp

    layers = dict(layers)
    for name in keys:
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
    return layers


def quantize_decoder(params: dict, logits: str = "int8") -> dict:
    """Return params with all decoder-layer matmul weights as int8.

    Each stacked weight ``name`` [L, in, *out] is replaced by ``name_q``
    (int8, per-(layer, out-channel) symmetric; axis 1 is the contraction)
    + ``name_s`` (f32 [L, *out]); the logits head is quantized too —
    int8 by default, or blockwise-int4 with ``logits="int4"`` (the two
    tiers are orthogonal, so an explicit int4 head request must not be
    downgraded by also quantizing the layers).
    Works on fused (``qkv_w`` [L, in, 3, out]) and unfused layer stacks.
    """
    if logits == "int4":
        out = quantize_logits_head_int4(params)
    elif logits in (True, "int8"):
        out = quantize_logits_head(params)
    else:
        raise ValueError(f"logits={logits!r}: expected 'int8' or 'int4'")
    dec = dict(out["decoder"])
    dec["layers"] = _quantize_layer_stack(dec["layers"], DECODER_W8_KEYS)
    out["decoder"] = dec
    return out


def quantize_encoder(params: dict) -> dict:
    """Return params with encoder-layer matmul weights as int8 (w8a8).

    Same storage layout as :func:`quantize_decoder` (``name_q`` int8 +
    ``name_s`` f32 per-(layer, out-channel)), but the encoder forward
    DISPATCHES DIFFERENTLY on these keys: activations are dynamically
    per-row int8-quantized and the matmul accumulates int8 x int8 -> int32
    on the MXU (:func:`~norma_tpu.ops.quant_matmul.q8a8_dense`), which
    doubles the multiplier rate on v5e+ — the right lever for the
    compute-bound encoder, where the reference has no quantized-compute
    equivalent at all (candle's quantized encoder dequantizes to float
    before every matmul).  Conv stem, LayerNorms and the positional table
    stay full precision (negligible FLOPs, accuracy-critical).

    NUMERICS: unlike weight-only int8, the activation grid changes results
    (<= ~0.4% of each row's absmax per matmul input).  Opt-in via
    ``quantize_encoder=True`` in the loaders; gate on real-audio WER
    before production use, as with ``encoder_scores_bf16``.
    """
    out = dict(params)
    enc = dict(out["encoder"])
    enc["layers"] = _quantize_layer_stack(enc["layers"], ENCODER_W8_KEYS)
    out["encoder"] = enc
    return out
