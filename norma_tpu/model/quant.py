"""Quantization helpers for model params."""

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
