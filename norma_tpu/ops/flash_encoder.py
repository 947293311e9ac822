"""Flash attention for the encoder's 1500-position self-attention.

Standard attention materializes [B, H, 1500, 1500] score tensors per layer
(~90 MB bf16 each, x32 layers of HBM traffic for distil-large-v3); the
fused flash kernel keeps tiles in VMEM.  Whisper's sequence length (1500)
is not a lane multiple, so inputs are padded to 1536 with segment-id
masking (pad keys never attend real queries and vice versa).

Opt-in via ``WhisperConfig.flash_attention`` (TPU backend only; other
backends and the SPMD mesh path keep the XLA attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tiling import round_up as _round_up


def flash_self_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, n_heads: int, block_sizes=None
):
    """q/k/v: [B, T, D] projected inputs (whisper scaling applied inside).

    Returns [B, T, D] attention output, numerically matching the standard
    path (dh**-0.25 on q and k == sm_scale dh**-0.5 on logits).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, T, D = q.shape
    dh = D // n_heads
    Tp = _round_up(T, 512)

    def to_heads(x):
        x = x.reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)  # [B,H,T,dh]
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        return x

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    if Tp != T:
        seg = jnp.concatenate(
            [jnp.ones((B, T), jnp.int32), jnp.zeros((B, Tp - T), jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    out = flash_attention(
        qh, kh, vh,
        segment_ids=segment_ids,
        causal=False,
        sm_scale=float(dh) ** -0.5,
        block_sizes=block_sizes,
    )  # [B,H,Tp,dh]
    out = out[:, :, :T, :].transpose(0, 2, 1, 3).reshape(B, T, D)
    return out.astype(q.dtype)


def jax_flash_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_heads: int,
    block_q: int = 512,
    block_k: int = 512,
):
    """Flash attention with v5e-tuned block sizes.

    The default BlockSizes (128/128/128) drive a 12x12 grid per head over
    the padded 1536-length sequence and LOSE in the production window
    program (597 ms B=8 vs 348 baseline); 512x512 tiles cut the
    grid/pipeline overhead, raise MXU occupancy per step (512x512 scores
    = 1 MB f32, comfortably inside VMEM next to the K/V tiles), and WIN
    (279 ms) — measured in-context on v5e, tools/perf_encoder_ab.py.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # Clamp tiles to the padded sequence length: the tuned defaults
    # (1536 = whisper's padded 1500) exceed shorter encoders' sequences
    # and pallas' BlockSizes verification rejects block > seq_len.
    Tp = _round_up(q.shape[1], 512)
    block_q = min(block_q, Tp)
    block_k = min(block_k, Tp)
    bs = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1
    )
    return flash_self_attention(q, k, v, n_heads, block_sizes=bs)
