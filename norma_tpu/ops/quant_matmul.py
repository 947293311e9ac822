"""Int8 weight-quantized matmul (w8a16) for the decode hot path.

The incremental decode step is weight-bandwidth-bound: each token reads the
whole decoder stack + the tied embedding head (~238 MB bf16 for
distil-large-v3, of which the [1280, 51866] logits head alone is 132 MB).
Storing weights as per-output-channel symmetric int8 halves the bytes
streamed from HBM; the Pallas kernel dequantizes tiles in VMEM and runs the
matmul on the MXU in bf16, so accuracy loss is bounded by the int8 weight
grid (~0.4% RMS), not by activation quantization.

This replaces the reference's q8_0 *storage* path (candle quantized_model,
monolingual.rs:230-235) with an actual quantized *compute* path; GGUF q8_0
checkpoints can be re-blocked into this layout losslessly modulo the
per-32-block -> per-channel scale change.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_per_channel(w) -> Tuple[jax.Array, jax.Array]:
    """[in, out] float weights -> (int8 [in, out], f32 scale [out])."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def w8_matmul_jnp(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """Reference path: [B, in] @ int8 [in, out] * scale -> [B, out] f32."""
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return y * scale[None, :].astype(jnp.float32)


def _w8_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)  # int8 tile -> bf16 in VMEM
    y = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = y * s_ref[0, :][None, :]


def w8_matmul_pallas(
    x: jax.Array,
    q: jax.Array,
    scale: jax.Array,
    block_out: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Pallas w8a16 matmul: x [B, in] (bf16), q [in, out] int8 -> [B, out] f32.

    Streams int8 weight tiles HBM->VMEM (half the bf16 bytes), dequantizes
    in VMEM, matmuls in bf16 on the MXU.  ``out`` is padded to block_out.
    """
    from jax.experimental import pallas as pl

    B, IN = x.shape
    IN2, OUT = q.shape
    assert IN == IN2
    pad = (-OUT) % block_out
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, (0, pad))
    OUTP = OUT + pad
    s2 = scale.reshape(1, OUTP)

    out = pl.pallas_call(
        _w8_kernel,
        grid=(OUTP // block_out,),
        in_specs=[
            pl.BlockSpec((B, IN), lambda j: (0, 0)),
            pl.BlockSpec((IN, block_out), lambda j: (0, j)),
            pl.BlockSpec((1, block_out), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, OUTP), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), q, s2)
    return out[:, :OUT]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def w8_logits(x, q, scale, use_pallas: bool = True):
    if use_pallas:
        return w8_matmul_pallas(x, q, scale)
    return w8_matmul_jnp(x, q, scale)


# ---------------------------------------------------------------------------
# int4 blockwise (the logits head's second halving: w8 streams ~66 MB for
# distil-large-v3's [1280, 51866] head and measures AT its streaming
# roofline, so the only way down is fewer bytes — int4 weights with
# per-(input-block, output-channel) scales).
# ---------------------------------------------------------------------------


def quantize_blockwise_int4(
    w, block: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """[in, out] float weights -> (int4 [nb, block, out], bf16 scale [nb, out]).

    Symmetric 4-bit grid (±7) per (input-block, output-channel) — the
    blockwise scale recovers most of the accuracy a flat per-channel
    4-bit grid loses (this is the GGUF q4-family layout, transposed to
    our [in, out] convention).  Scales are bf16: their traffic is
    in/block of the int4 bytes; bf16 keeps them negligible while the
    dequantized product accumulates in f32.
    """
    w = np.asarray(w, np.float32)
    IN, OUT = w.shape
    assert IN % block == 0, (IN, block)
    nb = IN // block
    wb = w.reshape(nb, block, OUT)
    amax = np.abs(wb).max(axis=1)  # [nb, out]
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(wb / scale[:, None, :]), -7, 7)
    return (
        jnp.asarray(q.astype(np.int8), jnp.int4),
        jnp.asarray(scale, jnp.bfloat16),
    )


def w4_matmul_jnp(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [B, in] @ blockwise-int4 [nb, block, out] -> [B, out] f32.

    Per-block partial products hit the MXU in bf16 (XLA fuses the
    int4->bf16 widening into the weight fetch, as with the w8 head); the
    [B, nb, out] partials are scaled and reduced in f32.
    """
    nb, block, out = q.shape
    # bf16 operands on the MXU; CPU's dot thunk lacks BF16xBF16=F32 for
    # batched contractions, so non-TPU backends compute in f32.
    cd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    xb = x.reshape(x.shape[0], nb, block).astype(cd)
    partial = jnp.einsum(
        "bnk,nko->bno",
        xb,
        q.astype(cd),
        preferred_element_type=jnp.float32,
    )
    return (partial * scale.astype(jnp.float32)[None]).sum(axis=1)
