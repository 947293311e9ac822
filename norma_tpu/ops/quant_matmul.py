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


# ---------------------------------------------------------------------------
# w8a8: int8 activations x int8 weights with int32 accumulation (the MXU's
# native int8 path — 2x the bf16 matmul rate on TPU v5e+).  Used by the
# COMPUTE-bound encoder (quantize_encoder), where weight-only int8 buys
# nothing: the encoder runs once per window over 1500 rows, so its matmuls
# are MXU-bound, not HBM-bound, and only a faster multiplier helps.
# ---------------------------------------------------------------------------


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (last-axis) symmetric dynamic int8 quantization.

    x [..., in] -> (int8 codes [..., in], f32 scale [..., 1]).  No clip
    needed: |x| <= amax implies |round(x/scale)| <= 127 exactly.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    # Floor like quantize_kv_row's: an all-subnormal row (amax < ~1.8e-43)
    # would underflow amax/127 to 0.0 and turn x/scale into inf/NaN; with
    # the floor such a row just quantizes to zeros.
    scale = jnp.where(amax > 0, jnp.maximum(amax, 1e-8) / 127.0, 1.0)
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def q8a8_dense(
    xq: jax.Array,
    xs: jax.Array,
    wq: jax.Array,
    ws: jax.Array,
    b: jax.Array | None = None,
) -> jax.Array:
    """int8 x int8 -> int32 matmul, rescaled to f32.

    xq [..., in] int8 codes with per-row scales xs [..., 1];
    wq [in, out] int8 with per-out-channel scales ws [out].
    The integer product is EXACT (max |acc| = in * 127^2 < 2^31 for any
    realistic in-dim), so accuracy is bounded by the two quantization
    grids alone.
    """
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * ws.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def _q8a8_kernel(x_ref, s_ref, w_ref, ws_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:] * ws_ref[0, :][None, :]


def q8a8_dense_pallas(
    xq: jax.Array,
    xs: jax.Array,
    wq: jax.Array,
    ws: jax.Array,
    b: jax.Array | None = None,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pallas twin of :func:`q8a8_dense` (leading dims flattened to M).

    Plan B for the w8a8 encoder: if a backend's XLA lowering of the s8
    dot does not engage the MXU's native int8 mode
    (tools/perf_int8_mxu.py decides), this kernel issues the int8 dot
    explicitly per (block_m x block_n) tile with the scales applied in
    VMEM.  Same int32-exact math; tile sizes are the tuning lever (the
    flash-encoder lesson: tiles, not the kernel boundary, decide wins).
    """
    from jax.experimental import pallas as pl

    lead = xq.shape[:-1]
    K = xq.shape[-1]
    M = 1
    for d in lead:
        M *= d
    xq2 = xq.reshape(M, K)
    xs2 = xs.reshape(M, 1)
    N = wq.shape[-1]
    pad_m = (-M) % block_m
    pad_n = (-N) % block_n
    if pad_m:
        xq2 = jnp.pad(xq2, ((0, pad_m), (0, 0)))
        xs2 = jnp.pad(xs2, ((0, pad_m), (0, 0)))
    wqp, wsp = wq, ws
    if pad_n:
        wqp = jnp.pad(wq, ((0, 0), (0, pad_n)))
        wsp = jnp.pad(ws, (0, pad_n))
    MP, NP = M + pad_m, N + pad_n

    out = pl.pallas_call(
        _q8a8_kernel,
        grid=(MP // block_m, NP // block_n),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((MP, NP), jnp.float32),
        interpret=interpret,
    )(xq2, xs2, wqp, wsp.reshape(1, NP).astype(jnp.float32))
    y = out[:M, :N].reshape(*lead, N)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def q8a8_qkv(
    xq: jax.Array, xs: jax.Array, wq: jax.Array, ws: jax.Array, b: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused-QKV w8a8: xq [B, T, in] @ wq [in, 3, out] -> three [B, T, out].

    ws [3, out] per-(projection, out-channel) scales, b [3, out] (zeros in
    the K slot — whisper's k_proj has no bias).  One int8 MXU dispatch for
    all three projections, mirroring the bf16 fused path (qkv_proj).
    """
    acc = jnp.einsum(
        "btk,kco->btco", xq, wq, preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * xs[..., None] * ws.astype(jnp.float32)
    y = y + b.astype(jnp.float32)
    return y[..., 0, :], y[..., 1, :], y[..., 2, :]


# ---------------------------------------------------------------------------
# int4 blockwise (the logits head's second halving: w8 streams ~66 MB for
# distil-large-v3's [1280, 51866] head and measures AT its streaming
# roofline, so the only way down is fewer bytes — int4 weights with
# per-(input-block, output-channel) scales).
# ---------------------------------------------------------------------------


def quantize_blockwise_int4(
    w, block: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """[in, out] float -> (nibble-packed int8 [in//2, out], bf16 [in//block, out]).

    Symmetric 4-bit grid (±7) per (input-block, output-channel) — the
    blockwise scale recovers most of the accuracy a flat per-channel
    4-bit grid loses (the GGUF q4-family layout, transposed to our
    [in, out] convention).  Two 4-bit codes pack into each int8 byte in
    SPLIT-HALF order: byte i holds input-row ``i`` in the low nibble and
    row ``i + in/2`` in the high nibble, so unpacking is two shifts and
    one concat (no interleave relayout).  Packed int8 storage — not the
    jnp int4 dtype — keeps the format portable: int4 device transfers
    are unsupported in at least one TPU runtime (the axon plugin
    recurses), while int8 works everywhere and streams the same bytes.
    """
    w = np.asarray(w, np.float32)
    IN, OUT = w.shape
    assert IN % block == 0 and IN % 2 == 0, (IN, block)
    nb = IN // block
    wb = w.reshape(nb, block, OUT)
    amax = np.abs(wb).max(axis=1)  # [nb, out]
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = (
        np.clip(np.round(wb / scale[:, None, :]), -7, 7)
        .astype(np.int8)
        .reshape(IN, OUT)
    )
    lo = q[: IN // 2] & 0xF
    hi = q[IN // 2 :] & 0xF
    packed = (lo | (hi << 4)).astype(np.int8)
    return jnp.asarray(packed), jnp.asarray(scale, jnp.bfloat16)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Nibble-packed int8 [in//2, out] -> int8 codes [in, out] (sign-extended)."""
    v = packed.astype(jnp.int32)
    lo = jnp.left_shift(v, 28) >> 28  # arithmetic: sign-extends the nibble
    hi = jnp.left_shift(v, 24) >> 28
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def w4_matmul_jnp(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [B, in] @ packed-int4 [in//2, out] -> [B, out] f32 (XLA path).

    Unpacks in-graph, then per-block partial products accumulate in f32.
    XLA materializes the unpacked weights, so this path does NOT realize
    the bandwidth win — it is the semantics oracle / CPU path; the
    Pallas kernel (:func:`w4_matmul_pallas`) unpacks in VMEM.
    """
    nb, out = scale.shape
    IN = q.shape[0] * 2
    block = IN // nb
    # bf16 operands on the MXU; CPU's dot thunk lacks BF16xBF16=F32 for
    # batched contractions, so non-TPU backends compute in f32.
    cd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    w = unpack_int4(q).reshape(nb, block, out)
    xb = x.reshape(x.shape[0], nb, block).astype(cd)
    partial = jnp.einsum(
        "bnk,nko->bno", xb, w.astype(cd), preferred_element_type=jnp.float32
    )
    return (partial * scale.astype(jnp.float32)[None]).sum(axis=1)


def _w4_kernel(x_ref, qp_ref, s_ref, o_ref, *, block: int):
    # qp tile [IN/2, BLK] int8 -> two sign-extended nibble planes.
    # NOTE: this inlines unpack_int4's split-half convention (hardware-
    # verified kernel; left as-is rather than re-verified for a refactor)
    # — any change to quantize_blockwise_int4's packing layout must update
    # BOTH sites, pinned by tests/test_quant.py's kernel-vs-twin parity.
    v = qp_ref[:].astype(jnp.int32)
    lo = (jnp.left_shift(v, 28) >> 28).astype(jnp.bfloat16)
    hi = (jnp.left_shift(v, 24) >> 28).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=0)  # [IN, BLK]
    # Per-(input-block, out-channel) scales expanded to rows.
    s_rows = jnp.repeat(s_ref[:].astype(jnp.bfloat16), block, axis=0)
    y = jnp.dot(x_ref[:], w * s_rows, preferred_element_type=jnp.float32)
    o_ref[:] = y


def w4_matmul_pallas(
    x: jax.Array,
    q: jax.Array,
    scale: jax.Array,
    block_out: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Pallas w4a16: x [B, in] bf16 @ packed-int4 [in//2, out] -> [B, out] f32.

    Streams the PACKED int8 bytes HBM->VMEM (half the int8 head's
    traffic — the head measures at its int8 streaming roofline, so bytes
    are the whole game), unpacks nibbles and applies blockwise scales on
    the VPU, and feeds the MXU in bf16.
    """
    import functools as ft

    from jax.experimental import pallas as pl

    B, IN = x.shape
    HALF, OUT = q.shape
    nb = scale.shape[0]
    block = IN // nb
    assert HALF * 2 == IN
    pad = (-OUT) % block_out
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, ((0, 0), (0, pad)))
    OUTP = OUT + pad

    out = pl.pallas_call(
        ft.partial(_w4_kernel, block=block),
        grid=(OUTP // block_out,),
        in_specs=[
            pl.BlockSpec((B, IN), lambda j: (0, 0)),
            pl.BlockSpec((HALF, block_out), lambda j: (0, j)),
            pl.BlockSpec((nb, block_out), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, OUTP), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), q, scale)
    return out[:, :OUT]
