"""int8 cross-attention K/V via a purpose-built Pallas decode kernel.

Why a kernel: every XLA-level int8 cross-attention form loses at batch on
deep decoders — at MXU-shaped batches XLA materializes dot operands, so
the int8->bf16 dequant (or an s8-dot emulation) costs more than the
halved HBM stream saves (measured: lv3 B=8 einsum +50%, chunked +32%,
a8 +53% vs bf16 cross-K/V; PERF.md "cross_kv_impl").  Only a kernel that
DMAs the int8 codes and converts them **in VMEM** keeps the HBM stream
int8-wide by construction.

Why purpose-built and not the stock paged-attention kernel
(jax.experimental.pallas.ops.tpu.paged_attention) — two disqualifiers,
both verified on hardware:
  1. its QuantizedTensor path broadcasts per-row scales to head_dim
     width before the kernel — a scales stream as large as the int8
     codes, defeating the bandwidth purpose; and
  2. its m/l output block specs carry head_dim as the minor block dim,
     which Mosaic rejects unless head_dim % 128 == 0 — whisper's
     head_dim is 64 in every checkpoint.

The decode problem here is also strictly simpler than paged attention:
cross-K/V has a FIXED length (1500 mel-frame positions) shared by all
streams, contiguous per stream — no page tables, no per-row lengths.

Design (grid cell = one (stream, head)):
  - K/V are stored TRANSPOSED per head: [L, H, B, dh, Ta] int8.  That
    puts Ta (1500) on the lane dim — lane-aligned, ~2.4% physical tile
    pad — and dh=64 on sublanes, so one whole-sequence [dh, Ta] block
    per cell satisfies Mosaic's (8, 128)-divisible-or-exact rule and
    DMAs compactly (96 KB int8 per tensor per cell).
  - QK contracts over the sublane dim (the MXU-native rhs layout) and
    PV runs as dot_general((1,), (1,)) against the same transposed V —
    no in-kernel transposes.
  - The whole 1500-length softmax happens in one block: no online
    max/sum pass, and padded lanes never exist (block == array dims).
  - Per-channel scales never enter the kernel: the K scale folds onto q
    before, the V scale onto the output row after (exact — the same
    algebra as attention_cross_q8), so the kernel sees plain int8 codes.

Numerics: same int8 rounding as the einsum form; in-kernel math is bf16
operands with f32 accumulation (the flash-encoder tier).  TPU-only:
other platforms fall back to the einsum form (the engine builds the
plain quantized dict there).  Single-query decode only (the plain token
loop and the grouped temperature ladder); the speculative verify pass
keeps the einsum form.

Reference behavioral contract: the cross-attention of the reference's
decoder (candle whisper model.rs:168-adjacent attention); this file is
a serving-path acceleration with no reference equivalent.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def prep_cross_kv_kernel(
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Transpose per-channel-quantized cross K/V into kernel layout.

    kq/vq: ``quantize_cross_kv`` output — {"q": [L, B, Ta, D] int8,
    "s": [L, B, D] f32}.  Returns {"kT": [L, H, B, dh, Ta] int8,
    "s": [L, B, D] f32} dicts whose leaves all carry the leading L so
    they ride the decoder layer scan as xs.  One transpose per window
    (~0.5 GB at lv3 B=8, ~1 ms) against ~2 GB/step of loop reads it
    halves.
    """
    L, B, Ta, D = kq["q"].shape
    dh = D // n_heads

    def to_t(codes):
        x = codes.reshape(L, B, Ta, n_heads, dh)
        return jnp.transpose(x, (0, 3, 1, 4, 2))  # [L, H, B, dh, Ta]

    return (
        {"kT": to_t(kq["q"]), "s": kq["s"]},
        {"kT": to_t(vq["q"]), "s": vq["s"]},
    )


def _cross_decode_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (stream, head-tile) cell: per local head, q [G, dh] × int8
    K/V [dh, Ta] -> [G, dh].

    K/V convert int8 -> bf16 in VMEM (the entire point: HBM saw int8);
    both dots accumulate in f32 on the MXU; softmax in f32.  The head
    tile (``heads_per_cell``) is a DMA-granularity knob: the per-head
    math is independent, so the static loop below unrolls over however
    many heads ride this cell's block.
    """
    hpc = q_ref.shape[0]
    for j in range(hpc):  # static — Mosaic unrolls
        q = q_ref[j]  # [G, dh] bf16 (scales already folded)
        k = k_ref[j].astype(jnp.bfloat16)  # [dh, Ta]
        logits = jnp.dot(q, k, preferred_element_type=jnp.float32)  # [G, Ta]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[j].astype(jnp.bfloat16)  # [dh, Ta]
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, dh]
        o_ref[j] = (o / l).astype(o_ref.dtype)


def prep_cross_kv_kernel4(
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Transpose + nibble-pack int4-coded cross K/V into kernel layout.

    kq/vq: ``quantize_cross_kv4`` output ({"q": [L, B, Ta, D] int8 codes
    in [-7, 7], "s": [L, B, D] f32}).  Returns {"kT4":
    [L, H, B, dh, Ta/2] int8 — byte t packs code[t] (low nibble) and
    code[t + Ta/2] (high nibble), "s"} dicts.

    The pair-at-distance-Ta/2 packing means the kernel unpacks by lane
    CONCAT (low block ++ high block) instead of an interleave: the
    resulting key order is a PERMUTATION of Ta, which cross-attention is
    invariant to as long as K and V share it (softmax + PV both contract
    over the whole axis; there is no position mask on cross keys).
    """
    L, B, Ta, D = kq["q"].shape
    if Ta % 2:
        raise ValueError(f"Ta {Ta} must be even for nibble packing")
    dh = D // n_heads
    h = Ta // 2

    def pack(codes):
        x = codes.reshape(L, B, Ta, n_heads, dh)
        t = jnp.transpose(x, (0, 3, 1, 4, 2))  # [L, H, B, dh, Ta]
        lo = t[..., :h].astype(jnp.int32)
        hi = t[..., h:].astype(jnp.int32)
        return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)

    return (
        {"kT4": pack(kq["q"]), "s": kq["s"]},
        {"kT4": pack(vq["q"]), "s": vq["s"]},
    )


def _unpack_nibbles(b):
    """Packed int8 block [..., Ta/2] -> bf16 [..., Ta] (permuted order:
    low nibbles first, then high nibbles — see prep_cross_kv_kernel4)."""
    w = b.astype(jnp.int32)
    lo = jnp.left_shift(w, 28) >> 28  # arithmetic: sign-extended low nibble
    hi = w >> 4  # arithmetic: sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)


def _cross_decode_kernel_i4(s_ref, q_ref, k_ref, v_ref, o_ref):
    """int4 variant of the stacked cell: unpack nibbles in VMEM, then the
    same per-head math.  K and V share the packing permutation, so the
    softmax/PV result is bit-for-bit the unpermuted attention."""
    del s_ref
    hpc = q_ref.shape[0]
    for j in range(hpc):
        q = q_ref[j]  # [G, dh] bf16 (scales already folded)
        k = _unpack_nibbles(k_ref[j])  # [dh, Ta]
        logits = jnp.dot(q, k, preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = _unpack_nibbles(v_ref[j])
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[j] = (o / l).astype(o_ref.dtype)


def _cross_decode_kernel_stacked(s_ref, q_ref, k_ref, v_ref, o_ref):
    """Scalar-prefetch wrapper: the layer index rides ``s_ref`` and is
    consumed by the BlockSpec index maps (which pick the layer's block
    out of the STACKED [L, H, B, dh, Ta] arrays); the math is the
    per-layer kernel's."""
    del s_ref
    _cross_decode_kernel(q_ref, k_ref, v_ref, o_ref)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_groups", "heads_per_cell", "interpret"),
)
def cross_attention_q8_kernel_stacked(
    q: jax.Array,
    kp: Dict[str, jax.Array],
    vp: Dict[str, jax.Array],
    li: jax.Array,
    n_heads: int,
    n_groups: int = 1,
    heads_per_cell: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Like :func:`cross_attention_q8_kernel` but over the STACKED
    [L, H, B, dh, Ta] layout with a traced layer index ``li``.

    Motivation (r4 step attribution, PERF.md): when the per-layer form
    rides the decoder scan as xs, ``lax.scan`` materializes a per-layer
    SLICE of the int8 codes before the kernel reads it — two
    dynamic-slice fusions totalling ~¼ of the lv3 B=8 step at mtp=448,
    i.e. the sliced copy costs as much HBM traffic as the kernel's own
    read.  Here the stacked arrays stay closure-captured by the scan
    body and the kernel's index maps (scalar-prefetched ``li``, the
    self-decode kernel's pattern) address the layer's block directly —
    no slice, no copy, HBM sees the int8 codes exactly once.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gb, tq, d = q.shape
    if tq != 1:
        raise NotImplementedError(
            "the cross-decode kernel is single-query (the plain token "
            "loop); the chunked verify path uses the einsum form"
        )
    int4 = "kT4" in kp
    codes_key = "kT4" if int4 else "kT"
    L, H, b, dh, ta_blk = kp[codes_key].shape
    g = n_groups
    hpc = heads_per_cell
    if hpc == 0:  # auto: the hardware sweep's winners (v5e)
        target = 10 if b >= 4 else 5
        hpc = max(
            h for h in range(1, min(target, n_heads) + 1)
            if n_heads % h == 0
        )
    if n_heads % hpc:
        raise ValueError(
            f"heads_per_cell {hpc} must divide n_heads {n_heads}"
        )

    # Per-layer scales are tiny ([B, D] f32); slicing them outside the
    # kernel costs ~nothing and keeps the in-kernel math scale-free.
    ks = jax.lax.dynamic_index_in_dim(kp["s"], li, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(vp["s"], li, 0, keepdims=False)

    qf = (
        q.astype(jnp.float32).reshape(g, b, d)
        * ks[None, :, :]
        * float(dh) ** -0.5
    )
    qh = jnp.transpose(
        qf.reshape(g, b, n_heads, dh), (1, 2, 0, 3)
    ).astype(jnp.bfloat16)  # [B, H, G, dh]

    scal = li.astype(jnp.int32)[None]  # [1] — scalar-prefetched

    out = pl.pallas_call(
        _cross_decode_kernel_i4 if int4 else _cross_decode_kernel_stacked,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_heads // hpc),
            in_specs=[
                pl.BlockSpec(
                    (None, hpc, g, dh), lambda i, h, s: (i, h, 0, 0)
                ),
                pl.BlockSpec(
                    (None, hpc, None, dh, ta_blk),
                    lambda i, h, s: (s[0], h, i, 0, 0),
                ),
                pl.BlockSpec(
                    (None, hpc, None, dh, ta_blk),
                    lambda i, h, s: (s[0], h, i, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, hpc, g, dh), lambda i, h, s: (i, h, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, g, dh), jnp.float32),
        interpret=interpret,
    )(scal, qh, kp[codes_key], vp[codes_key])  # [B, H, G, dh] f32

    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(g, b, 1, d)
    out = out * vs[None, :, None, :]
    return out.astype(q.dtype).reshape(gb, 1, d)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_groups", "heads_per_cell", "interpret"),
)
def cross_attention_q8_kernel(
    q: jax.Array,
    kp: Dict[str, jax.Array],
    vp: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
    heads_per_cell: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """One decode step's cross-attention over transposed int8 K/V.

    q: [G*B, 1, D]; kp/vp: per-layer slices of
    :func:`prep_cross_kv_kernel` output — kT [H, B, dh, Ta] int8,
    s [B, D] f32.  ``n_groups`` G > 1 (the grouped temperature ladder)
    shares stream b's K/V block across its G rungs: the G query rows
    ride one grid cell, so the int8 stream is read once per stream per
    layer, not once per rung.  ``heads_per_cell`` tiles that many heads
    into one grid cell — identical math, bigger DMA blocks (96 KB/head
    at whisper dims; the full-head tile is ~1.9 MB) — a perf knob to
    sweep on hardware, like the flash-encoder's block size.
    """
    from jax.experimental import pallas as pl

    gb, tq, d = q.shape
    if tq != 1:
        raise NotImplementedError(
            "the cross-decode kernel is single-query (the plain token "
            "loop); the chunked verify path uses the einsum form"
        )
    b = kp["s"].shape[0]
    g = n_groups
    dh = d // n_heads
    ta = kp["kT"].shape[-1]
    hpc = heads_per_cell
    if hpc == 0:  # auto: the hardware sweep's winners (v5e)
        target = 10 if b >= 4 else 5
        hpc = max(
            h for h in range(1, min(target, n_heads) + 1)
            if n_heads % h == 0
        )
    if n_heads % hpc:
        raise ValueError(
            f"heads_per_cell {hpc} must divide n_heads {n_heads}"
        )

    # Fold the per-channel K scale and both whisper dh**-0.25 factors onto
    # q in f32 (one [G*B, D] elementwise), then lay q out per grid cell:
    # rows are r*B + b (group-major), the cell wants [B, H, G, dh].
    qf = (
        q.astype(jnp.float32).reshape(g, b, d)
        * kp["s"][None, :, :]
        * float(dh) ** -0.5
    )
    qh = jnp.transpose(
        qf.reshape(g, b, n_heads, dh), (1, 2, 0, 3)
    ).astype(jnp.bfloat16)  # [B, H, G, dh]

    out = pl.pallas_call(
        _cross_decode_kernel,
        grid=(b, n_heads // hpc),
        in_specs=[
            pl.BlockSpec((None, hpc, g, dh), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((hpc, None, dh, ta), lambda i, h: (h, i, 0, 0)),
            pl.BlockSpec((hpc, None, dh, ta), lambda i, h: (h, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hpc, g, dh), lambda i, h: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, g, dh), jnp.float32),
        interpret=interpret,
    )(qh, kp["kT"], vp["kT"])  # [B, H, G, dh] f32

    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(g, b, 1, d)
    out = out * vp["s"][None, :, None, :]
    return out.astype(q.dtype).reshape(gb, 1, d)
