"""int8 cross-attention K/V via the TPU paged-attention kernel.

Why a kernel: every XLA-level int8 cross-attention form loses at batch on
deep decoders — at MXU-shaped batches XLA materializes dot operands, so
the int8->bf16 dequant (or an s8-dot emulation) costs more than the
halved HBM stream saves (measured: lv3 B=8 einsum +50%, chunked +32%,
a8 +53% vs bf16 cross-K/V; PERF.md "cross_kv_impl").  The paged-attention
kernel (jax.experimental.pallas.ops.tpu.paged_attention) DMAs the int8
pages compactly from HBM and converts them to f32 **in VMEM**
(``MultiPageAsyncCopyDescriptor.wait_and_get_loaded``), which is the only
way the stream actually stays int8-wide.

Scale handling: the stock kernel's ``QuantizedTensor`` path broadcasts
per-row scales to head_dim width before the kernel — a bf16 scales
stream as large as the int8 codes, defeating the bandwidth purpose.  We
avoid it entirely: K/V are quantized PER CHANNEL (the same grid as
:func:`norma_tpu.model.whisper.quantize_cross_kv`), so the K scale folds
exactly onto q before the kernel and the V scale onto the output row
after it, and the kernel sees plain int8 pages with no scales at all.

Numerics: same int8 rounding as the einsum form; attention math runs in
f32 with a per-page-block online softmax (reassociation tier — like
``cross_kv_impl="chunked"``).  TPU-only: other platforms fall back to
the einsum form (the engine builds the plain quantized dict there).

Reference behavioral contract: the cross-attention of the reference's
decoder (candle whisper ``model.rs:168``-adjacent attention); this file
is a serving-path acceleration with no reference equivalent.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def paginate_cross_kv(
    kq: Dict[str, jax.Array],
    vq: Dict[str, jax.Array],
    n_heads: int,
    page_size: int = 500,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Reshape per-channel-quantized cross K/V into kernel page layout.

    kq/vq: ``quantize_cross_kv`` output — {"q": [L, B, Ta, D] int8,
    "s": [L, B, D] f32}.  Returns dicts whose leaves all carry the
    leading L so they ride the decoder layer scan as xs:

      {"pages": [L, H, B*Ta/ps, ps, dh] int8,   # kernel K/V pages
       "s":     [L, B, D] f32,                  # folded outside the kernel
       "idx":   [L, B, Ta/ps] int32}            # row b -> its page block

    Done once per window (the transpose is ~0.5 GB at lv3 B=8 — ~1 ms —
    against ~2 GB/step of loop reads it halves).
    """
    L, B, Ta, D = kq["q"].shape
    if Ta % page_size:
        raise ValueError(
            f"cross-attention length {Ta} is not divisible by the page "
            f"size {page_size} (cross_kv_chunk)"
        )
    pages = Ta // page_size
    dh = D // n_heads

    def to_pages(codes):
        x = codes.reshape(L, B, Ta, n_heads, dh)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))  # [L, H, B, Ta, dh]
        return x.reshape(L, n_heads, B * pages, page_size, dh)

    idx = jnp.broadcast_to(
        jnp.arange(B * pages, dtype=jnp.int32).reshape(1, B, pages),
        (L, B, pages),
    )
    kp = {"pages": to_pages(kq["q"]), "s": kq["s"], "idx": idx}
    vp = {"pages": to_pages(vq["q"]), "s": vq["s"], "idx": idx}
    return kp, vp


def paged_cross_attention(
    q: jax.Array,
    kp: Dict[str, jax.Array],
    vp: Dict[str, jax.Array],
    n_heads: int,
    n_groups: int = 1,
) -> jax.Array:
    """One decode step's cross-attention over int8 K/V pages.

    q: [G*B, 1, D]; kp/vp: per-layer slices of :func:`paginate_cross_kv`
    output — pages [H, B*pages, ps, dh] int8, s [B, D] f32, idx
    [B, pages] int32.  ``n_groups`` G > 1 (the speculative temperature
    ladder) shares stream b's pages across its G rungs by tiling the page
    indices — the K/V stream is read once per stream, not per rung.
    """
    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention,
    )

    gb, tq, d = q.shape
    if tq != 1:
        raise NotImplementedError(
            "paged cross-attention is single-query (the plain token "
            "loop); the chunked verify path uses the einsum form"
        )
    b = kp["s"].shape[0]
    g = n_groups
    dh = d // n_heads
    pages = kp["idx"].shape[1]
    ps = kp["pages"].shape[2]

    # Fold the per-channel K scale and both whisper dh**-0.25 factors onto
    # q in f32 (one [G*B, D] elementwise) — the kernel then runs unscaled
    # int8 codes against it.
    qf = (
        q.astype(jnp.float32).reshape(g, b, 1, d)
        * kp["s"][None, :, None, :]
        * float(dh) ** -0.5
    )
    qh = qf.reshape(gb, n_heads, dh).astype(jnp.float32)

    idx = kp["idx"]
    if g > 1:
        idx = jnp.tile(idx, (g, 1))
    lengths = jnp.full((gb,), pages * ps, jnp.int32)

    out = paged_attention(
        qh,
        kp["pages"],
        vp["pages"],
        lengths,
        idx,
        pages_per_compute_block=pages,
    )  # [G*B, H, dh]

    out = out.astype(jnp.float32).reshape(g, b, 1, d) * vp["s"][None, :, None, :]
    return out.astype(q.dtype).reshape(gb, 1, d)
