"""Self-attention decode step as a Pallas kernel over the stacked KV cache.

Why a kernel: the token loop's self-attention carries the FULL
[L, B, Tmax, D] cache pair through the decoder layer scan, and per layer
XLA (a) materializes a copy of the layer's [B, Tmax, D] slice to feed the
attention dot (`dynamic_index_in_dim` cannot fuse into the einsum at
MXU-shaped batches) and (b) spends far more than the row's bytes on the
one-row `dynamic_update_slice`.  Measured (tools/perf_step_attr.py, v5e,
lv3 B=8 w8 + xkv kernel): ~2x(30+22) us/layer = **3.3 ms/step** of
self-KV handling against a ~0.36 ms read roofline at average fill — the
single largest off-roofline item left in the batched deep-decoder loop
(PERF.md "Per-op attribution of the batched step").

The kernel reads the stacked cache DIRECTLY from HBM (no layer-slice
copy, one read instead of slice-write+re-read), masks rows beyond the
current position, folds the step's NEW K/V row in explicitly, and writes
that row back IN PLACE: the caches are aliased input->output
(`input_output_aliases`) and the output block specs cover ONLY the
one written row — a [1, heads_per_cell*dh] tile at sublane ``pos`` —
so the write-back DMA is the row's bytes, not the block's.

Layout: the NATURAL cache layout works.  A [Tmax, hpc*dh] block per
(stream, head-tile) grid cell keeps the lane dim a multiple of 128
(dh = 64 in every whisper checkpoint, so heads_per_cell must be even)
and Tmax = 448 on sublanes — no transposed shadow copy of the cache and
no layout change for the XLA fallback paths.

Numerics: both whisper ``dh**-0.25`` factors fold onto q in f32 before
the kernel (the cross-decode kernel's tier); in-kernel dots are
bf16-operand/f32-accum, softmax in f32.  TPU-only, single-query decode
(the plain token loop and the grouped temperature ladder row-wise);
the chunked speculative verify pass keeps the XLA form.

Reference behavioral contract: the per-step self-attention of the
reference's decoder (candle whisper, model.rs:317-329 token loop); this
file is a serving-path acceleration with no reference equivalent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _self_decode_kernel(s_ref, q_ref, kn_ref, vn_ref, ck_ref, cv_ref,
                        o_ref, cko_ref, cvo_ref, *, dh: int):
    """One (stream, head-tile) cell.

    Blocks: q [hpc, 1, dh] bf16 (scales folded), kn/vn [1, hpc*dh] cache
    dtype, ck/cv [Tmax, hpc*dh], o [hpc, 1, dh] f32, cko/cvo [8, hpc*dh]
    (the in-place write-back: Mosaic requires 8-divisible-or-exact
    sublane blocks, so the out block is the 8-row tile CONTAINING
    ``pos`` — rows around it copy through unchanged from the aliased
    input block, the row at ``pos`` is replaced by the new K/V row).
    """
    from jax.experimental import pallas as pl

    pos = s_ref[1]
    base = (pos // 8) * 8
    r = pos - base  # row index within the out tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, kn_ref.shape[-1]), 0)
    cko_ref[...] = jnp.where(rows == r, kn_ref[...], ck_ref[pl.ds(base, 8), :])
    cvo_ref[...] = jnp.where(rows == r, vn_ref[...], cv_ref[pl.ds(base, 8), :])

    t = ck_ref.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    hpc = q_ref.shape[0]
    for j in range(hpc):  # static — Mosaic unrolls
        q = q_ref[j]  # [1, dh]
        k = ck_ref[:, j * dh:(j + 1) * dh]  # [Tmax, dh]
        kn = kn_ref[:, j * dh:(j + 1) * dh]  # [1, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, Tmax]
        new_logit = jnp.sum(q.astype(jnp.float32) * kn.astype(jnp.float32))
        # History strictly below pos; the new row at pos; -inf beyond
        # (rows >= pos may hold stale data from a longer earlier window).
        logits = jnp.where(
            idx == pos, new_logit, jnp.where(idx < pos, logits, -jnp.inf)
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = cv_ref[:, j * dh:(j + 1) * dh]  # [Tmax, dh]
        p_hist = jnp.where(idx < pos, p, 0.0).astype(v.dtype)
        o = jax.lax.dot_general(
            p_hist, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, dh]
        p_new = jnp.sum(jnp.where(idx == pos, p, 0.0))
        vn = vn_ref[:, j * dh:(j + 1) * dh].astype(jnp.float32)
        o_ref[j] = (o + p_new * vn) / l


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "heads_per_cell", "interpret"),
)
def self_attention_decode(
    q: jax.Array,  # [B, 1, D] — projected query, UNscaled
    k_new: jax.Array,  # [B, 1, D] — the step's new K row
    v_new: jax.Array,
    cache_k: jax.Array,  # [L, B, Tmax, D] — stacked, natural layout
    cache_v: jax.Array,
    li: jax.Array,  # scalar int32 — layer index into the stacked caches
    pos: jax.Array,  # scalar int32 — write/read position
    n_heads: int,
    heads_per_cell: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused write-row + masked self-attention over the stacked cache.

    Returns (attn_out [B, 1, D] in q.dtype, cache_k, cache_v) where the
    caches are the SAME buffers with row ``(li, :, pos)`` updated in
    place (aliased — callers must treat the inputs as consumed, which the
    decoder layer scan's carry already does).

    ``heads_per_cell`` tiles heads into one grid cell (must be even so
    the cache block's lane width is a multiple of 128, and must divide
    n_heads).  0 = auto (see below).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, Tmax, D = cache_k.shape
    dh = D // n_heads
    if dh % 2:
        raise ValueError(f"head_dim {dh} must be even")
    if Tmax % 8:
        raise ValueError(
            f"cache length {Tmax} must be a multiple of 8 (the in-place "
            f"write-back tile is 8 sublanes)"
        )
    hpc = heads_per_cell
    if hpc == 0:
        # Auto: the FULL head tile (one grid cell per stream).  The
        # hardware sweep (tools/perf_self_kernel_sweep.py, v5e) measured
        # the small pair tile as the kernel's whole engine-level loss:
        # lone-op 97.1 (hpc=2) -> 78.4 us/layer (hpc=20) at lv3 B=8, and
        # in-context (tools/perf_spec_ab.py self_kernel) hpc=2 LOST
        # +6.4% while hpc=20 WINS -1.5% (981.8 -> 967.0 ms) and is
        # neutral at B=1 — bigger per-cell DMA blocks ([448, 1280]
        # ~1.1 MB vs 114 KB) amortize the grid/pipeline overhead, the
        # same tile-size lever as the cross kernel and flash encoder.
        hpc = n_heads
    if n_heads % hpc or ((hpc * dh) % 128 and hpc != n_heads):
        raise ValueError(
            f"heads_per_cell {hpc} must divide n_heads {n_heads} and keep "
            f"hpc*dh ({hpc * dh}) a multiple of 128 (or cover all heads)"
        )
    w = hpc * dh

    # Fold both whisper dh**-0.25 factors onto q in f32 (one [B, D]
    # elementwise), then lay out per (stream, head): [B, H, 1, dh].
    qh = (
        q.astype(jnp.float32).reshape(B, 1, n_heads, dh) * float(dh) ** -0.5
    ).transpose(0, 2, 1, 3).astype(cache_k.dtype)

    kn = k_new.astype(cache_k.dtype)  # [B, 1, D]
    vn = v_new.astype(cache_v.dtype)
    scal = jnp.stack(
        [li.astype(jnp.int32), pos.astype(jnp.int32)]
    )  # [2] int32 — scalar-prefetched; index maps and masks read it

    grid = (B, n_heads // hpc)
    kernel = functools.partial(_self_decode_kernel, dh=dh)
    out, ck2, cv2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, hpc, 1, dh), lambda b, h, s: (b, h, 0, 0)),
                pl.BlockSpec((None, 1, w), lambda b, h, s: (b, 0, h)),
                pl.BlockSpec((None, 1, w), lambda b, h, s: (b, 0, h)),
                pl.BlockSpec(
                    (None, None, Tmax, w), lambda b, h, s: (s[0], b, 0, h)
                ),
                pl.BlockSpec(
                    (None, None, Tmax, w), lambda b, h, s: (s[0], b, 0, h)
                ),
            ],
            out_specs=[
                pl.BlockSpec((None, hpc, 1, dh), lambda b, h, s: (b, h, 0, 0)),
                # In-place write-back: the 8-row tile containing pos
                # (Mosaic sublane-divisibility; the kernel splices the
                # new row into the tile it copies through).
                pl.BlockSpec(
                    (None, None, 8, w), lambda b, h, s: (s[0], b, s[1] // 8, h)
                ),
                pl.BlockSpec(
                    (None, None, 8, w), lambda b, h, s: (s[0], b, s[1] // 8, h)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, n_heads, 1, dh), jnp.float32),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # Operand indices count the scalar-prefetch arg: scal=0, qh=1,
        # kn=2, vn=3, cache_k=4, cache_v=5.
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(scal, qh, kn, vn, cache_k, cache_v)

    a = out.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(q.dtype)
    return a, ck2, cv2
