"""Fused decoder self-attention BLOCK (LN + QKV + attention + out-proj)
as one Pallas launch per layer.

Why: after the self-decode kernel removed the cache slice/update tax, the
per-op attribution (PERF.md "Per-op attribution of the lv3 decode step")
shows the remaining off-roofline cost of the token loop's self path is
a per-op floor tax spread across the block's SEPARATE dispatches — the
attn LayerNorm, the fused-QKV GEMV, the attention kernel, the out
projection and the residual add each pay a fixed dispatch/pipeline-fill
cost their bytes cannot amortize at decode shapes (lone-op: self kernel
78.4 vs 22.4 us/layer read roofline at lv3 B=8).  This kernel runs the
ENTIRE pre-cross-attention block in ONE launch per layer:

    h   = LayerNorm(x) * g + b
    qkv = h @ Wqkv (*scales) + bias          (fused [D, 3D] form)
    a   = self_attention(q, cache <- k, v)   (in-place row write)
    out = x + (a @ Wo) (*scales) + o_b

Weights are read DIRECTLY from the stacked [L, ...] parameter arrays via
scalar-prefetched index maps (no per-layer slice materialization, same
trick as the stacked KV caches), int8 (quantize_decoder) or bf16.  The
per-channel int8 scales fold on the GEMV outputs exactly as the XLA
path's ldense/qkv_proj do, so the math tier is identical: bf16-operand/
f32-accumulate dots, f32 LayerNorm/softmax, bf16 residual adds.

Grid = (B,): one cell per stream, full head tile (the swept optimum of
the attention-only kernel).  Weight blocks are indexed by layer only, so
Mosaic fetches them ONCE per launch and revisits across the B cells;
the per-cell DMA is the stream's [Tmax, D] cache pair.  The int8
weight convert happens per cell (B redundant converts) — the hardware
A/B decides whether that loses to the boundary savings; the bf16 form
has no such redundancy.

Cache write-back: identical contract to ops/self_decode.py — the caches
alias input->output and the out block is the 8-row tile containing
``pos`` (Mosaic sublane rule), splicing the new K/V row in place.

TPU-only, single-token decode (plain token loop and the grouped
temperature ladder); the chunked speculative verify pass keeps the XLA
form.  Reference behavioral contract: one decoder layer of the
reference's token hot loop (candle whisper, model.rs:317-329); this
file is a serving-path acceleration with no reference equivalent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _fused_block_kernel(
    s_ref, x_ref, lng_ref, lnb_ref, wq_ref, *rest,
    dh: int, n_heads: int, d: int, quantized: bool, eps: float,
):
    """One stream's full self-attention block.

    Block shapes (None dims squeezed): x/lng/lnb [1, D]; wq [D, 3D];
    qs/qb [1, 3D]; wo [D, D]; os/ob [1, D]; ck/cv [Tmax, D];
    xo [1, D]; cko/cvo [8, D] (the in-place write-back tile).
    """
    from jax.experimental import pallas as pl

    if quantized:
        (qs_ref, qb_ref, wo_ref, os_ref, ob_ref,
         ck_ref, cv_ref, xo_ref, cko_ref, cvo_ref) = rest
    else:
        qs_ref = os_ref = None
        (qb_ref, wo_ref, ob_ref,
         ck_ref, cv_ref, xo_ref, cko_ref, cvo_ref) = rest

    pos = s_ref[1]
    xr = x_ref[...]  # [1, D]
    cdt = xr.dtype
    kdt = ck_ref.dtype

    # LayerNorm (f32, matching model.whisper.layer_norm).
    x32 = xr.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    h32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = (
        h32 * lng_ref[...].astype(jnp.float32)
        + lnb_ref[...].astype(jnp.float32)
    ).astype(cdt)

    # Fused QKV GEMV: [1, D] x [D, 3D] -> [1, 3D] f32, scales/bias folded
    # on the output exactly as qkv_proj does, then ONE bf16 cast.
    wq = wq_ref[...]
    if quantized:
        wq = wq.astype(cdt)
    y = jax.lax.dot_general(
        h, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if quantized:
        y = y * qs_ref[...].astype(jnp.float32)
    y16 = (y + qb_ref[...].astype(jnp.float32)).astype(cdt)
    qv = y16[:, :d]
    kn = y16[:, d:2 * d].astype(kdt)  # [1, D]
    vn = y16[:, 2 * d:].astype(kdt)
    # Both whisper dh**-0.25 factors fold onto q in f32 (the attention
    # kernel's tier), then back to the cache dtype for the QK dots.
    qs_row = (qv.astype(jnp.float32) * float(dh) ** -0.5).astype(kdt)

    # In-place cache write-back: splice the new row into the 8-row tile
    # containing ``pos`` (rows around it copy through from the aliased
    # input block).
    base = (pos // 8) * 8
    r = pos - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    cko_ref[...] = jnp.where(rows == r, kn, ck_ref[pl.ds(base, 8), :])
    cvo_ref[...] = jnp.where(rows == r, vn, cv_ref[pl.ds(base, 8), :])

    # Masked self-attention over the cache, per head (full head tile).
    t = ck_ref.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    outs = []
    for j in range(n_heads):
        sl = slice(j * dh, (j + 1) * dh)
        q = qs_row[:, sl]  # [1, dh]
        k = ck_ref[:, sl]  # [Tmax, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, Tmax]
        new_logit = jnp.sum(
            q.astype(jnp.float32) * kn[:, sl].astype(jnp.float32)
        )
        logits = jnp.where(
            idx == pos, new_logit, jnp.where(idx < pos, logits, -jnp.inf)
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = cv_ref[:, sl]  # [Tmax, dh]
        p_hist = jnp.where(idx < pos, p, 0.0).astype(v.dtype)
        o = jax.lax.dot_general(
            p_hist, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, dh]
        p_new = jnp.sum(jnp.where(idx == pos, p, 0.0))
        vj = vn[:, sl].astype(jnp.float32)
        outs.append(((o + p_new * vj) / l).astype(cdt))
    a = jnp.concatenate(outs, axis=-1)  # [1, D]

    # Out projection + residual (ldense semantics: f32 accumulate,
    # scales/bias in f32, bf16 cast, bf16 residual add).
    wo = wo_ref[...]
    if quantized:
        wo = wo.astype(cdt)
    z = jax.lax.dot_general(
        a, wo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if quantized:
        z = z * os_ref[...].astype(jnp.float32)
    z16 = (z + ob_ref[...].astype(jnp.float32)).astype(cdt)
    xo_ref[...] = xr + z16


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "eps", "interpret"),
)
def fused_self_attention_block(
    x: jax.Array,  # [B, 1, D] — residual stream into the layer
    cache_k: jax.Array,  # [L, B, Tmax, D] — stacked, natural layout
    cache_v: jax.Array,
    li: jax.Array,  # scalar int32 — layer index (caches AND weights)
    pos: jax.Array,  # scalar int32 — write/read position
    n_heads: int,
    *,
    ln_g: jax.Array,  # [L, D]
    ln_b: jax.Array,
    qkv_b: jax.Array,  # [L, 3, D]
    o_b: jax.Array,  # [L, D]
    qkv_w: jax.Array | None = None,  # [L, D, 3, D] bf16
    qkv_w_q: jax.Array | None = None,  # [L, D, 3, D] int8 codes
    qkv_w_s: jax.Array | None = None,  # [L, 3, D] per-out-channel scales
    o_w: jax.Array | None = None,  # [L, D, D]
    o_w_q: jax.Array | None = None,
    o_w_s: jax.Array | None = None,  # [L, D]
    eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder self-attention block in one launch, weights stacked.

    Returns (x_out [B, 1, D], cache_k, cache_v) where the caches are the
    SAME buffers with row ``(li, :, pos)`` updated in place (aliased —
    callers must treat the inputs as consumed, which the decoder layer
    scan's carry already does).

    Exactly one of ``qkv_w`` / ``qkv_w_q`` (and correspondingly ``o_w`` /
    ``o_w_q``) must be given; the int8 form matches quantize_decoder's
    layout with scales folded on the GEMV outputs (identical math to the
    XLA path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, Tmax, D = cache_k.shape
    dh = D // n_heads
    quantized = qkv_w_q is not None
    if quantized != (qkv_w is None) or quantized != (o_w is None):
        raise ValueError(
            "pass bf16 (qkv_w + o_w) or int8 (qkv_w_q/s + o_w_q/s) "
            "weights, not a mix"
        )
    if Tmax % 8:
        raise ValueError(
            f"cache length {Tmax} must be a multiple of 8 (the in-place "
            f"write-back tile is 8 sublanes)"
        )

    wq = (qkv_w_q if quantized else qkv_w).reshape(L, D, 3 * D)
    qb = qkv_b.reshape(L, 1, 3 * D)
    lng = ln_g.reshape(L, 1, D)
    lnb = ln_b.reshape(L, 1, D)
    ob = o_b.reshape(L, 1, D)
    wo = o_w_q if quantized else o_w

    scal = jnp.stack([li.astype(jnp.int32), pos.astype(jnp.int32)])

    lspec = lambda shape: pl.BlockSpec(shape, lambda b, s: (s[0], 0, 0))
    in_specs = [
        pl.BlockSpec((None, 1, D), lambda b, s: (b, 0, 0)),  # x
        lspec((None, 1, D)),  # ln_g
        lspec((None, 1, D)),  # ln_b
        lspec((None, D, 3 * D)),  # wqkv
    ]
    args = [x, lng, lnb, wq]
    if quantized:
        in_specs.append(lspec((None, 1, 3 * D)))
        args.append(qkv_w_s.reshape(L, 1, 3 * D))
    in_specs.append(lspec((None, 1, 3 * D)))  # qkv_b
    args.append(qb)
    in_specs.append(lspec((None, D, D)))  # wo
    args.append(wo)
    if quantized:
        in_specs.append(lspec((None, 1, D)))
        args.append(o_w_s.reshape(L, 1, D))
    in_specs.append(lspec((None, 1, D)))  # o_b
    args.append(ob)
    cache_spec = pl.BlockSpec(
        (None, None, Tmax, D), lambda b, s: (s[0], b, 0, 0)
    )
    in_specs += [cache_spec, cache_spec]
    args += [cache_k, cache_v]

    # Operand indices count the scalar-prefetch arg (index 0).
    nin = len(args)
    aliases = {nin - 1: 1, nin: 2}  # cache_k, cache_v -> outputs 1, 2

    row_spec = pl.BlockSpec(
        (None, None, 8, D), lambda b, s: (s[0], b, s[1] // 8, 0)
    )
    kernel = functools.partial(
        _fused_block_kernel,
        dh=dh, n_heads=n_heads, d=D, quantized=quantized, eps=eps,
    )
    x_out, ck2, cv2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((None, 1, D), lambda b, s: (b, 0, 0)),
                row_spec,
                row_spec,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), x.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(scal, *args)
    return x_out, ck2, cv2
