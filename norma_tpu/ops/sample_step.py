"""Fused per-step grammar + sampling kernel for the decode loop.

One decode step's post-logits work — softmax, the stateful timestamp-grammar
mask algebra (reference ``supress_tokens``/``supress_past_timestamps``,
``/root/reference/src/models/whisper/model.rs:225-277,331-357``), greedy
argmax, Gumbel-max temperature sampling, and the chosen-token probability
lookup — fused into ONE Pallas program per batch row.

Why: measured on TPU v5e, the same pipeline expressed as ~20 separate XLA
ops over the [B, 51866] vocab axis costs ~0.5 ms per decoded token in
per-kernel fixed overhead alone (the data is only ~200 KB/row); the fused
kernel does one VMEM-resident pass.  The jnp twin below is the semantics
oracle (and the CPU path): the kernel must match it token-for-token on
finite inputs; the t>0 draw uses the TPU PRNG instead of threefry so only
its LAW matches (Gumbel-max == WeightedIndex over softmax(masked/t), the
same law the chi-square test pins).

Grammar semantics preserved (in prob space, post-softmax):
  - base = probs + suppress_mask                      (model.rs:331-334)
  - first sampled token: ONLY probs + first_token mask (model.rs:336-338)
  - last token was timestamp: pair rule               (model.rs:252-262)
  - else: sum-of-ts-prob vs max-text-prob rule        (model.rs:263-276)
  - monotonic timestamps via past-ts mask             (model.rs:225-243)
  - NaN weights at t>0 => EOT                         (model.rs:343-346)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def uniform_from_bits(bits: jax.Array) -> jax.Array:
    """TPU-PRNG raw bits -> uniform floats in (0, 1), inside a Pallas kernel.

    ``prng_random_bits`` returns int32: bitcast to uint32 BEFORE the shift,
    else ``>> 9`` is arithmetic and half the draws land in [-0.5, 0)
    (clamped to a constant) instead of uniform [0, 1).  The shifted value
    fits in 23 bits, so bitcast back to int32 for the float conversion
    (Mosaic has no uint32->f32 cast).  Shared with the hardware uniformity
    probe (tools/verify_sample_kernel_tpu.py) so the probe exercises THIS
    code, not a private copy that could drift from it.
    """
    from jax.experimental.pallas import tpu as pltpu

    u = pltpu.bitcast(
        pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32
    ).astype(jnp.float32) * (1.0 / (1 << 23))
    return jnp.maximum(u, 1e-12)  # avoid log(0)


def sample_step_jnp(
    ll: jax.Array,  # [B, V] f32 raw logits for the next token
    m_suppress: jax.Array,  # [V] f32 0/-inf
    m_non_ts: jax.Array,
    m_ts: jax.Array,
    m_first: jax.Array,
    prev1: jax.Array,  # [B] i32 last pushed token
    prev2: jax.Array,  # [B] i32 token before that
    last_ts: jax.Array,  # [B] i32 largest timestamp token seen (0 = none)
    step: jax.Array,  # scalar or [B] i32 — 0 selects the first-token mask
    temp: jax.Array,  # [B] f32 per-row temperature (0 = greedy)
    key: jax.Array,  # PRNG key for the t>0 draw
    *,
    eot: int,
    no_timestamps: int,
    greedy_only: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference implementation.  Returns (nxt [B] i32, prob_chosen [B] f32,
    all_nan [B] bool).

    ``greedy_only``: trace-time promise that every row has temp == 0 —
    skips the categorical draw entirely (the speculative draft/verify loop
    is statically greedy and calls this every step; under jit the discarded
    draw would otherwise still be computed)."""
    V = ll.shape[-1]
    ids = jnp.arange(V)
    probs = jax.nn.softmax(ll, axis=-1)

    base = probs + m_suppress[None]
    past = jnp.where(
        (ids[None] > no_timestamps) & (ids[None] <= last_ts[:, None]),
        -jnp.inf,
        0.0,
    ).astype(jnp.float32)
    second_special = (prev2 >= eot)[:, None]
    mask_a = jnp.where(second_special, m_ts[None], m_non_ts[None] + past)
    ts_region = (ids > no_timestamps)[None]
    sum_ts = jnp.sum(jnp.where(ts_region, base, 0.0), axis=-1)
    max_txt = jnp.max(
        jnp.where((ids < no_timestamps)[None], base, -jnp.inf), axis=-1
    )
    force_ts = (sum_ts >= max_txt)[:, None]
    mask_b = jnp.where(force_ts, m_non_ts[None] + past, past)
    last_is_ts = (prev1 > no_timestamps)[:, None]
    extra = jnp.where(last_is_ts, mask_a, mask_b)
    masked = base + extra
    # step may be per-row (the speculative verify scores chunk positions at
    # different grammar depths in one call) or a shared scalar.
    step_b = jnp.broadcast_to(jnp.asarray(step, jnp.int32), prev1.shape)
    masked = jnp.where((step_b == 0)[:, None], probs + m_first[None], masked)

    greedy = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    # Grammar deadlock == no token has a finite weight: every entry -inf
    # (all suppressed — softmax(masked/t) would be all-NaN, the condition
    # the reference checks, model.rs:343-346) or a NaN present (which
    # poisons that softmax the same way).  `isnan(masked).any()` alone
    # missed the all--inf case: additive -inf masks never produce NaN.
    deadlock = ~jnp.isfinite(jnp.max(masked, axis=-1))
    # Greedy in a deadlock: candle's max_by returns the LAST of equal
    # maxima (all -inf), i.e. the highest vocab id; numpy argmax the
    # first.  Match the reference.  (Finite exact ties keep first-index —
    # unreachable on continuous softmax outputs.)
    greedy = jnp.where(deadlock, V - 1, greedy)
    if greedy_only:
        nxt = greedy
    else:
        temp_safe = jnp.maximum(temp, 1e-6)[:, None]
        cat = jax.random.categorical(
            key, masked / temp_safe, axis=-1
        ).astype(jnp.int32)
        use_sampling = temp > 0.0
        nxt = jnp.where(use_sampling, cat, greedy)
        nxt = jnp.where(use_sampling & deadlock, eot, nxt)
    prob_chosen = jnp.sum(
        jnp.where(ids[None] == nxt[:, None], masked, 0.0), axis=-1
    )
    return nxt, prob_chosen, deadlock


_ROWS = 8  # rows per program: one VPU sublane group


def _first_index_of_max(x: jax.Array, ids: jax.Array, V: int) -> jax.Array:
    """Per-row first index attaining max(x), NaN treated as +inf (XLA
    argmax convention); x, ids: [R, V] -> [R, 1] i32."""
    key = jnp.where(jnp.isnan(x), jnp.inf, x)
    m = jnp.max(key, axis=1, keepdims=True)
    return jnp.min(jnp.where(key == m, ids, V), axis=1, keepdims=True).astype(
        jnp.int32
    )


def _make_kernel(V: int, eot: int, no_timestamps: int, greedy_only: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    VP = ((V + 127) // 128) * 128
    R = _ROWS

    def kernel(
        seed_ref,  # SMEM [1,2] u32 (shared)
        step_ref,  # VMEM [R,1] i32 (row block — per-row grammar depth)
        p1_ref,  # VMEM [R,1] i32 (row block; SMEM only serves scalars)
        p2_ref,
        lts_ref,
        temp_ref,  # VMEM [R,1] f32
        ll_ref,  # VMEM [R, V] f32 (row block)
        msup_ref,  # VMEM [1, V] f32 (shared)
        mnts_ref,
        mts_ref,
        mfirst_ref,
        nxt_ref,  # VMEM [R, 128] i32
        prob_ref,  # VMEM [R, 128] f32
        nan_ref,  # VMEM [R, 128] i32
    ):
        blk = pl.program_id(0)
        step = step_ref[:]  # [R, 1]
        p1 = p1_ref[:]  # [R, 1]
        p2 = p2_ref[:]
        lts = lts_ref[:]
        temp = temp_ref[:]

        x = ll_ref[:]  # [R, V]
        ids = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)

        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)

        base = probs + msup_ref[:]
        past = jnp.where(
            (ids > no_timestamps) & (ids <= lts), -jnp.inf, 0.0
        ).astype(jnp.float32)
        mask_a = jnp.where(p2 >= eot, mts_ref[:], mnts_ref[:] + past)
        sum_ts = jnp.sum(
            jnp.where(ids > no_timestamps, base, 0.0), axis=1, keepdims=True
        )
        max_txt = jnp.max(
            jnp.where(ids < no_timestamps, base, -jnp.inf),
            axis=1,
            keepdims=True,
        )
        mask_b = jnp.where(sum_ts >= max_txt, mnts_ref[:] + past, past)
        masked = base + jnp.where(p1 > no_timestamps, mask_a, mask_b)
        masked = jnp.where(step == 0, probs + mfirst_ref[:], masked)

        # Deadlock == non-finite row max (all -inf, or any NaN poisoning
        # it) — matches sample_step_jnp and the reference's all-NaN
        # softmax check (model.rs:343-346).
        deadlock = ~jnp.isfinite(jnp.max(masked, axis=1, keepdims=True))
        greedy = _first_index_of_max(masked, ids, V)
        # Deadlocked greedy: candle's max_by picks the LAST of the equal
        # -inf maxima (highest vocab id); our argmax picks the first.
        greedy = jnp.where(deadlock, V - 1, greedy)

        if greedy_only:
            # Trace-time greedy promise (speculative draft/verify): the
            # PRNG + Gumbel pipeline is compiled out entirely.
            nxt = greedy
        else:
            # Gumbel-max draw: argmax(masked/T + G), G ~ Gumbel(0,1) from
            # the per-core PRNG seeded on (key, step, block) — rows inside
            # a block draw from disjoint slices of one bit matrix.  The TPU
            # accepts at most two seed words, so step/block are mixed in
            # multiplicatively (odd constants => bijective mod 2^32).  The
            # seed uses the block's FIRST row's step: every t>0 caller runs
            # all rows at one shared step (per-row steps only occur in the
            # greedy speculative verify, which never consumes the draw).
            s0 = seed_ref[0, 0] + step[0, 0].astype(jnp.uint32) * jnp.uint32(
                2654435761
            )
            s1 = seed_ref[0, 1] + jnp.uint32(blk) * jnp.uint32(0x9E3779B9)
            pltpu.prng_seed(s0, s1)
            bits = pltpu.prng_random_bits((R, VP))
            u = uniform_from_bits(bits)[:, :V]
            g = -jnp.log(-jnp.log(u))
            z = masked / jnp.maximum(temp, 1e-6) + g
            cat = _first_index_of_max(z, ids, V)

            use_sampling = temp > 0.0
            nxt = jnp.where(use_sampling, cat, greedy)
            nxt = jnp.where(use_sampling & deadlock, eot, nxt)
        prob = jnp.sum(
            jnp.where(ids == nxt, masked, 0.0), axis=1, keepdims=True
        )

        nxt_ref[:] = jnp.broadcast_to(nxt, (R, 128))
        prob_ref[:] = jnp.broadcast_to(prob, (R, 128))
        nan_ref[:] = jnp.broadcast_to(deadlock.astype(jnp.int32), (R, 128))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("eot", "no_timestamps", "greedy_only", "interpret"),
)
def sample_step_pallas(
    ll,
    m_suppress,
    m_non_ts,
    m_ts,
    m_first,
    prev1,
    prev2,
    last_ts,
    step,
    temp,
    seed2,  # [2] u32 — key material; per-(step,row) seeding in-kernel
    *,
    eot: int,
    no_timestamps: int,
    greedy_only: bool = False,
    interpret: bool = False,
):
    """Fused kernel path.  Same contract as :func:`sample_step_jnp` except
    the t>0 draw comes from the TPU PRNG (same Gumbel-max law); ``step``
    may be a shared scalar or per-row [B].  ``greedy_only`` compiles the
    PRNG/Gumbel pipeline out for statically-greedy callers (the
    speculative loop)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, V = ll.shape
    R = _ROWS
    BP = ((B + R - 1) // R) * R
    pad = BP - B
    step = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,))
    if pad:
        # Padded rows run the full pipeline on neutral inputs; results are
        # sliced away.  temp=0 keeps them on the greedy path.
        ll = jnp.pad(ll, ((0, pad), (0, 0)))
        prev1 = jnp.pad(prev1, (0, pad))
        prev2 = jnp.pad(prev2, (0, pad))
        last_ts = jnp.pad(last_ts, (0, pad))
        temp = jnp.pad(temp, (0, pad))
        step = jnp.pad(step, (0, pad))
    kernel = _make_kernel(V, eot, no_timestamps, greedy_only)

    def smem_row(x):
        return x.reshape(BP, 1)

    rows_vmem = pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    shared_smem = lambda n: pl.BlockSpec(
        (1, n), lambda b: (0, 0), memory_space=pltpu.SMEM
    )
    vrows = pl.BlockSpec((R, V), lambda b: (b, 0), memory_space=pltpu.VMEM)
    vshared = pl.BlockSpec((1, V), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vout = pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)

    nxt, prob, nan = pl.pallas_call(
        kernel,
        grid=(BP // R,),
        in_specs=[
            shared_smem(2),  # seed
            rows_vmem,  # step
            rows_vmem,  # prev1
            rows_vmem,  # prev2
            rows_vmem,  # last_ts
            rows_vmem,  # temp
            vrows,  # ll
            vshared,  # m_suppress
            vshared,  # m_non_ts
            vshared,  # m_ts
            vshared,  # m_first
        ],
        out_specs=[vout, vout, vout],
        out_shape=[
            jax.ShapeDtypeStruct((BP, 128), jnp.int32),
            jax.ShapeDtypeStruct((BP, 128), jnp.float32),
            jax.ShapeDtypeStruct((BP, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed2, jnp.uint32).reshape(1, 2),
        smem_row(step),
        smem_row(prev1.astype(jnp.int32)),
        smem_row(prev2.astype(jnp.int32)),
        smem_row(last_ts.astype(jnp.int32)),
        smem_row(temp.astype(jnp.float32)),
        ll.astype(jnp.float32),
        m_suppress.reshape(1, V),
        m_non_ts.reshape(1, V),
        m_ts.reshape(1, V),
        m_first.reshape(1, V),
    )
    return nxt[:B, 0], prob[:B, 0], nan[:B, 0].astype(bool)
